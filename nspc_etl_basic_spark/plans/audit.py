"""Plan auditing: the SCALE.md review, mechanized.

``plan_summary(df)`` reduces a DataFrame's physical plan to the scale
signals this repo's review process greps for by hand — shuffle count,
broadcast usage, sorts, cartesian products, whole-stage-codegen spans,
scan pushdown — so plan regressions can be asserted (see
tests/test_plan_contracts.py) and reported (``audit_report`` renders
the table PLAN_AUDIT.md is generated from).

This parses ``explain()`` output rather than walking the JVM plan tree:
the strings are a stable public surface (they ARE the review artifact),
and parsing keeps the auditor independent of Spark's internal node
classes across versions.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def _explain(df: DataFrame, mode: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def _strip_cached_subplans(text: str) -> str:
    """Drop the build-plan trees printed under ``InMemoryRelation``
    nodes. At runtime a cached child executes as ONE InMemoryTableScan;
    the nested tree only describes how the cache was built, so counting
    its exchanges/scans would overstate the production plan (round-4
    verdict: dedup_jaccard reported 52 scans for a plan that runs 2).
    Sub-tree lines are recognized by indentation depth relative to the
    InMemoryRelation line."""
    out = []
    skip_col = None
    for ln in text.splitlines():
        stripped = ln.lstrip(" :+-")
        col = len(ln) - len(stripped)
        if skip_col is not None:
            if stripped and col > skip_col:
                continue
            skip_col = None
        out.append(ln)
        if "InMemoryRelation" in ln:
            skip_col = col
    return "\n".join(out)


def plan_summary(df: DataFrame) -> dict:
    """Scale-signal summary of the (initial) physical plan.

    Counts reflect what RUNS: cached children count as their
    InMemoryTableScan (surfaced as ``cached_scans``), not as the
    build plan printed beneath them. ``pushed_filter_scans`` comes
    from formatted mode, whose detail blocks only cover the outer
    plan's numbered nodes — already runtime-accurate."""
    simple = _strip_cached_subplans(_explain(df, "simple"))
    formatted = _explain(df, "formatted")
    pushed = [
        ln.split("PushedFilters:", 1)[1].strip()
        for ln in formatted.splitlines()
        if "PushedFilters:" in ln
    ]
    return {
        "exchanges": simple.count("Exchange hashpartitioning")
        + simple.count("Exchange rangepartitioning"),
        "broadcasts": simple.count("BroadcastExchange"),
        "broadcast_joins": simple.count("BroadcastHashJoin"),
        "sort_merge_joins": simple.count("SortMergeJoin"),
        "sorts": simple.count("+- Sort ") + simple.count("- Sort "),
        "cartesian": simple.count("CartesianProduct")
        + simple.count("BroadcastNestedLoopJoin"),
        "take_ordered": simple.count("TakeOrderedAndProject"),
        "codegen_spans": simple.count("*("),
        # line-based: a "FileScan parquet" line contains BOTH substrings,
        # so substring-counting would double every scan
        "scans": sum(
            1
            for ln in simple.splitlines()
            if "FileScan" in ln or "Scan parquet" in ln
        ),
        "cached_scans": simple.count("InMemoryTableScan"),
        "pushed_filter_scans": sum(1 for p in pushed if p not in ("[]", "")),
        "python_eval": simple.count("ArrowEvalPython")
        + simple.count("BatchEvalPython")
        + simple.count("MapInPandas")
        + simple.count("FlatMapGroupsInPandas"),
    }


def audit_report(queries: dict, spark, sf_dir: str) -> list[dict]:
    """Run ``plan_summary`` over a {name: callable(spark, sf_dir)}
    query dict; returns one row per query (errors recorded, never
    raised — an unbuildable plan is itself a finding)."""
    rows = []
    for name, fn in queries.items():
        try:
            s = plan_summary(fn(spark, sf_dir))
            s["query"] = name
            s["error"] = None
        except Exception as exc:  # noqa: BLE001 — report, don't abort
            s = {"query": name, "error": f"{type(exc).__name__}: {exc}"[:160]}
        rows.append(s)
        # a query's self-managed caches must not leak into the NEXT
        # query's plan (a shared subtree would audit as cached there
        # even though a standalone run recomputes it) — same hygiene
        # rule as bench.py
        spark.catalog.clearCache()
    return rows
