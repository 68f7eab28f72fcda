"""Data-quality constraint suite (Deequ-style) over arbitrary tables.

Extends the reference's schema-inference statistics surface
(`file-to-sql-loader.py` C1-C4: max length / any-null / row count /
type-conformance flags) into a declarative constraint checker: each check
is an aggregate expression plus an inclusive [lo, hi] bound on its value,
and the whole suite evaluates in ONE full-scan aggregate pass.

Scale: the suite compiles to a single ``df.agg(...)`` — one map-side-
combined aggregation over the table, no joins, no window, no second scan.
Exact ``countDistinct`` checks add an Expand over the distinct key sets
(the standard multi-distinct plan); at 100 TB swap them for
``approx_count_distinct`` via ``uniqueness(..., exact=False)`` and widen
the bound by the HLL error. The long-format unpivot (``stack``) runs on
the single 1-row aggregate result — driver-side-free and costless.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One constraint: an aggregate metric and an inclusive bound.

    ``lo``/``hi`` of ``None`` mean unbounded on that side. ``name`` must be
    a valid column identifier (it becomes the agg alias).
    """

    name: str
    metric: Column
    lo: Optional[float] = None
    hi: Optional[float] = None


def completeness(col: str) -> Column:
    """Fraction of rows with a non-null value — 1.0 means fully populated."""
    return F.round(
        F.count(F.col(col)).cast("double") / F.greatest(F.count(F.lit(1)), F.lit(1)),
        6,
    )


def uniqueness(*cols: str, exact: bool = True) -> Column:
    """distinct(key) / count(*) — 1.0 means the columns form a unique key.

    ``exact=False`` uses HyperLogLog++ (``approx_count_distinct``, default
    rsd 5%) — the 100 TB form: no Expand, pure map-side sketch merge.
    """
    key = [F.col(c) for c in cols]
    distinct = (
        F.countDistinct(*key) if exact else F.approx_count_distinct(F.concat_ws("\x1f", *key))
    )
    return F.round(
        distinct.cast("double") / F.greatest(F.count(F.lit(1)), F.lit(1)), 6
    )


def compliance(col: str, pattern: str) -> Column:
    """Fraction of non-null values fully matching ``pattern`` (anchored)."""
    hit = F.when(F.col(col).rlike(f"^(?:{pattern})$"), F.lit(1)).otherwise(F.lit(0))
    return F.round(
        F.sum(F.when(F.col(col).isNotNull(), hit)).cast("double")
        / F.greatest(F.count(F.col(col)), F.lit(1)),
        6,
    )


def minimum(col: str) -> Column:
    return F.min(F.col(col)).cast("double")


def maximum(col: str) -> Column:
    return F.max(F.col(col)).cast("double")


def mean_of(col: str, scale: int = 4) -> Column:
    """Decimal-summed mean — exact, associative accumulation so the result
    is independent of partitioning/merge order (bitwise-stable at any
    parallelism; plain double sums are not)."""
    return F.round(
        F.sum(F.col(col).cast("decimal(18,4)")).cast("double")
        / F.greatest(F.count(F.col(col)), F.lit(1)),
        scale,
    )


def run_checks(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Evaluate a constraint suite in one aggregate pass.

    Returns a long-format DataFrame ``(check_name, value, lo, hi, passed)``
    with one row per check, ordered by ``check_name``.
    """
    if not checks:
        raise ValueError("run_checks requires at least one Check")
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError("duplicate check names")

    row = df.agg(*[c.metric.alias(c.name) for c in checks])

    stack_args = ", ".join(f"'{c.name}', `{c.name}`" for c in checks)
    long = row.selectExpr(
        f"stack({len(checks)}, {stack_args}) AS (check_name, value)"
    )

    lo_expr = F.lit(None).cast("double")
    hi_expr = F.lit(None).cast("double")
    for c in checks:
        lo_expr = F.when(F.col("check_name") == c.name, F.lit(c.lo).cast("double")).otherwise(lo_expr)
        hi_expr = F.when(F.col("check_name") == c.name, F.lit(c.hi).cast("double")).otherwise(hi_expr)

    passed = (
        F.col("value").isNotNull()
        & F.coalesce(F.col("value") >= F.col("lo"), F.lit(True))
        & F.coalesce(F.col("value") <= F.col("hi"), F.lit(True))
    )
    return (
        long.withColumn("lo", lo_expr)
        .withColumn("hi", hi_expr)
        .withColumn("passed", passed)
        .orderBy("check_name")
    )


def checks_from_config(specs: Sequence[dict]) -> list[Check]:
    """Build a Check list from config dicts (the pipeline's ``quality.
    checks`` YAML section). Each spec: ``{name, type, column | columns,
    lo?, hi?, pattern?, exact?}`` with type one of completeness /
    uniqueness / min / max / mean / compliance."""
    out: list[Check] = []
    for spec in specs:
        name = spec["name"]
        kind = spec["type"]
        lo = spec.get("lo")
        hi = spec.get("hi")
        if kind == "completeness":
            metric = completeness(spec["column"])
        elif kind == "uniqueness":
            cols = spec.get("columns") or [spec["column"]]
            metric = uniqueness(*cols, exact=bool(spec.get("exact", True)))
        elif kind == "min":
            metric = minimum(spec["column"])
        elif kind == "max":
            metric = maximum(spec["column"])
        elif kind == "mean":
            metric = mean_of(spec["column"])
        elif kind == "compliance":
            metric = compliance(spec["column"], spec["pattern"])
        else:
            raise ValueError(f"unknown quality check type: {kind!r}")
        out.append(Check(name, metric, lo=lo, hi=hi))
    return out


def referential_check(
    child: DataFrame,
    parent: DataFrame,
    fk_cols: list[str],
    pk_cols: list[str],
    relation: str | None = None,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Cross-table referential integrity as one DataFrame row:
    ``(relation, child_rows, null_fk_rows, orphan_rows)``. An orphan is
    a child row whose fully-NON-NULL fk tuple has no parent; rows with
    any null fk component are counted separately (a missing link is a
    different defect than a dangling one) — the split Deequ's
    hasReferentialIntegrity hides.

    Scale: the parent contributes only its DISTINCT pk tuple set,
    broadcast when dimension-sized (``broadcast_parent=False`` lets AQE
    shuffle fact-fact checks); the child is scanned once, column-pruned
    to the fk tuple, and never shuffled on the broadcast path. All
    three counts come from a single aggregate over the one left join.
    """
    if len(fk_cols) != len(pk_cols) or not fk_cols:
        raise ValueError("fk_cols and pk_cols must be same-length, non-empty")
    rel = relation or f"{'|'.join(fk_cols)}->{'|'.join(pk_cols)}"
    pk = parent.select(
        *[F.col(p).alias(f) for p, f in zip(pk_cols, fk_cols)]
    ).na.drop().distinct().withColumn("__hit", F.lit(1))
    if broadcast_parent:
        pk = F.broadcast(pk)
    any_null = F.lit(False)
    for f in fk_cols:
        any_null = any_null | F.col(f).isNull()
    j = child.select(*fk_cols).join(pk, fk_cols, "left")
    return j.agg(
        F.count(F.lit(1)).alias("child_rows"),
        F.sum(F.when(any_null, 1).otherwise(0)).cast("long").alias(
            "null_fk_rows"
        ),
        F.sum(
            F.when(~any_null & F.col("__hit").isNull(), 1).otherwise(0)
        ).cast("long").alias("orphan_rows"),
    ).select(F.lit(rel).alias("relation"), "*")


def referential_suite(
    checks: "Sequence[tuple[DataFrame, DataFrame, list[str], list[str], str]]",
) -> DataFrame:
    """Union of ``referential_check`` rows for a list of
    (child, parent, fk_cols, pk_cols, relation) tuples — the whole
    schema's FK health in one small DataFrame."""
    out = None
    for child, parent, fk, pk, rel in checks:
        row = referential_check(child, parent, fk, pk, relation=rel)
        out = row if out is None else out.unionByName(row)
    if out is None:
        raise ValueError("referential_suite requires at least one check")
    return out
