"""Benchmark harness: runs every driver-contract query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Timing methodology: one warmup action amortizes JVM/codegen startup, then
each query executes to completion through the `noop` datasource (full
computation, zero serialization-to-driver cost — measures the engine, not
collect()).

Telemetry (round 13, purely additive — no timing change): /proc/stat
CPU-tick deltas are sampled around every timed query and the whole run,
recorded as `steal_ppm` / `busy_ppm` fields plus a per-query
`steal_ppm_by_query` map. Round 12's numbers were contaminated by
episodic hypervisor CPU steal that the record itself could not show
(untouched queries 2-10x slower, 8 cores beating 32); these fields let
any reader tell a quiet window from a stolen one.

`SPARK_GRAFT_BENCH_QUERIES` (comma-separated names, default unset = all)
restricts the run to a query subset. It exists ONLY for the bench
contract smoke test in tests/ (which runs a 3-query bench at sf0.001 and
asserts the JSON line parses); the driver never sets it."""

from __future__ import annotations

import json
import os
import re
import time

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod


def _cpu_ticks() -> tuple[int, int, int]:
    """(steal, busy, total) clock ticks from the aggregate /proc/stat cpu
    line; busy excludes idle+iowait. Zeros when the file is unreadable
    (non-Linux), so telemetry can never fail the bench."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        v = [int(x) for x in parts[1:]]
        # user nice system idle iowait irq softirq steal
        steal = v[7] if len(v) > 7 else 0
        total = sum(v[:8])
        busy = total - v[3] - v[4]
        return steal, busy, total
    except (OSError, ValueError, IndexError):
        return 0, 0, 0


def _ppm(delta_part: int, delta_total: int) -> int:
    return round(1_000_000 * delta_part / delta_total) if delta_total else 0


def build_spark(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("nspc-etl-basic-spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + whole-stage-codegen JIT + parquet footer caches. Run
    # every query once at the smallest SF so each plan's generated code is
    # compiled before timing — the timed pass then measures steady-state
    # engine throughput (the 100 TB-relevant number), not one-time JIT.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    warm_subset_raw = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "").strip()
    warm_subset = {q.strip() for q in warm_subset_raw.split(",") if q.strip()}
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for _name, fn in entrymod.queries().items():
        if warm_subset and _name not in warm_subset:
            continue
        try:
            fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
        except Exception:  # noqa: BLE001 — warmup must never fail the bench
            pass
    spark.catalog.clearCache()

    # best-of-N timing: single-shot runs at this scale are dominated by
    # GC/page-cache noise (observed ±2x swings on individual queries); the
    # minimum over repeats is the stable engine-throughput estimate
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    subset_raw = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "").strip()
    subset = {q.strip() for q in subset_raw.split(",") if q.strip()}
    timings: dict[str, object] = {}
    errors: dict[str, str] = {}
    steal_by_query: dict[str, int] = {}
    run_t0 = _cpu_ticks()
    for name, fn in entrymod.queries().items():
        if subset and name not in subset:
            continue
        best = float("inf")
        q_t0 = _cpu_ticks()
        # per-query isolation: one broken plan must never zero the whole
        # round's perf evidence (BENCH_r02 died on a single AnalysisException)
        try:
            for _ in range(max(1, repeats)):
                t0 = time.monotonic()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                best = min(best, time.monotonic() - t0)
            timings[name] = round(best, 3)
        except Exception as exc:  # noqa: BLE001
            msg = f"{type(exc).__name__}: {exc}"[:300]
            timings[name] = {"err": msg}
            errors[name] = msg
        q_t1 = _cpu_ticks()
        steal_by_query[name] = _ppm(q_t1[0] - q_t0[0], q_t1[2] - q_t0[2])
        # storage hygiene between queries: several query contracts cache
        # intermediates they cannot unpersist (the returned DF still
        # references them); across 100+ queries x repeats the block
        # manager fills and later iterative queries (observed:
        # dedup_components 5 s -> 57 s) pay eviction/GC, corrupting
        # their timings. Repeats of ONE query still share its caches.
        spark.catalog.clearCache()

    run_t1 = _cpu_ticks()
    total = round(
        sum(v for v in timings.values() if isinstance(v, float)), 3
    )
    record = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "errors": len(errors),
        "sf": sf,
        # window-quality telemetry (additive): hypervisor steal and CPU
        # busy fraction over the timed section, in parts-per-million of
        # elapsed CPU ticks. steal_ppm near 0 = quiet window; tens of
        # thousands = contaminated numbers (the round-12 hazard).
        "steal_ppm": _ppm(run_t1[0] - run_t0[0], run_t1[2] - run_t0[2]),
        "busy_ppm": _ppm(run_t1[1] - run_t0[1], run_t1[2] - run_t0[2]),
        "steal_ppm_by_query": steal_by_query,
    }
    print(json.dumps(record))
    # durable twin of the stdout line: BENCH_r03's captured tail truncated
    # the JSON *head* (the total was lost); the in-repo summary survives
    # any tail/head truncation of the capture
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_summary.json"),
            "w", encoding="utf-8",
        ) as fh:
            json.dump(record, fh, indent=1)
            fh.write("\n")
    except OSError:
        pass  # read-only checkout: stdout line is still the contract
    spark.stop()


if __name__ == "__main__":
    main()
