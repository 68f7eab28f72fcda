"""Per-query cost breakdown for optimization work: plan-BUILD time (the
queries() callable, incl. any eager plan-build actions), EXECUTION time
(noop sink), and the Spark JOB COUNT each phase submitted — separates
compile/driver-bound queries from job-overhead-bound and data-bound ones.

Usage: python scripts/profile_queries.py query [query ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import build_spark  # noqa: E402


def _next_job_id(spark) -> int:
    # py4j already unboxes the AtomicInteger to a Python int here
    nid = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    return nid if isinstance(nid, int) else nid.get()


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # warmup pass at the smallest SF (same as bench.py)
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for name in names:
        try:
            qs[name](spark, warm_dir).write.mode("overwrite").format("noop").save()
        except Exception:  # noqa: BLE001
            pass
    spark.catalog.clearCache()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        j0 = _next_job_id(spark)
        t0 = time.monotonic()
        df = qs[name](spark, sf_dir)
        t1 = time.monotonic()
        j1 = _next_job_id(spark)
        df.write.mode("overwrite").format("noop").save()
        t2 = time.monotonic()
        j2 = _next_job_id(spark)
        out[name] = {
            "build_s": round(t1 - t0, 3),
            "exec_s": round(t2 - t1, 3),
            "build_jobs": j1 - j0,
            "exec_jobs": j2 - j1,
        }
        spark.catalog.clearCache()
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
