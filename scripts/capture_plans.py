"""Capture `.explain("formatted")` for every (or selected) driver query.

Usage: python scripts/capture_plans.py OUTDIR [sf_dir] [query ...]

Writes OUTDIR/<query>.txt with the formatted physical plan. Plans are
built (not executed) — but queries whose plan-build runs eager actions
(trained-asset reads, replay builds, auto counts) pay those here, same
as any plan audit. Default sf_dir matches the bench (sf0.1) so scan
nodes and PushedFilters reflect the benched inputs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from nspc_etl_basic_spark import get_spark  # noqa: E402


def main() -> None:
    outdir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    todo = names if names else sorted(qs)
    n_err = 0
    for name in todo:
        if name not in qs:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, sf_dir)
            text = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
                fh.write(text)
            print(f"ok {name}")
        except Exception as exc:  # noqa: BLE001
            n_err += 1
            print(f"ERR {name}: {type(exc).__name__}: {exc}"[:300], file=sys.stderr)
    spark.stop()
    if n_err:
        sys.exit(1)


if __name__ == "__main__":
    main()
