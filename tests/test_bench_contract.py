"""Bench output contract guard: `bench.py` must end its stdout with ONE
parseable JSON line carrying the driver-contract fields.

Round 11's bench record landed with rc=0 but `parsed: null` (the JSON
line was not recoverable from the captured output), which zeroed round
12's PERF comparison (`n_common = 0`). This smoke test runs the real
bench harness end-to-end on a 3-query subset at sf0.001 in a subprocess
and asserts the stdout contract, so an output reorder or a JSON-breaking
edit fails in tests instead of costing a round of comparability.

The subset env var (`SPARK_GRAFT_BENCH_QUERIES`) exists only for this
test; the driver never sets it, and the timed methodology is identical
either way (same warmup, noop sink, best-of-N loop).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMOKE_QUERIES = ["q6_filter_pushdown", "dedup_exact", "corpus_split"]


def test_bench_stdout_last_line_is_the_json_record(tmp_path):
    # run a COPY of bench.py from tmp_path so its durable twin
    # (bench_summary.json, written next to the script) cannot clobber
    # the committed full-run summary in the repo
    bench_copy = tmp_path / "bench.py"
    shutil.copy(os.path.join(REPO, "bench.py"), bench_copy)
    env = dict(os.environ)
    env.update(
        {
            # the copy runs from tmp_path, so sys.path[0] is tmp_path, not
            # the repo root; __spark_entry__ must still resolve from the repo
            "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
            "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
            "SPARK_GRAFT_CPUS": "2",
            "SPARK_GRAFT_BENCH_REPEATS": "1",
            "SPARK_GRAFT_BENCH_QUERIES": ",".join(SMOKE_QUERIES),
        }
    )
    proc = subprocess.run(
        [sys.executable, str(bench_copy)],
        cwd=REPO,  # __spark_entry__ import resolves from the repo root
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert lines, "bench.py printed nothing to stdout"
    record = json.loads(lines[-1])  # the contract: LAST line parses

    assert record["metric"] == "total_query_wall_seconds"
    assert record["unit"] == "sec"
    assert isinstance(record["value"], (int, float))
    assert record["errors"] == 0
    assert record["sf"] == 0.001
    assert set(record["queries"]) == set(SMOKE_QUERIES)
    for q in SMOKE_QUERIES:
        assert isinstance(record["queries"][q], float), (q, record["queries"][q])
        assert record["queries"][q] >= 0
    # round-13 telemetry fields are additive but part of the record now
    assert isinstance(record["steal_ppm"], int)
    assert isinstance(record["busy_ppm"], int)
    assert set(record["steal_ppm_by_query"]) == set(SMOKE_QUERIES)

    # the durable twin mirrors the stdout record
    twin = tmp_path / "bench_summary.json"
    assert twin.exists()
    assert json.loads(twin.read_text())["queries"] == record["queries"]
