"""Regression net for the events ``ts`` physical encoding.

The driver's testdata changed encoding between rounds (int64-nanos in r01,
TIMESTAMP(µs) in r02) and silently broke every events query once. This
pins ``_events`` loading against THREE physical encodings of the same
instants — TIMESTAMP(µs) (tz-less, Spark reads TIMESTAMP_NTZ),
TIMESTAMP(µs, UTC) (Spark reads TIMESTAMP), and int64 nanoseconds (Spark
reads bigint under the nanosAsLong conf) — asserting all three load to
identical µs timestamps.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod

# µs-precision instants, including one off-second value
_INSTANTS_US = [
    1_700_000_000_000_000,
    1_700_000_123_456_789,
    1_700_086_400_000_000,
]


def _write_events(path: str, ts_array: pa.Array) -> None:
    n = len(_INSTANTS_US)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(["view"] * n, pa.string()),
            "value": pa.array([1.5] * n, pa.float64()),
            "props": pa.array(['{"k":1}'] * n, pa.string()),
        }
    )
    pq.write_table(table, f"{path}/events.parquet")


@pytest.fixture(scope="module")
def encoding_dirs(tmp_path_factory):
    dirs = {}
    for name, typ in [
        ("us_ntz", pa.timestamp("us")),
        ("us_utc", pa.timestamp("us", tz="UTC")),
        ("ns_long", pa.timestamp("ns")),
    ]:
        d = tmp_path_factory.mktemp(name)
        arr = pa.array([v * 1000 for v in _INSTANTS_US], pa.int64()).cast(
            pa.timestamp("ns")
        )
        if name != "ns_long":
            arr = arr.cast(typ)
        _write_events(str(d), arr)
        dirs[name] = str(d)
    return dirs


@pytest.mark.parametrize("enc", ["us_ntz", "us_utc", "ns_long"])
def test_events_loads_every_encoding_to_same_instants(spark, encoding_dirs, enc):
    df = entrymod._events(spark, encoding_dirs[enc])
    assert df.schema["ts"].dataType.simpleString() == "timestamp", (
        f"{enc}: ts loaded as {df.schema['ts'].dataType.simpleString()}"
    )
    rows = sorted(df.collect(), key=lambda r: r.event_id)
    got = [
        int(r.ts.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
        for r in rows
    ]
    assert got == _INSTANTS_US, f"{enc}: {got}"


def test_events_encodings_pairwise_identical(spark, encoding_dirs):
    frames = {
        enc: entrymod._events(spark, d).orderBy("event_id").collect()
        for enc, d in encoding_dirs.items()
    }
    base = frames["us_ntz"]
    for enc, rows in frames.items():
        assert rows == base, f"{enc} diverges from us_ntz"
