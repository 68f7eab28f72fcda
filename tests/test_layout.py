"""Z-order layout: measured row-group pruning, not vibes.

The claim: a two-column selective predicate over a Z-ordered table
skips most row groups on EITHER column, where a single-column sort only
skips on its own column. Verified with pyarrow footer statistics — the
same min/max metadata a Spark parquet scan uses for skipping."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from nspc_etl_basic_spark.sinks.layout import zorder_value, zorder_write


def _row_groups_admitting(path: str, col: str, lo, hi) -> tuple[int, int]:
    """(admitted, total) row groups whose [min, max] intersects [lo, hi]."""
    admitted = total = 0
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = idx[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            total += 1
            if st is None or st.min is None:
                admitted += 1
            elif not (st.max < lo or st.min > hi):
                admitted += 1
    return admitted, total


@pytest.fixture(scope="module")
def layout_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    n = 200_000
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % 100_000).alias("a"),
        (F.col("id") * 40503 % 100_000).alias("b"),
        F.col("id").alias("payload"),
    )
    paths = {
        "z": str(base / "z"),
        "sort_a": str(base / "sort_a"),
        "unsorted": str(base / "unsorted"),
    }
    # small row groups so each file holds several prunable groups; the
    # parquet writer reads this from the HADOOP conf, not the SQL conf
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    prev = hconf.get("parquet.block.size")
    hconf.set("parquet.block.size", str(128 * 1024))
    try:
        zorder_write(df, paths["z"], ["a", "b"], bits=12, n_files=8)
        (
            df.repartitionByRange(8, "a").sortWithinPartitions("a")
            .write.mode("overwrite").parquet(paths["sort_a"])
        )
        df.coalesce(8).write.mode("overwrite").parquet(paths["unsorted"])
    finally:
        if prev is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", prev)
    return paths


def test_zorder_preserves_rows(spark, layout_dirs):
    got = spark.read.parquet(layout_dirs["z"])
    assert got.count() == 200_000
    assert got.agg(F.sum("payload")).collect()[0][0] == sum(range(200_000))


def test_zorder_prunes_on_both_columns(layout_dirs):
    """Selective range on column a AND on column b: the a-sorted layout
    prunes only on a; z-order prunes meaningfully on BOTH."""
    lo, hi = 40_000, 45_000  # 5% selectivity per column

    za, zt = _row_groups_admitting(layout_dirs["z"], "a", lo, hi)
    zb, _ = _row_groups_admitting(layout_dirs["z"], "b", lo, hi)
    sa, st = _row_groups_admitting(layout_dirs["sort_a"], "a", lo, hi)
    sb, _ = _row_groups_admitting(layout_dirs["sort_a"], "b", lo, hi)
    ua, ut = _row_groups_admitting(layout_dirs["unsorted"], "a", lo, hi)

    assert zt >= 16, f"need several row groups for the claim ({zt})"
    # the unsorted layout admits (nearly) everything on a 5% predicate
    assert ua >= 0.9 * ut
    # single-column sort: excellent on its own column...
    assert sa <= 0.25 * st
    # ...useless on the other
    assert sb >= 0.9 * st
    # z-order: substantial pruning on BOTH columns
    assert za <= 0.6 * zt, f"z pruning on a too weak: {za}/{zt}"
    assert zb <= 0.6 * zt, f"z pruning on b too weak: {zb}/{zt}"


def test_zorder_value_is_projection(spark):
    """The z-value must be pure column algebra — no exchange, no UDF —
    so it fuses with the scan at any scale."""
    df = spark.range(1000).select(
        F.col("id").alias("a"), (F.col("id") * 7 % 997).alias("b")
    )
    zdf, zc = zorder_value(df, ["a", "b"], bits=8)
    plan = zdf._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    # interleave sanity: max rank in both dims -> all 16 low bits set
    one = (
        spark.createDataFrame([(0, 0), (255, 255)], "a long, b long")
    )
    z2, c2 = zorder_value(one, ["a", "b"], bits=8)
    vals = sorted(r[c2] for r in z2.collect())
    assert vals == [0, (1 << 16) - 1]


def test_zorder_layout_report_prefers_zorder_for_box(spark):
    """On a uniform 2-D grid, the report must show the z-order layout
    scanning FEWER rows than the plain col_x sort for a predicate box
    that is selective on the y axis (a linear-x cell spans all of y)."""
    from nspc_etl_basic_spark.sinks.layout import zorder_layout_report

    df = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    rep = zorder_layout_report(
        df, "x", "y", bits=6, file_bits=4,
        box_x=(0.25, 0.375), box_y=(0.5, 0.625),
    ).collect()
    scanned = {"zorder": 0, "linear_x": 0}
    totals = {"zorder": 0, "linear_x": 0}
    for r in rep:
        totals[r.layout] += r.n_rows
        if r.hit:
            scanned[r.layout] += r.n_rows
    assert totals["zorder"] == totals["linear_x"] == 64 * 64
    # linear-x cells span the full y domain -> every x-admitted cell hit;
    # z-cells bound both axes -> strictly less scanned
    assert scanned["zorder"] < scanned["linear_x"], (scanned, totals)


def test_zorder_layout_report_null_rows_counted(spark):
    """Null coordinates clamp to rank 0 (greatest/least skip nulls):
    the row lands in a real cell, counts toward n_rows, and stays out
    of the cell's min/max."""
    from nspc_etl_basic_spark.sinks.layout import zorder_layout_report

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (100, 90.0)], "x long, y double"
    )
    rep = zorder_layout_report(df, "x", "y", bits=4, file_bits=2)
    assert sum(r.n_rows for r in rep.collect() if r.layout == "zorder") == 3


def test_zorder_rejects_bad_args(spark):
    df = spark.range(10).select(F.col("id").alias("a"), F.col("id").alias("b"))
    with pytest.raises(ValueError, match="2-4 columns"):
        zorder_value(df, ["a"])
    with pytest.raises(ValueError, match="fit in a long"):
        zorder_value(df, ["a", "b"], bits=32)
