"""Regression tests for the round-4 code-review findings: corrupt-media
fallback, null-value handling in sketches/span-dedup/BPE, KMV prefilter
degeneracy, and z-order degenerate stats."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from nspc_etl_basic_spark.operators.bpe import bpe_encode
from nspc_etl_basic_spark.operators.codecs import encode_jpeg_gray
from nspc_etl_basic_spark.operators.multimodal import _decode_image
from nspc_etl_basic_spark.operators.similarity import (
    embedding_covariance,
    pca_components,
)
from nspc_etl_basic_spark.operators.sketches import (
    histogram_quantiles,
    kmv_distinct,
)
from nspc_etl_basic_spark.operators.spandedup import dedup_spans
from nspc_etl_basic_spark.sinks.layout import zorder_value


def test_truncated_jpeg_decodes_to_none_not_crash():
    img = np.full((16, 16), 128, dtype=np.uint8)
    payload = encode_jpeg_gray(img)
    for cut in (len(payload) // 2, len(payload) - 3, 8):
        assert _decode_image(payload[:cut]) is None
    # garbage with a JPEG magic prefix
    assert _decode_image(b"\xff\xd8\xff" + b"\x00" * 40) is None


def test_histogram_quantiles_ignores_nulls(spark):
    rows = [("a", float(v)) for v in range(1, 100)]
    rows += [("a", None)] * 50
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    out = {
        r["q"]: r["est"]
        for r in histogram_quantiles(df, "v", "g", qs=(0.5,), bins=10).collect()
    }
    # nulls excluded from n AND the bins: estimate near the true median
    assert abs(out[0.5] - 50.0) <= 9.9


def test_kmv_prefilter_degenerate_group_scaled_not_exactish(spark):
    # 500 distinct keys but a 1% prefilter: far fewer than k survive —
    # the estimate must be inverse-probability scaled, never reported as
    # the survivor count, and the group must not vanish
    df = spark.createDataFrame([(i, "g") for i in range(500)], ["k", "g"])
    out = kmv_distinct(df, "k", ["g"], k=64, prefilter=0.01).collect()
    assert len(out) == 1
    est = out[0]["kmv_estimate"]
    assert est > 50  # survivor count alone would be ~5
    assert out[0]["n_exact"] == 500
    # zero-survivor group still appears (tiny prefilter)
    out2 = kmv_distinct(df, "k", ["g"], k=64, prefilter=1e-9).collect()
    assert len(out2) == 1 and out2[0]["kmv_estimate"] == 0.0


def test_dedup_spans_null_text(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, "real words here")], "doc_id LONG, text STRING"
    )
    out = {r["doc_id"]: r for r in dedup_spans(docs, n=5).collect()}
    assert out[1]["n_tokens"] == 0
    assert out[1]["clean_text"] == ""
    assert out[1]["n_removed"] == 0


def test_bpe_encode_null_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "some words")], "doc_id LONG, text STRING"
    )
    out = {r["doc_id"]: r for r in bpe_encode(df, [("s", "o")]).collect()}
    assert out[1]["n_words"] == 0 and out[1]["n_bpe_tokens"] == 0
    assert out[1]["bpe_preview"] == ""
    assert out[2]["n_words"] == 2


def test_zorder_value_degenerate_stats(spark):
    # all-null column and empty frame: no crash, constant rank
    df = spark.createDataFrame(
        [(1, None), (2, None)], "a LONG, b DOUBLE"
    )
    zdf, zc = zorder_value(df, ["a", "b"], bits=4)
    assert zdf.count() == 2
    empty = spark.createDataFrame([], "a LONG, b DOUBLE")
    zdf2, _ = zorder_value(empty, ["a", "b"], bits=4)
    assert zdf2.count() == 0


def test_covariance_and_pca_clear_errors(spark):
    empty = spark.createDataFrame([], "vec_id LONG, embedding ARRAY<FLOAT>")
    with pytest.raises(ValueError, match="empty input"):
        embedding_covariance(empty, "embedding")
    one = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.0, 2.0])]
    )
    with pytest.raises(ValueError, match="at least 2"):
        pca_components(one, "embedding", k=1, dims=2)


def test_scd2_apply_same_ts_correction_replaces_not_phantom(spark):
    """A batch change at a timestamp already in history REPLACES that
    row (correction), leaving no zero-length phantom interval."""
    import datetime

    from nspc_etl_basic_spark.operators.scd import (
        scd2_apply_changes,
        scd2_from_feed,
    )

    d = datetime.date
    existing = scd2_from_feed(
        spark.createDataFrame([(1, d(2024, 1, 1), "A")], "k INT, ts DATE, st STRING"),
        ["k"], "ts", ["st"],
    )
    batch = spark.createDataFrame(
        [(1, d(2024, 1, 1), "B")], "k INT, ts DATE, st STRING"
    )
    out = scd2_apply_changes(existing, batch, ["k"], "ts", ["st"]).collect()
    assert len(out) == 1
    assert out[0]["st"] == "B" and out[0]["is_current"] is True
    assert out[0]["valid_to"] is None  # no zero-length phantom


def test_scd2_mode_rejects_jdbc(spark, tmp_path):
    import nspc_etl_basic_spark as eng
    from nspc_etl_basic_spark.plans.pipeline import process_file

    p = tmp_path / "f.csv"
    p.write_text("id,ts,status\n1,2024-01-01,A\n")
    cfg = eng.load_config(overrides={
        "database": {"type": "jdbc", "url": "jdbc:derby:memory:x;create=true",
                     "warehouse_path": str(tmp_path / "wh")},
        "loader": {"table_mode": "scd2", "primary_key_columns": ["id"],
                   "scd2": {"ts_column": "ts"}},
    })
    r = process_file(spark, str(p), cfg, move_files=False)
    assert r.status == "Failed"
    assert "scd2" in r.error_message and "jdbc" in r.error_message


def test_metadata_store_tolerates_null_quality_section(spark, tmp_path):
    from nspc_etl_basic_spark.sinks.metadata import MetadataStore
    from nspc_etl_basic_spark.sinks.writer import ParquetWarehouse

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    m = MetadataStore(wh, {"quality": None})  # bare `quality:` in YAML
    assert m.quality_table == "EtlQualityCheck"


def test_band_key_separator_disambiguates(spark):
    """Round-5 ADVICE: xxhash64 signatures are variable-width longs, so
    the band key must carry a separator — (12, 345) and (123, 45) are
    distinct bands and must not collide."""
    from nspc_etl_basic_spark.operators.dedup import band_table

    sigs = spark.createDataFrame(
        [("a", 12, 345), ("b", 123, 45)],
        "doc_id string, mh_0 long, mh_1 long",
    )
    keys = {
        r["doc_id"]: r["band_key"]
        for r in band_table(sigs, n_hashes=2, band_size=2).collect()
    }
    assert keys["a"] != keys["b"]
    assert keys["a"] == "12|345"


def test_prune_files_unbounded_returns_none(spark, tmp_path):
    """Round-5 ADVICE: with no bounds there is nothing to prune on;
    returning a file list would silently drop all-null files while the
    scan applies no predicate."""
    from nspc_etl_basic_spark.sinks import stats_index as si

    d = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, None), (2, None)], "k int, v int"
    ).coalesce(1).write.parquet(d)
    idx = si.build_stats_index(spark, d, ["v"])
    assert si.prune_files(idx, d, "v") is None  # lo=hi=None: no pruning
    assert si.prune_files(idx, d, "v", lo=1) == []  # all-null: prunable


def test_heavy_hitters_from_store_validates_support(spark, tmp_path):
    """Round-5 ADVICE: support > threshold_frac voids the superset
    guarantee and must be rejected, matching the batch operator."""
    import pytest as _pytest

    from nspc_etl_basic_spark.streaming.freq import (
        count_store_table,
        heavy_hitters_from_store,
    )

    store = count_store_table(spark, str(tmp_path / "store"))
    with _pytest.raises(ValueError, match="support"):
        heavy_hitters_from_store(store, threshold_frac=0.01, support=0.05)
