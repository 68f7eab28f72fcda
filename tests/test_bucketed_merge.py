"""Bucketed differential merge: only touched buckets are rewritten, the
pointer flip is atomic per commit, and results match the full-snapshot
merge semantics."""

from __future__ import annotations

import json
import os

from nspc_etl_basic_spark.sinks.bucketed_merge import (
    BUCKET_COL,
    MANIFEST,
    BucketedTable,
)


def _manifest(path):
    with open(os.path.join(path, MANIFEST), encoding="utf-8") as fh:
        return json.load(fh)


def test_init_and_read_roundtrip(spark, tmp_path):
    t = BucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=8)
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "id long, v string"
    )
    t.init(df)
    back = t.read()
    assert back.count() == 100
    assert sorted(back.columns) == ["id", "v"]
    assert {r.id for r in back.collect()} == set(range(100))


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    path = str(tmp_path / "t")
    t = BucketedTable(spark, path, ["id"], n_buckets=16)
    t.init(
        spark.createDataFrame(
            [(i, "old") for i in range(200)], "id long, v string"
        )
    )
    m0 = _manifest(path)
    v0 = set(m0["buckets"].values())
    assert len(v0) == 1  # init: every bucket in one version

    # a 2-key source touches at most 2 buckets
    counts = t.merge(
        spark.createDataFrame(
            [(3, "new"), (1000, "ins")], "id long, v string"
        )
    )
    assert (counts.inserted, counts.updated) == (1, 1)

    m1 = _manifest(path)
    new_versions = set(m1["buckets"].values()) - v0
    assert len(new_versions) == 1
    (v_new,) = new_versions
    flipped = [b for b, v in m1["buckets"].items() if v == v_new]
    assert 1 <= len(flipped) <= 2  # only the touched buckets moved
    # untouched buckets still point at the original version
    untouched = [b for b, v in m1["buckets"].items() if v != v_new]
    assert all(m0["buckets"][b] == m1["buckets"][b] for b in untouched)
    # the new version dir contains ONLY the touched buckets
    vdir_buckets = [
        d for d in os.listdir(os.path.join(path, v_new))
        if d.startswith(f"{BUCKET_COL}=")
    ]
    assert len(vdir_buckets) == len(flipped)

    got = {r.id: r.v for r in t.read().collect()}
    assert len(got) == 201
    assert got[3] == "new" and got[1000] == "ins" and got[7] == "old"


def test_merge_matches_snapshot_merge_semantics(spark, tmp_path):
    """The differential result must equal the full merge_upsert result."""
    from nspc_etl_basic_spark.operators.merge import merge_upsert

    base = spark.createDataFrame(
        [(i, f"b{i}", i * 10) for i in range(50)], "id long, name string, x long"
    )
    src = spark.createDataFrame(
        [(7, "u7", 700), (13, "u13", 1300), (99, "n99", 9900)],
        "id long, name string, x long",
    )
    t = BucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=8)
    t.init(base)
    c = t.merge(src)
    assert (c.inserted, c.updated) == (1, 2)

    expected = {
        (r.id, r.name, r.x) for r in merge_upsert(base, src, ["id"]).collect()
    }
    got = {(r.id, r.name, r.x) for r in t.read().collect()}
    assert got == expected


def test_merge_into_empty_table_initializes(spark, tmp_path):
    t = BucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
    c = t.merge(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    assert (c.inserted, c.updated) == (2, 0)
    assert t.read().count() == 2


def test_repeated_merges_and_gc(spark, tmp_path):
    path = str(tmp_path / "t")
    t = BucketedTable(spark, path, ["id"], n_buckets=4, keep_versions=1)
    t.init(spark.createDataFrame([(i, 0) for i in range(40)], "id long, v long"))
    for step in range(1, 6):
        t.merge(
            spark.createDataFrame([(step, step), (40 + step, step)], "id long, v long")
        )
    got = {r.id: r.v for r in t.read().collect()}
    assert len(got) == 45
    for step in range(1, 6):
        assert got[step] == step and got[40 + step] == step
    # GC bounded the version count: every live version is referenced or
    # within the keep window
    versions = [d for d in os.listdir(path) if d.startswith("v_")]
    referenced = set(_manifest(path)["buckets"].values())
    assert referenced <= set(versions)
    assert len(versions) <= len(referenced) + 2


def test_n_buckets_mismatch_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    BucketedTable(spark, path, ["id"], n_buckets=4).init(
        spark.createDataFrame([(1, "a")], "id long, v string")
    )
    import pytest

    with pytest.raises(ValueError, match="n_buckets"):
        BucketedTable(spark, path, ["id"], n_buckets=8).merge(
            spark.createDataFrame([(2, "b")], "id long, v string")
        )


def test_delete_removes_keys_differentially(spark, tmp_path):
    path = str(tmp_path / "t")
    t = BucketedTable(spark, path, ["id"], n_buckets=16)
    t.init(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(100)], "id long, v string"
        )
    )
    v0 = set(_manifest(path)["buckets"].values())

    keys = spark.createDataFrame([(7,), (13,), (999,)], "id long")
    removed = t.delete(keys)
    assert removed == 2  # 999 never existed

    got = {r.id for r in t.read().collect()}
    assert len(got) == 98 and 7 not in got and 13 not in got

    # untouched buckets kept their original version
    m1 = _manifest(path)
    new_vs = set(m1["buckets"].values()) - v0
    assert len(new_vs) == 1
    flipped = [b for b, v in m1["buckets"].items() if v in new_vs]
    assert len(flipped) <= 3  # at most the 3 keys' buckets

    # idempotent: replaying the same delete removes nothing
    assert t.delete(keys) == 0
    assert t.read().count() == 98


def test_delete_entire_bucket_drops_manifest_entry(spark, tmp_path):
    path = str(tmp_path / "t")
    t = BucketedTable(spark, path, ["id"], n_buckets=4)
    df = spark.createDataFrame([(i, "x") for i in range(40)], "id long, v string")
    t.init(df)
    n_buckets_before = len(_manifest(path)["buckets"])

    # delete EVERY key in one bucket: compute bucket membership the same
    # way the table does
    from pyspark.sql import functions as F

    withb = df.withColumn(
        "b", F.pmod(F.xxhash64(F.col("id")), F.lit(4)).cast("int")
    )
    target_bucket = withb.select("b").first().b
    doomed = withb.filter(F.col("b") == target_bucket).select("id")
    n_doomed = doomed.count()

    assert t.delete(doomed) == n_doomed
    m = _manifest(path)
    assert len(m["buckets"]) == n_buckets_before - 1
    assert t.read().count() == 40 - n_doomed


def test_lookup_reads_only_key_buckets(spark, tmp_path):
    t = BucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=16)
    t.init(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(200)], "id long, v string"
        )
    )
    keys = spark.createDataFrame([(3,), (77,), (5000,)], "id long")
    got = {(r.id, r.v) for r in t.lookup(keys).collect()}
    assert got == {(3, "v3"), (77, "v77")}
    # the lookup plan scans at most 3 bucket paths, not all 16
    plan = t.lookup(keys)._jdf.queryExecution().toString()
    import re

    scanned = len(set(re.findall(r"__bucket=\d+", plan)))
    assert scanned <= 3, plan[:500]


def test_merge_schema_evolution_additive(spark, tmp_path):
    t = BucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=8)
    t.init(spark.createDataFrame([(i, "x") for i in range(50)], "id long, v string"))

    src = spark.createDataFrame(
        [(3, "upd", 99), (500, "new", 42)], "id long, v string, extra long"
    )
    import pytest

    with pytest.raises(ValueError, match="allow_schema_evolution"):
        t.merge(src)

    c = t.merge(src, allow_schema_evolution=True)
    assert (c.inserted, c.updated) == (1, 1)
    back = t.read()
    assert "extra" in back.columns
    got = {r.id: (r.v, r.extra) for r in back.collect()}
    assert len(got) == 51
    assert got[3] == ("upd", 99) and got[500] == ("new", 42)
    assert got[7] == ("x", None)  # untouched bucket NULL-filled at read


def test_process_file_bucketed_layout(spark, tmp_path):
    """database.layout=bucketed routes pipeline upserts through the
    differential merge: true counts, existing-table schema authority,
    strict rollback leaves the table untouched."""
    from nspc_etl_basic_spark import load_config
    from nspc_etl_basic_spark.plans.pipeline import process_file

    cfg = load_config(
        overrides={
            "database": {
                "warehouse_path": str(tmp_path / "wh"),
                "layout": "bucketed",
                "n_buckets": 8,
            },
            "loader": {"table_mode": "upsert", "primary_key_columns": ["id"]},
        }
    )
    f1 = tmp_path / "items.csv"
    f1.write_text("id,name,amount\n1,alpha,10.5\n2,beta,20.25\n")
    r1 = process_file(spark, str(f1), cfg, move_files=False)
    assert r1.status == "Completed", r1.error_message
    assert (r1.rows_inserted, r1.rows_updated) == (2, 0)

    cfg2 = dict(cfg)
    cfg2["override_table_name"] = r1.table_name
    f2 = tmp_path / "items2.csv"
    f2.write_text("id,name,amount\n2,beta2,21.0\n3,gamma,30.0\n")
    r2 = process_file(spark, str(f2), cfg2, move_files=False)
    assert r2.status == "Completed", r2.error_message
    assert (r2.rows_inserted, r2.rows_updated) == (1, 1)

    t = BucketedTable(spark, str(tmp_path / "wh" / r1.table_name), ["id"], n_buckets=8)
    got = {r.id for r in t.read().collect()}
    assert got == {1, 2, 3}

    # strict upsert of a bad value into the typed bucketed table -> Failed
    f3 = tmp_path / "items3.csv"
    f3.write_text("id,name,amount\nnotanint,x,1.0\n")
    r3 = process_file(spark, str(f3), cfg2, move_files=False)
    assert r3.status == "Failed"
    assert t.read().count() == 3


def test_time_travel_read_and_versions(spark, tmp_path):
    """read(version=k) reconstructs the table as of commit k from the
    retained manifest history; GC keeps every version dir a retained
    manifest references."""
    path = str(tmp_path / "t")
    t = BucketedTable(spark, path, ["id"], n_buckets=8)
    t.init(spark.createDataFrame([(i, "v0") for i in range(50)], "id long, v string"))
    t.merge(spark.createDataFrame([(3, "v1"), (100, "v1")], "id long, v string"))
    t.merge(spark.createDataFrame([(3, "v2")], "id long, v string"))

    vids = [v["version_id"] for v in t.versions()]
    assert vids == [0, 1, 2]

    as_of_0 = {r.id: r.v for r in t.read(version=0).collect()}
    assert len(as_of_0) == 50 and as_of_0[3] == "v0" and 100 not in as_of_0

    as_of_1 = {r.id: r.v for r in t.read(version=1).collect()}
    assert len(as_of_1) == 51 and as_of_1[3] == "v1" and as_of_1[100] == "v1"

    now = {r.id: r.v for r in t.read().collect()}
    assert len(now) == 51 and now[3] == "v2"

    import pytest

    with pytest.raises(FileNotFoundError, match="not retained"):
        t.read(version=99)


def test_time_travel_history_rotation_releases_dirs(spark, tmp_path):
    """keep_history bounds retention: old manifests rotate out, their
    version dirs become collectable, and read(version=old) refuses."""
    path = str(tmp_path / "t")
    t = BucketedTable(
        spark, path, ["id"], n_buckets=4, keep_versions=1, keep_history=3
    )
    t.init(spark.createDataFrame([(i, 0) for i in range(20)], "id long, n long"))
    for k in range(1, 7):
        t.merge(spark.createDataFrame([(1, k)], "id long, n long"))

    vids = [v["version_id"] for v in t.versions()]
    assert vids == [4, 5, 6]  # 7 commits total, 3 retained
    import pytest

    with pytest.raises(FileNotFoundError, match="not retained"):
        t.read(version=0)
    # retained versions still fully readable after GC
    assert t.read(version=4).count() == 20
    assert {r.n for r in t.read(version=4).filter("id = 1").collect()} == {4}


def test_empty_bucket_map_reads_empty_not_crash(spark, tmp_path):
    """Deleting the last bucket leaves a live, empty table: exists() is
    True, read()/lookup() return empty frames with the recorded schema,
    and a later merge repopulates it."""
    path = str(tmp_path / "t")
    t = BucketedTable(spark, path, ["id"], n_buckets=4)
    df = spark.createDataFrame([(i, "x") for i in range(10)], "id long, v string")
    t.init(df)
    assert t.delete(df.select("id")) == 10

    assert t.exists()
    empty = t.read()
    assert empty.count() == 0
    assert empty.columns == ["id", "v"]
    assert t.lookup(spark.createDataFrame([(1,)], "id long")).count() == 0

    c = t.merge(spark.createDataFrame([(7, "back")], "id long, v string"))
    assert (c.inserted, c.updated) == (1, 0)
    assert {r.id for r in t.read().collect()} == {7}


def test_compact_collapses_version_dirs(spark, tmp_path):
    """~40 trickle merges fragment the manifest across many version dirs
    (per-bucket FILE count stays flat — each merge rewrites whole
    buckets); compact() collapses everything back into one dir."""
    path = str(tmp_path / "t")
    t = BucketedTable(
        spark, path, ["id"], n_buckets=8, keep_versions=1, keep_history=2
    )
    t.init(spark.createDataFrame([(i, 0) for i in range(80)], "id long, n long"))
    for k in range(40):
        t.merge(spark.createDataFrame([(k % 80, k + 1)], "id long, n long"))

    frag = t.fragmentation()
    assert frag["n_buckets_live"] == 8
    assert frag["n_version_dirs"] > 1  # trickle merges scattered the map
    # one file per bucket regardless of merge count — the key invariant
    assert frag["n_data_files"] == frag["n_buckets_live"]

    stats = t.compact()
    assert stats["after"]["n_version_dirs"] == 1
    assert stats["after"]["n_data_files"] == 8
    assert t.read().count() == 80
    # content preserved: every key carries its LAST merged value
    got = {r.id: r.n for r in t.read().collect()}
    for k in range(40):
        assert got[k % 80] >= 1


def test_layout_collision_refused_both_ways(spark, tmp_path):
    """A snapshot table dir refuses the bucketed sink and vice versa —
    the two layouts share the v_* namespace, so mixing them silently
    drops rows and cross-GCs version dirs (ADVICE r3)."""
    import pytest

    from nspc_etl_basic_spark.sinks.writer import ParquetWarehouse

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    wh.write(df, "snap", mode="drop_recreate")
    with pytest.raises(ValueError, match="snapshot table"):
        BucketedTable(spark, wh.table_path("snap"), ["id"], n_buckets=4)

    t = BucketedTable(spark, str(tmp_path / "wh" / "bt"), ["id"], n_buckets=4)
    t.init(df)
    with pytest.raises(ValueError, match="BucketedTable"):
        wh.write(df, "bt", mode="drop_recreate")
    with pytest.raises(ValueError, match="BucketedTable"):
        wh.write(df, "bt", mode="append")


def test_diff_classifies_insert_update_delete_and_omits_unchanged(spark, tmp_path):
    """Change-data-feed between versions: null-safe classification,
    unchanged keys absent, delete captured from the delete() path."""
    t = BucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
    t.init(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, None), (4, "gone")],
            "id long, v string",
        )
    )  # v0
    t.merge(
        spark.createDataFrame(
            [(2, "B"), (3, None), (5, "new")], "id long, v string"
        )
    )  # v1: update 2, no-op 3 (null -> null), insert 5
    t.delete(spark.createDataFrame([(4,)], "id long"))  # v2: delete 4

    d01 = {r["id"]: r for r in t.diff(0, 1).collect()}
    assert set(d01) == {2, 5}
    assert d01[2]["op"] == "update" and (d01[2]["v_old"], d01[2]["v_new"]) == ("b", "B")
    assert d01[5]["op"] == "insert" and d01[5]["v_old"] is None and d01[5]["v_new"] == "new"

    d12 = {r["id"]: r for r in t.diff(1, 2).collect()}
    assert set(d12) == {4}
    assert d12[4]["op"] == "delete" and d12[4]["v_old"] == "gone" and d12[4]["v_new"] is None

    # a null -> value flip IS an update (null-safe compare)
    t.merge(spark.createDataFrame([(3, "now")], "id long, v string"))  # v3
    d23 = {r["id"]: r for r in t.diff(2, 3).collect()}
    assert set(d23) == {3} and d23[3]["op"] == "update"
    assert d23[3]["v_old"] is None and d23[3]["v_new"] == "now"


def test_diff_spans_additive_schema_evolution(spark, tmp_path):
    """diff across a version pair where a column was added: the old
    side NULL-fills the new column (read()'s own contract) instead of
    crashing, and the evolution surfaces as updates."""
    t = BucketedTable(spark, str(tmp_path / "t"), ["id"], n_buckets=4)
    t.init(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    t.merge(
        spark.createDataFrame([(2, "b", "W")], "id long, v string, w string"),
        allow_schema_evolution=True,
    )
    d = {r["id"]: r for r in t.diff(0, 1).collect()}
    assert set(d) == {2}
    r = d[2]
    assert r["op"] == "update"
    assert r["w_old"] is None and r["w_new"] == "W"
    assert r["v_old"] == "b" and r["v_new"] == "b"
