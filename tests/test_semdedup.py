"""SemDeDup semantic dedup (operators/semdedup.py): keep/drop
semantics, group transitivity, cell locality, hot-cell guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nspc_etl_basic_spark.operators.semdedup import semantic_dedup


@pytest.fixture(scope="module")
def emb(request):
    spark = request.getfixturevalue("spark")
    sf_dir = request.getfixturevalue("sf_dir")
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _hand_emb(spark):
    # two tight direction-clusters + one outlier; 4-dim vectors
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.99, 0.01, 0.0, 0.0]),   # near-dup of 1
        (3, [0.98, 0.0, 0.02, 0.0]),   # near-dup of 1
        (4, [0.0, 1.0, 0.0, 0.0]),
        (5, [0.0, 0.97, 0.03, 0.0]),   # near-dup of 4
        (6, [0.0, 0.0, 0.0, 1.0]),     # singleton
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_hand_groups_and_keep(spark):
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            _hand_emb(spark), n_cells=3, n_iter=2, threshold=0.9
        ).collect()
    }
    assert len(out) == 6  # one row per vector, singletons included
    # group ids are min-id representatives; keep marks exactly them
    for vid, r in out.items():
        assert r["keep"] == (vid == r["group_id"])
    # 1-2-3 share a group iff they share a cell (pairs never cross
    # cells); whatever the clustering did, group members must be
    # cell-consistent and every group id must be a member's id
    groups: dict = {}
    for vid, r in out.items():
        groups.setdefault(r["group_id"], []).append(vid)
    for gid, members in groups.items():
        assert gid == min(members)
        cells = {out[m]["cell"] for m in members}
        assert len(cells) == 1, f"group {gid} spans cells {cells}"
    # the orthogonal outlier can never join a >=0.9-cosine group
    assert out[6]["group_id"] == 6 and out[6]["keep"] is True


def test_keep_count_matches_group_count(emb):
    sd = semantic_dedup(emb, n_cells=16, n_iter=2, threshold=0.3)
    sd = sd.cache()
    try:
        n = sd.count()
        assert n == emb.count()
        n_groups = sd.select("group_id").distinct().count()
        assert sd.filter("keep").count() == n_groups
    finally:
        sd.unpersist()


def test_reused_centroids_and_hot_cell_guard(spark):
    df = _hand_emb(spark)
    from nspc_etl_basic_spark.operators.similarity import train_ivf_centroids

    cents = train_ivf_centroids(df, n_cells=2, n_iter=2)
    base = semantic_dedup(df, threshold=0.9, centroids=cents)
    # max_cell_size below any cell size -> no pairs form, everyone a
    # singleton representative, but every vector still gets a row
    guarded = semantic_dedup(
        df, threshold=0.9, centroids=cents, max_cell_size=1
    )
    assert guarded.count() == 6
    assert guarded.filter("keep").count() == 6
    assert base.count() == 6


def test_randomized_vs_bruteforce_reference(spark):
    """With a FIXED centroid list (assignment replicated in numpy:
    round-6 cosine argmax, ties to the lowest cell), the operator must
    equal a brute-force union-find over within-cell threshold pairs."""
    import numpy as np

    rng = np.random.default_rng(90816)
    n, dim = 60, 8
    vecs = rng.normal(size=(n, dim))
    cents = [(c, [float(x) for x in rng.normal(size=dim)]) for c in range(4)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: r
        for r in semantic_dedup(
            df, threshold=0.35, centroids=cents
        ).collect()
    }

    # reference: same assignment rule
    def cell_of(v):
        scores = []
        for cid, cv in cents:
            cva = np.array(cv)
            s = round(float(np.dot(v, cva))
                      / (float(np.linalg.norm(v)) * float(np.linalg.norm(cva))), 6)
            scores.append((-s, cid))
        return min(scores)[1]

    cells = {i: cell_of(vecs[i]) for i in range(n)}
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        for j in range(i + 1, n):
            if cells[i] != cells[j]:
                continue
            cos = round(
                float(np.dot(vecs[i], vecs[j]))
                / (float(np.linalg.norm(vecs[i])) * float(np.linalg.norm(vecs[j]))),
                6,
            )
            if cos >= 0.35:
                a, b = find(i), find(j)
                if a != b:
                    parent[max(a, b)] = min(a, b)
    groups: dict = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)
    expected = {}
    for members in groups.values():
        rep = min(members)
        for m in members:
            expected[m] = rep
    assert len(got) == n
    mismatches = [
        i for i in range(n)
        if got[i]["group_id"] != expected[i]
        or got[i]["cell"] != cells[i]
        or got[i]["keep"] != (i == expected[i])
    ]
    assert not mismatches, mismatches


def test_incremental_equals_from_scratch(emb):
    """semantic_dedup_incremental(base, batch, labels(base), frozen
    cents) must equal semantic_dedup(base ∪ batch, same cents) EXACTLY
    — the incremental_components contraction contract, end to end."""
    from pyspark.sql import functions as F

    from nspc_etl_basic_spark.operators.semdedup import (
        semantic_dedup_incremental,
    )
    from nspc_etl_basic_spark.operators.similarity import train_ivf_centroids

    base = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    cents = train_ivf_centroids(base, n_cells=8, n_iter=2)
    existing = semantic_dedup(base, centroids=cents, threshold=0.3).select(
        "vec_id", "group_id"
    )
    incr = {
        r["vec_id"]: (r["cell"], r["group_id"], r["keep"])
        for r in semantic_dedup_incremental(
            base, batch, existing, cents, threshold=0.3
        ).collect()
    }
    full = {
        r["vec_id"]: (r["cell"], r["group_id"], r["keep"])
        for r in semantic_dedup(
            emb, centroids=cents, threshold=0.3
        ).collect()
    }
    assert incr == full


def test_incremental_merges_across_old_components(spark):
    """A batch doc chaining two old groups must merge them under the
    min id, and a batch doc with a smaller id than its group's old
    representative must TAKE the representation."""
    from nspc_etl_basic_spark.operators.semdedup import (
        semantic_dedup_incremental,
    )

    # one centroid -> one cell: connectivity is purely threshold-driven
    cents = [(0, [1.0, 0.0, 0.0, 0.0])]
    base = spark.createDataFrame(
        [
            (10, [1.0, 0.0, 0.0, 0.0]),
            (11, [0.999, 0.045, 0.0, 0.0]),   # ~cos 0.999 with 10
            (20, [0.0, 0.0, 1.0, 0.0]),
            (21, [0.0, 0.0, 0.999, 0.045]),   # ~cos 0.999 with 20
        ],
        "vec_id long, embedding array<double>",
    )
    existing = spark.createDataFrame(
        [(10, 10), (11, 10), (20, 20), (21, 20)],
        "vec_id long, group_id long",
    )
    # batch doc 5: halfway between the two groups' directions, close
    # enough to both to chain them; its id is the new global min
    import math

    s = 1 / math.sqrt(2)
    batch = spark.createDataFrame(
        [(5, [s, 0.0, s, 0.0])], "vec_id long, embedding array<double>"
    )
    out = {
        r["vec_id"]: r
        for r in semantic_dedup_incremental(
            base, batch, existing, cents, threshold=0.7
        ).collect()
    }
    assert len(out) == 5
    assert {r["group_id"] for r in out.values()} == {5}
    assert [v for v, r in out.items() if r["keep"]] == [5]


def test_stream_semdedup_equals_batch_and_replays_idempotently(
    spark, tmp_path
):
    """Draining micro-batches into the label store must equal the
    from-scratch semantic_dedup with the same frozen codebook, and a
    FULL REPLAY (fresh checkpoint over the same source files, so every
    batch reprocesses) must leave the store unchanged."""
    import os

    from pyspark.sql import functions as F

    from nspc_etl_basic_spark.operators.similarity import train_ivf_centroids
    from nspc_etl_basic_spark.streaming.semdedup import (
        label_store_table,
        run_stream_semdedup,
        semdedup_from_store,
    )

    emb = spark.read.parquet(
        os.environ.get(
            "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
        )
        + "/embeddings.parquet"
    ).select("vec_id", "embedding").limit(200)
    emb = emb.localCheckpoint(eager=True)  # pin the limit's row set
    cents = train_ivf_centroids(emb, n_cells=4, n_iter=2)
    src = str(tmp_path / "src")
    store_path = str(tmp_path / "store")
    slices = [
        emb.where(F.col("vec_id") % 2 == 0),
        emb.where(F.col("vec_id") % 2 == 1),
    ]
    store = label_store_table(spark, store_path, n_buckets=4)
    schema = slices[0].schema
    for i, sl in enumerate(slices):
        sl.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(schema).format("parquet").load(src)
        run_stream_semdedup(
            stream, store, str(tmp_path / "ckpt"), cents, threshold=0.3
        )
    got = {
        r["vec_id"]: (r["cell"], r["group_id"], r["keep"])
        for r in semdedup_from_store(store).collect()
    }
    expected = {
        r["vec_id"]: (r["cell"], r["group_id"], r["keep"])
        for r in semantic_dedup(emb, centroids=cents, threshold=0.3).collect()
    }
    assert got == expected

    # full replay: fresh checkpoint, same files -> both batches
    # reprocess against the already-populated store
    stream = spark.readStream.schema(schema).format("parquet").load(src)
    run_stream_semdedup(
        stream, store, str(tmp_path / "ckpt2"), cents, threshold=0.3
    )
    again = {
        r["vec_id"]: (r["cell"], r["group_id"], r["keep"])
        for r in semdedup_from_store(store).collect()
    }
    assert again == expected


def test_stream_semdedup_vector_updates_equal_from_scratch(spark, tmp_path):
    """The dirty-cell rebuild: re-ingesting an id with a CHANGED vector
    must leave the store equal to the from-scratch semantic_dedup of
    the LATEST vector per id — including a component SPLIT when the
    departing vector was a cut vertex, a cross-cell move that merges
    into (and takes, by min id) another cell's group, a min-id
    departure relabel, and a mixed batch carrying an unchanged
    re-ingest. Re-executing the in-flight batch (fresh checkpoint over
    the same file) must be a no-op."""
    import math

    from nspc_etl_basic_spark.streaming.semdedup import (
        label_store_table,
        run_stream_semdedup,
        semdedup_from_store,
    )

    cents = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0, 0.0])]

    def v(deg, plane=0):
        c, s = math.cos(math.radians(deg)), math.sin(math.radians(deg))
        return [c, s, 0.0, 0.0] if plane == 0 else [0.0, 0.0, c, s]

    # b1: chain 10-11-12 in cell 0 (11 is the cut vertex: cos(10,12)
    # = cos 50deg < 0.9) plus pair 20-21 in cell 1
    b1 = [
        (10, v(0)),
        (11, v(25)),
        (12, v(50)),
        (20, v(0, plane=1)),
        (21, v(5, plane=1)),
    ]
    # b2: 11 re-embeds INTO cell 1 (splits {10,11,12}; merges with and
    # takes over {20,21} as the new min id); 30 arrives fresh in the
    # now-dirty cell 0 (pairs with 10 only: cos 18 >= 0.9, cos 32 < 0.9)
    b2 = [(11, v(-5, plane=1)), (30, v(18))]
    # b3: 10 (a group MIN) re-embeds away from everyone within cell 0
    # (cos to the centroid 0.6 keeps the cell; cos to 30/12 < 0.9);
    # 21 rides along as an unchanged re-ingest
    b3 = [(10, [0.6, -0.8, 0.0, 0.0]), (21, v(5, plane=1))]

    schema = "vec_id long, embedding array<double>"
    store = label_store_table(spark, str(tmp_path / "store"), n_buckets=2)

    n_drains = [0]

    def drain(rows, name):
        src = str(tmp_path / name)
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(src)
        stream = spark.readStream.schema(schema).format("parquet").load(src)
        n_drains[0] += 1  # fresh checkpoint per call so re-drains of
        # the same file genuinely re-execute the batch
        run_stream_semdedup(
            stream, store, str(tmp_path / f"ckpt_{n_drains[0]}"), cents,
            threshold=0.9,
        )

    def store_now():
        return {
            r["vec_id"]: (r["cell"], r["group_id"], r["keep"])
            for r in semdedup_from_store(store).collect()
        }

    def scratch(latest):
        df = spark.createDataFrame(sorted(latest.items()), schema)
        return {
            r["vec_id"]: (r["cell"], r["group_id"], r["keep"])
            for r in semantic_dedup(
                df, centroids=cents, threshold=0.9
            ).collect()
        }

    latest = dict(b1)
    drain(b1, "b1")
    assert store_now() == scratch(latest)
    assert store_now()[12][1] == 10  # the chain is one group pre-update

    latest.update(dict(b2))
    drain(b2, "b2")
    after_b2 = store_now()
    assert after_b2 == scratch(latest)
    assert after_b2[12] == (0, 12, True)   # split: 12 is its own group
    assert after_b2[20][1] == 11           # 11 took over cell 1's group
    assert after_b2[21][1] == 11
    assert after_b2[11][0] == 1            # and moved cells
    assert after_b2[30][1] == 10           # fresh row joined 10

    # re-execute the in-flight batch: fresh checkpoint, same file
    drain(b2, "b2")
    assert store_now() == after_b2

    latest.update(dict(b3))
    drain(b3, "b3")
    after_b3 = store_now()
    assert after_b3 == scratch(latest)
    assert after_b3[10] == (0, 10, True)   # 10 now a singleton
    assert after_b3[30] == (0, 30, True)   # min-id departure relabel
    assert after_b3[21][1] == 11           # untouched cell kept its label

    drain(b3, "b3")
    assert store_now() == after_b3


def test_threshold_validation(spark):
    with pytest.raises(ValueError, match="threshold"):
        semantic_dedup(_hand_emb(spark), threshold=0.0)
    with pytest.raises(ValueError, match="threshold"):
        semantic_dedup(_hand_emb(spark), threshold=1.5)


def test_empty_centroids_raise_instead_of_retraining(spark):
    # `centroids=[]` is a caller bug (a degenerate codebook expecting
    # reuse) — silently retraining would unfreeze cell boundaries
    with pytest.raises(ValueError, match="empty"):
        semantic_dedup(_hand_emb(spark), centroids=[])


def test_incremental_base_assigned_equals_inline_assignment(spark):
    # the production persisted-assignment path must be value-identical
    # to re-projecting the base through the codebook in-query
    from nspc_etl_basic_spark.operators.semdedup import (
        _assign_cells,
        semantic_dedup,
        semantic_dedup_incremental,
    )
    from nspc_etl_basic_spark.operators.similarity import train_ivf_centroids

    emb = _hand_emb(spark)
    base = emb.filter(F.col("vec_id") <= 4)
    batch = emb.filter(F.col("vec_id") > 4)
    cents = train_ivf_centroids(base, n_cells=2, n_iter=2)
    existing = semantic_dedup(base, centroids=cents, threshold=0.9).select(
        "vec_id", "group_id"
    )
    inline = semantic_dedup_incremental(
        base, batch, existing, cents, threshold=0.9
    )
    assigned = _assign_cells(base, cents, "vec_id", "embedding")
    pre = semantic_dedup_incremental(
        base, batch, existing, cents, threshold=0.9, base_assigned=assigned
    )
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, pre.collect())
    )


def test_auto_n_cells_derivation():
    from nspc_etl_basic_spark.operators.semdedup import auto_n_cells

    assert auto_n_cells(500) == 16                      # floor
    assert auto_n_cells(1024 * 64) == 64                # n // target
    assert auto_n_cells(100_000_000) == 97656           # grows with n
    assert auto_n_cells(5000, target_cell_size=100) == 50
    with pytest.raises(ValueError, match="target_cell_size"):
        auto_n_cells(100, target_cell_size=0)


def test_auto_defaults_and_sampled_training(emb):
    from nspc_etl_basic_spark.operators.semdedup import semantic_dedup

    # 500 sf0.01 vectors -> auto floor of 16 cells: result must equal
    # the explicit n_cells=16 run (same codebook, same groups)
    auto = semantic_dedup(emb, threshold=0.3)
    explicit = semantic_dedup(emb, n_cells=16, n_iter=3, threshold=0.3)
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, explicit.collect())
    )
    # sampled training: deterministic (same sample -> same codebook),
    # covers every vector, keep-representatives are group minima
    sampled = semantic_dedup(emb, threshold=0.3, train_fraction=0.5)
    rows = sampled.collect()
    assert len(rows) == emb.count()
    again = semantic_dedup(emb, threshold=0.3, train_fraction=0.5)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_semantic_decontaminate_catches_paraphrase_ngrams_miss(spark):
    from nspc_etl_basic_spark.operators.decontaminate import contaminated_ids
    from nspc_etl_basic_spark.operators.semdedup import (
        semantic_contaminated_ids,
    )

    # a benchmark item and its PARAPHRASE: zero shared word 5-grams
    # (every content word differs), near-identical embeddings
    eval_docs = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus_docs = spark.createDataFrame(
        [
            (1, "a speedy russet vulpine leaps above an idle canine"),
            (2, "tax law changed substantially in nineteen eighty six"),
        ],
        "doc_id long, text string",
    )
    # n-gram sweep: blind to the paraphrase
    assert contaminated_ids(corpus_docs, eval_docs, n=5).count() == 0

    eval_emb = spark.createDataFrame(
        [(100, [0.9, 0.1, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    corpus_emb = spark.createDataFrame(
        [
            (1, [0.89, 0.11, 0.01, 0.0]),   # the paraphrase's embedding
            (2, [0.0, 0.0, 1.0, 0.0]),      # unrelated
        ],
        "vec_id long, embedding array<double>",
    )
    from nspc_etl_basic_spark.operators.similarity import train_ivf_centroids

    cents = train_ivf_centroids(corpus_emb, n_cells=2, n_iter=2)
    flagged = semantic_contaminated_ids(
        corpus_emb, eval_emb, cents, threshold=0.9
    ).collect()
    assert [r["vec_id"] for r in flagged] == [1]
    assert flagged[0]["n_eval_hits"] == 1
    assert flagged[0]["max_cos_sim"] >= 0.99

    with pytest.raises(ValueError, match="non-empty"):
        semantic_contaminated_ids(corpus_emb, eval_emb, [], threshold=0.9)
    with pytest.raises(ValueError, match="threshold"):
        semantic_contaminated_ids(corpus_emb, eval_emb, cents, threshold=0.0)


def test_stream_semdedup_randomized_updates_vs_scratch(spark, tmp_path):
    """Randomized adversary for the dirty-cell rebuild: three batches
    of seeded-random vectors with overlapping updates (ids re-embedded
    once or twice), fresh arrivals, and unchanged re-ingests mixed into
    update batches — after every drain the store must equal the
    from-scratch semantic_dedup of the latest vector per id."""
    import numpy as np

    from nspc_etl_basic_spark.streaming.semdedup import (
        label_store_table,
        run_stream_semdedup,
        semdedup_from_store,
    )

    rng = np.random.default_rng(1186)
    dim = 6

    def rv():
        return [float(x) for x in rng.normal(size=dim)]

    cents = [(c, rv()) for c in range(4)]
    schema = "vec_id long, embedding array<double>"
    store = label_store_table(spark, str(tmp_path / "store"), n_buckets=4)
    latest: dict[int, list[float]] = {}
    n_drains = [0]

    def drain(rows):
        n_drains[0] += 1
        src = str(tmp_path / f"b{n_drains[0]}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(schema).format("parquet").load(src)
        run_stream_semdedup(
            stream, store, str(tmp_path / f"ck{n_drains[0]}"), cents,
            threshold=0.5,
        )
        latest.update(dict(rows))
        got = {
            r["vec_id"]: (r["cell"], r["group_id"], r["keep"])
            for r in semdedup_from_store(store).collect()
        }
        want_df = spark.createDataFrame(sorted(latest.items()), schema)
        want = {
            r["vec_id"]: (r["cell"], r["group_id"], r["keep"])
            for r in semantic_dedup(
                want_df, centroids=cents, threshold=0.5
            ).collect()
        }
        assert got == want, f"batch {n_drains[0]} diverged"

    b1 = [(i, rv()) for i in range(80)]
    drain(b1)
    upd = sorted(rng.choice(80, size=15, replace=False).tolist())
    b2 = (
        [(int(i), rv()) for i in upd]
        + [(i, rv()) for i in range(80, 90)]
        + [(int(i), latest[int(i)]) for i in
           rng.choice([x for x in range(80) if x not in upd], 5,
                      replace=False)]
    )
    drain(b2)
    upd2 = sorted(rng.choice(90, size=8, replace=False).tolist())
    b3 = [(int(i), rv()) for i in upd2] + [
        (int(i), latest[int(i)])
        for i in rng.choice([x for x in range(90) if x not in upd2], 5,
                            replace=False)
    ]
    drain(b3)


def test_retire_ids_restores_from_scratch_of_survivors(spark, tmp_path):
    """retire_ids: removing a cut vertex splits its component, removing
    a group MIN relabels the survivors, unknown ids are a no-op, and
    the store always equals the from-scratch dedup of the survivors."""
    import math

    from nspc_etl_basic_spark.streaming.semdedup import (
        label_store_table,
        retire_ids,
        run_stream_semdedup,
        semdedup_from_store,
    )

    cents = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0, 0.0])]

    def v(deg, plane=0):
        c, s = math.cos(math.radians(deg)), math.sin(math.radians(deg))
        return [c, s, 0.0, 0.0] if plane == 0 else [0.0, 0.0, c, s]

    # chain 10-11-12 (11 the cut vertex) in cell 0; pair 20-21 in cell 1
    rows = [
        (10, v(0)),
        (11, v(25)),
        (12, v(50)),
        (20, v(0, plane=1)),
        (21, v(5, plane=1)),
    ]
    schema = "vec_id long, embedding array<double>"
    store = label_store_table(spark, str(tmp_path / "store"), n_buckets=2)
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    run_stream_semdedup(
        spark.readStream.schema(schema).format("parquet").load(src),
        store, str(tmp_path / "ck"), cents, threshold=0.9,
    )

    def store_now():
        return {
            r["vec_id"]: (r["cell"], r["group_id"], r["keep"])
            for r in semdedup_from_store(store).collect()
        }

    def scratch(latest):
        df = spark.createDataFrame(sorted(latest.items()), schema)
        return {
            r["vec_id"]: (r["cell"], r["group_id"], r["keep"])
            for r in semantic_dedup(
                df, centroids=cents, threshold=0.9
            ).collect()
        }

    latest = dict(rows)

    def retire(ids):
        n = retire_ids(
            store,
            spark.createDataFrame([(i,) for i in ids], "vec_id long"),
            threshold=0.9,
        )
        for i in ids:
            latest.pop(i, None)
        return n

    # unknown ids: no-op
    assert retire([999]) == 0
    assert store_now() == scratch(latest)

    # retire the cut vertex 11: {10,11,12} must split into {10},{12}
    assert retire([11]) == 1
    got = store_now()
    assert got == scratch(latest)
    assert got[10] == (0, 10, True) and got[12] == (0, 12, True)

    # retire the group MIN 20: 21 must take over its own label
    assert retire([20]) == 1
    got = store_now()
    assert got == scratch(latest)
    assert got[21] == (1, 21, True)

    # idempotent re-run of an already-applied retirement
    assert retire([11, 20]) == 0
    assert store_now() == scratch(latest)

    import pytest

    with pytest.raises(ValueError, match="threshold"):
        retire_ids(
            store, spark.createDataFrame([(1,)], "vec_id long"), threshold=0.0
        )
