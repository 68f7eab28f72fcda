"""Unit tests for the round-7 curation operators: deterministic source
mixing, DSIR-style importance scoring, shard assignment, n-gram
novelty."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nspc_etl_basic_spark.operators.dsir import dsir_scores, dsir_weights
from nspc_etl_basic_spark.operators.mixing import mix_rates, mix_sources
from nspc_etl_basic_spark.operators.novelty import ngram_novelty
from nspc_etl_basic_spark.operators.packing import (
    pack_greedy,
    shard_assign,
    shard_report,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "n_chars"])


def test_mix_rates_hand_computed(spark):
    rows = [
        (1, "a", "en", 6000),
        (2, "b", "en", 6000),
        (3, "c", "de", 100),
        (4, "d", "xx", 5000),
    ]
    # budget 6000, parts en:2 de:1 -> target en 4000, de 2000
    rates = {
        r["lang"]: r
        for r in mix_rates(
            _docs(spark, rows), "lang", "n_chars", {"en": 2, "de": 1}, 6000
        ).collect()
    }
    en = rates["en"]
    assert en["stratum_tokens"] == 12000 and en["target_tokens"] == 4000
    assert en["threshold"] == 4000 * 10000 // 12000
    # tiny stratum: rate caps at the full ring
    de = rates["de"]
    assert de["target_tokens"] == 2000 and de["threshold"] == 10000
    # stratum not in parts is explicitly dropped
    assert rates["xx"]["threshold"] == 0


def test_mix_sources_membership_is_pure_function_of_key(spark):
    rows = [(i, f"doc {i}", "en" if i % 2 else "de", 100) for i in range(200)]
    df = _docs(spark, rows)
    parts = {"en": 1, "de": 1}
    a = {r["doc_id"] for r in mix_sources(df, "doc_id", "lang", "n_chars", parts, 5000).collect()}
    b = {r["doc_id"] for r in mix_sources(df.repartition(7), "doc_id", "lang", "n_chars", parts, 5000).collect()}
    assert a == b and 0 < len(a) < 200
    # dropping unrelated rows never flips surviving membership
    c = {
        r["doc_id"]
        for r in mix_sources(
            df.where(F.col("doc_id") < 100), "doc_id", "lang", "n_chars", parts, 5000
        ).collect()
    }
    # thresholds change with totals, but the draw stays hash-ordered:
    # a kept doc under a LOWER threshold is a subset guarantee only if
    # totals shrink -> threshold grows; assert determinism instead
    d = {
        r["doc_id"]
        for r in mix_sources(
            df.where(F.col("doc_id") < 100), "doc_id", "lang", "n_chars", parts, 5000
        ).collect()
    }
    assert c == d


def test_mix_validation(spark):
    df = _docs(spark, [(1, "a", "en", 10)])
    with pytest.raises(ValueError):
        mix_rates(df, "lang", "n_chars", {"en": 1}, 0)
    with pytest.raises(ValueError):
        mix_rates(df, "lang", "n_chars", {"en": -1}, 10)


def test_dsir_weights_and_scores_hand_computed(spark):
    # two docs sharing one word; target contains only doc 1
    src = _docs(
        spark,
        [(1, "alpha alpha beta", "en", 16), (2, "beta gamma", "de", 10)],
    )
    tgt = src.where(F.col("lang") == "en")
    w = {r["bucket"]: r["w"] for r in dsir_weights(src, tgt, "text", 64, "t").collect()}
    # per-bucket: alpha s=2 t=2 -> (3*1e6)//3 = 1e6; beta s=2 t=1 ->
    # (2*1e6)//3; gamma s=1 t=0 -> (1*1e6)//2
    assert sorted(w.values()) == sorted(
        [1_000_000, 2_000_000 // 3, 1_000_000 // 2]
    )
    scores = {
        r["doc_id"]: r["score"]
        for r in dsir_scores(src, tgt, "doc_id", "text", 64, "t").collect()
    }
    assert scores[1] == 2 * 1_000_000 + 2_000_000 // 3
    assert scores[2] == 2_000_000 // 3 + 1_000_000 // 2
    assert scores[1] > scores[2]  # the target-like doc ranks higher


def test_shard_assign_and_report(spark):
    rows = [(f"d{i}", 5) for i in range(40)]
    packed = pack_greedy(
        spark.createDataFrame(rows, ["k", "w"]), "k", "w", 10, n_buckets=4
    )
    sharded = shard_assign(packed, n_shards=3)
    got = sharded.collect()
    # every packed row gets a shard; sequence-mates share it
    by_seq = {}
    for r in got:
        assert r["shard"] is not None and 0 <= r["shard"] < 3
        by_seq.setdefault((r["bucket"], r["bin"]), set()).add(r["shard"])
    assert all(len(s) == 1 for s in by_seq.values())
    rep = shard_report(sharded, "w", 10).collect()
    assert sum(r["n_docs"] for r in rep) == 40
    assert sum(r["tokens"] for r in rep) == 200
    for r in rep:
        assert r["fill_frac"] == round(r["tokens"] / (r["n_seqs"] * 10), 6)
    # unpacked rows carry a null shard
    over = pack_greedy(
        spark.createDataFrame([("x", 99)], ["k", "w"]), "k", "w", 10
    )
    assert shard_assign(over, 3).collect()[0]["shard"] is None


def test_ngram_novelty_hand_computed(spark):
    rows = [
        (1, "the quick brown fox", "a", 0),
        (2, "the quick brown cat", "b", 0),  # shares 'the quick brown'
        (3, "xx", "c", 0),  # too short for any 3-gram
    ]
    out = {
        r["lang"]: r
        for r in ngram_novelty(
            _docs(spark, rows), group_col="lang", text_col="text", n=3
        ).collect()
    }
    a, b, c = out["a"], out["b"], out["c"]
    assert a["n_instances"] == 2 and a["n_distinct"] == 2 and a["n_new"] == 2
    # b has 2 grams, 1 first seen earlier in a
    assert b["n_distinct"] == 2 and b["n_new"] == 1
    assert b["novelty_frac"] == 0.5
    assert c["n_distinct"] == 0 and c["n_new"] == 0 and c["novelty_frac"] is None


def test_seqlen_plan_hand_computed(spark):
    from nspc_etl_basic_spark.operators.packing import seqlen_plan

    rows = [("a", "x", "en", w) for w in [5, 8, 12, 0, None]]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "n_chars"])
    out = {r["seq_len"]: r for r in seqlen_plan(df, "n_chars", [10, 20]).collect()}
    ten = out[10]
    assert ten["n_docs_fit"] == 2 and ten["n_docs_oversize"] == 1
    assert ten["packable_tokens"] == 13
    assert ten["bins_lower_bound"] == 2  # ceil(13/10)
    assert ten["pad_frac_lower_bound"] == round(1 - 13 / 20, 6)
    twenty = out[20]
    assert twenty["n_docs_fit"] == 3 and twenty["n_docs_oversize"] == 0
    assert twenty["packable_tokens"] == 25
    assert twenty["bins_lower_bound"] == 2  # ceil(25/20)
    with pytest.raises(ValueError):
        seqlen_plan(df, "n_chars", [])


def test_ngram_overlap_matrix_hand_computed(spark):
    from nspc_etl_basic_spark.operators.novelty import ngram_overlap_matrix

    rows = [
        (1, "the quick brown fox jumps", "a", 0),  # grams: tqb, qbf, bfj
        (2, "the quick brown cat", "b", 0),        # grams: tqb, qbc
        (3, "zz yy xx ww", "c", 0),                # disjoint
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "n_chars"])
    out = {
        (r["lang_a"], r["lang_b"]): r
        for r in ngram_overlap_matrix(df, group_col="lang", n=3).collect()
    }
    # only the (a, b) pair shares anything; disjoint pairs are absent
    assert set(out) == {("a", "b")}
    ab = out[("a", "b")]
    assert ab["shared"] == 1  # 'the quick brown'
    assert ab["containment"] == round(1 / 2, 6)  # b has 2 distinct grams


def test_seqlen_plan_empty_corpus_reports_zeros(spark):
    from nspc_etl_basic_spark.operators.packing import seqlen_plan

    df = spark.createDataFrame([], "doc_id long, n_chars long")
    out = {r["seq_len"]: r for r in seqlen_plan(df, "n_chars", [10]).collect()}
    r = out[10]
    assert (r["n_docs_fit"], r["n_docs_oversize"], r["packable_tokens"]) == (0, 0, 0)
    assert r["bins_lower_bound"] == 0 and r["pad_frac_lower_bound"] is None


def test_write_read_packed_dataset_roundtrip(spark, tmp_path):
    """pack -> materialize -> write shards -> read back: every sequence
    survives, shard ids match shard_assign, and a single-shard read
    prunes to that shard only."""
    from nspc_etl_basic_spark.operators.packing import pack_materialize
    from nspc_etl_basic_spark.sinks.dataloader import (
        read_packed_dataset,
        write_packed_dataset,
    )

    rows = [(f"d{i}", 5) for i in range(40)]
    packed = pack_greedy(
        spark.createDataFrame(rows, ["k", "w"]), "k", "w", 10, n_buckets=4
    )
    toks = spark.createDataFrame(
        [(f"d{i}", [i] * 5) for i in range(40)], ["k", "tokens"]
    ).select("k", F.col("tokens").cast("array<long>").alias("tokens"))
    mat = pack_materialize(packed, toks, "k", seq_len=10)
    n_seqs = mat.count()

    path = str(tmp_path / "packed_ds")
    write_packed_dataset(mat, path, n_shards=3)
    back = read_packed_dataset(spark, path)
    assert back.count() == n_seqs
    assert set(back.columns) == {
        "bucket", "bin", "n_segments", "fill", "input_ids", "segment_ids",
        "shard",
    }
    # shard ids equal shard_assign's over the assignment
    expected = {
        (r["bucket"], r["bin"]): r["shard"]
        for r in shard_assign(packed, 3).collect()
        if r["shard"] is not None
    }
    got = {(r["bucket"], r["bin"]): r["shard"] for r in back.collect()}
    assert got == expected
    # single-shard read returns exactly that shard's sequences
    some_shard = next(iter(got.values()))
    one = read_packed_dataset(spark, path, shard=some_shard)
    assert one.count() == sum(1 for v in got.values() if v == some_shard)
    assert {r["shard"] for r in one.collect()} == {some_shard}


def test_keyword_labels_deterministic_tiebreak_and_nulls(spark):
    from nspc_etl_basic_spark.operators.labeling import keyword_labels

    rows = [
        (1, "join the JOIN merge"),   # joins 3
        (2, "scan scan table"),       # storage 3
        (3, "nothing here"),          # no hits -> null
        (4, "join scan"),             # 1-1 tie -> first sorted label
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    rules = {"joins": ["join", "merge"], "storage": ["scan", "table"]}
    out = {r["id"]: r for r in keyword_labels(df, "id", "text", rules).collect()}
    assert out[1]["label"] == "joins" and out[1]["score_joins"] == 3
    assert out[2]["label"] == "storage"
    assert out[3]["label"] is None
    assert out[4]["label"] == "joins"  # tie -> first in sorted order
    with pytest.raises(ValueError):
        keyword_labels(df, "id", "text", {"x": []})
    with pytest.raises(ValueError):
        keyword_labels(df, "id", "text", {"x": ["UPPER"]})


def test_preference_pairs_adjacent_ranks_and_gap(spark):
    from nspc_etl_basic_spark.operators.preference import preference_pairs

    rows = [
        (1, "en", 100), (2, "en", 90), (3, "en", 90), (4, "en", 50),
        (5, "de", 10),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "score"])
    out = sorted(
        (r["chosen_id"], r["rejected_id"], r["gap"])
        for r in preference_pairs(
            df, "doc_id", "score", "lang", min_gap=1
        ).collect()
    )
    # rank order en: 1(100), 2(90), 3(90), 4(50). Pairs: (1,2,gap10);
    # (2,3) tie dropped by min_gap; (3,4,gap40). de has one doc: none.
    assert out == [(1, 2, 10), (3, 4, 40)]
    # min_gap=0 keeps the tie pair, deterministically ordered by id
    out0 = sorted(
        (r["chosen_id"], r["rejected_id"])
        for r in preference_pairs(
            df, "doc_id", "score", "lang", min_gap=0
        ).collect()
    )
    assert out0 == [(1, 2), (2, 3), (3, 4)]
    import pytest as _pt
    with _pt.raises(ValueError):
        preference_pairs(df, "doc_id", "score", "lang", min_gap=-1)


def test_robust_stats_and_winsorize_hand_computed(spark):
    from nspc_etl_basic_spark.operators.robust import (
        robust_stats_by_key,
        winsorize_by_key,
    )

    rows = [("a", float(v)) for v in [1, 2, 3, 4, 100]] + [("b", 7.0)]
    df = spark.createDataFrame(rows, ["k", "v"])
    stats = {r["k"]: r for r in robust_stats_by_key(df, "k", "v").collect()}
    # a: median 3; |dev| = [2,1,0,1,97] -> median 1
    assert stats["a"]["median"] == 3.0 and stats["a"]["mad"] == 1.0
    assert stats["a"]["n"] == 5
    assert stats["b"]["median"] == 7.0 and stats["b"]["mad"] == 0.0
    # winsorize at [0.25, 0.75]: fences for a are 2.0 and 4.0
    wins = {
        (r["k"], r["v"]): r["v_wins"]
        for r in winsorize_by_key(df, "k", "v", 0.25, 0.75).collect()
    }
    assert wins[("a", 1.0)] == 2.0      # clamped up
    assert wins[("a", 100.0)] == 4.0    # clamped down
    assert wins[("a", 3.0)] == 3.0      # untouched
    import pytest as _pt
    with _pt.raises(ValueError):
        winsorize_by_key(df, "k", "v", 0.9, 0.1)


def test_robust_stats_keeps_null_key_group(spark):
    from nspc_etl_basic_spark.operators.robust import (
        robust_stats_by_key,
        winsorize_by_key,
    )

    rows = [("a", 1.0), ("a", 3.0), (None, 5.0), (None, 7.0)]
    df = spark.createDataFrame(rows, ["k", "v"])
    stats = {r["k"]: r for r in robust_stats_by_key(df, "k", "v").collect()}
    assert set(stats) == {"a", None}
    assert stats[None]["median"] == 6.0 and stats[None]["n"] == 2
    wins = winsorize_by_key(df, "k", "v", 0.0, 1.0)
    assert wins.count() == 4  # every input row returned, null key included


def test_mix_rates_surfaces_missing_and_quantized_strata(spark):
    rows = [
        (1, "a", "en", 6000),
        (2, "b", "en", 6000),
    ]
    # "fr" is in the recipe but absent from the data: it must still get
    # a row (budget share visibly unspent), not vanish from the plan.
    rates = {
        r["lang"]: r
        for r in mix_rates(
            _docs(spark, rows), "lang", "n_chars", {"en": 2, "fr": 1}, 6000
        ).collect()
    }
    fr = rates["fr"]
    assert fr["stratum_tokens"] == 0 and fr["target_tokens"] == 2000
    assert fr["threshold"] == 0 and fr["quantized_to_zero"] is False
    assert rates["en"]["quantized_to_zero"] is False

    # effective rate below 1/10000 floors the ring cut to 0: positive
    # share, nothing drawn — the flag is the audit signal.
    big = [(i, "x", "en", 10_000_000) for i in range(3)] + [
        (99, "y", "de", 10_000_000)
    ]
    rates2 = {
        r["lang"]: r
        for r in mix_rates(
            _docs(spark, big), "lang", "n_chars", {"en": 999, "de": 1}, 10_000
        ).collect()
    }
    de = rates2["de"]
    assert de["target_tokens"] > 0 and de["threshold"] == 0
    assert de["quantized_to_zero"] is True


def test_mix_rates_rejects_keys_that_do_not_survive_the_cast(spark):
    """parts keys are cast to the strata column's type: a key that
    casts to NULL would never join (confusing null-stratum row), and
    two keys collapsing to one cast value would double-count a stratum
    — both must fail fast instead."""
    rows = [(1, "a", 7, 6000), (2, "b", 8, 6000)]
    df = spark.createDataFrame(
        rows, "doc_id long, src string, lang int, n_chars long"
    )
    with pytest.raises(ValueError, match="do not cast"):
        mix_rates(df, "lang", "n_chars", {"7": 1, "xx": 1}, 6000)
    with pytest.raises(ValueError, match="collapse"):
        mix_rates(df, "lang", "n_chars", {"7": 1, "07": 1}, 6000)
    # round-trippable keys still work
    out = {
        r["lang"]: r
        for r in mix_rates(
            df, "lang", "n_chars", {"7": 1, "8": 1}, 6000
        ).collect()
    }
    assert out[7]["target_tokens"] == 3000


def test_keyword_labels_rejects_sql_hostile_rules(spark):
    from nspc_etl_basic_spark.operators.labeling import keyword_labels

    df = spark.createDataFrame([(1, "hello")], ["doc_id", "text"])
    with pytest.raises(ValueError, match=r"\[a-z0-9 \]"):
        keyword_labels(df, "doc_id", "text", {"ok": ["don't"]})
    with pytest.raises(ValueError, match=r"\[a-z0-9 \]"):
        keyword_labels(df, "doc_id", "text", {"ok": ["a'b"]})
    with pytest.raises(ValueError, match=r"\[a-z0-9_\]"):
        keyword_labels(df, "doc_id", "text", {"bad label'": ["fine"]})
    # plain lowercase keywords still pass
    out = keyword_labels(df, "doc_id", "text", {"greet": ["hello"]}).collect()
    assert out[0]["label"] == "greet"
