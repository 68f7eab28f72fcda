"""Unit tests for the round-8 quality classifier: fixed-point
one-vs-rest token scorer trained on weak labels."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nspc_etl_basic_spark.operators.classifier import (
    CLF_SCALE,
    classify_tokens,
    quality_classifier,
    train_token_classifier,
)


def _labeled(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


def test_train_and_classify_hand_computed(spark):
    # tokens x/y/z/q land in distinct 1024-buckets (md5 with salt "t":
    # 256 / 866 / 903 / 854 — fixed, so deterministic test data)
    train = _labeled(spark, [(1, "x x y", "a"), (2, "y z", "b")])
    w = train_token_classifier(train, ["a", "b"], "text", "label", 1024, "t")
    wm = {(r["label"], r["bucket"]): r["w"] for r in w.collect()}
    # FULL grid: every class x every bucket
    assert len(wm) == 2 * 1024
    # smoothed conditional rates: n_a=3 tokens -> denom 1027; n_b=2 ->
    # denom 1026. x seen 2x under a; y once each; z once under b.
    S = CLF_SCALE
    assert wm[("a", 256)] == 3 * S // 1027  # x: (2+1)S/(3+1024)
    assert wm[("a", 866)] == 2 * S // 1027  # y
    assert wm[("a", 903)] == 1 * S // 1027  # z unseen under a
    assert wm[("a", 854)] == 1 * S // 1027  # q never trained
    assert wm[("b", 256)] == 1 * S // 1026
    assert wm[("b", 866)] == 2 * S // 1026
    assert wm[("b", 903)] == 2 * S // 1026

    docs = spark.createDataFrame(
        [(10, "x"), (11, "z z"), (12, "q"), (13, "")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r
        for r in classify_tokens(
            docs, w, ["a", "b"], "doc_id", "text", 1024, "t"
        ).collect()
    }
    assert len(got) == 4  # one row out per row in, empty doc included
    r10 = got[10]
    assert r10["score_a"] == 3 * S // 1027 and r10["score_b"] == S // 1026
    assert r10["pred_label"] == "a"
    r11 = got[11]
    assert r11["score_a"] == 2 * (S // 1027)
    assert r11["score_b"] == 2 * (2 * S // 1026)
    assert r11["pred_label"] == "b"
    # never-trained token: both classes get their smoothed zero-count
    # rate; the SMALLER class's flatter distribution rates it higher
    # (the standard NB small-sample property)
    r12 = got[12]
    assert r12["score_a"] == S // 1027 and r12["score_b"] == S // 1026
    assert r12["pred_label"] == "b"
    # zero-token doc: all-zero scores, null label (keyword_labels ladder)
    r13 = got[13]
    assert r13["score_a"] == 0 and r13["score_b"] == 0
    assert r13["pred_label"] is None


def test_classifier_not_degenerate_on_balanced_vocab(spark):
    # the round-8 regression that motivated rate normalization: with
    # unnormalized ratio weights, shared (class-neutral) vocabulary
    # biased every doc toward the majority class. Here every doc
    # shares 3 neutral tokens and carries its discriminative token 3x;
    # class "a" has 2x the training docs — the minority class must
    # still win its own docs. (n_buckets is deliberately well below
    # the training token count: in the B >> n_c regime the +1
    # smoothing mass itself skews rates by class size.)
    rows = []
    for i in range(40):
        rows.append((i, "red blue green alpha alpha alpha", "a"))
    for i in range(40, 60):
        rows.append((i, "red blue green beta beta beta", "b"))
    train = _labeled(spark, rows)
    w = train_token_classifier(train, ["a", "b"], "text", "label", 64, "d")
    docs = spark.createDataFrame(
        [
            (100, "red blue green beta beta beta"),
            (101, "red blue green alpha alpha alpha"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["pred_label"]
        for r in classify_tokens(
            docs, w, ["a", "b"], n_buckets=64, salt="d"
        ).collect()
    }
    assert got[101] == "a"
    assert got[100] == "b"  # ratio weights mislabeled this one "a"


def test_classify_deterministic_under_repartition(spark):
    train = _labeled(
        spark,
        [(i, f"alpha beta tok{i % 7}", "a" if i % 2 else "b") for i in range(40)],
    )
    w = train_token_classifier(train, ["a", "b"], "text", "label", 64, "s")
    docs = train.select("doc_id", "text")
    a = sorted(map(tuple, classify_tokens(docs, w, ["a", "b"], n_buckets=64, salt="s").collect()))
    b = sorted(
        map(
            tuple,
            classify_tokens(
                docs.repartition(7), w, ["a", "b"], n_buckets=64, salt="s"
            ).collect(),
        )
    )
    assert a == b


def test_quality_classifier_scores_unlabeled_docs(spark):
    # the keyword rules only decide docs containing the keywords; the
    # trained scorer must extend coverage to docs sharing their
    # co-occurring vocabulary
    rules = {"pos": ["good"], "neg": ["bad"]}
    docs = spark.createDataFrame(
        [
            (1, "good shiny clean prose"),
            (2, "bad broken garbled junk"),
            (3, "shiny clean prose here"),  # unlabeled, pos-vocab
            (4, "broken garbled junk here"),  # unlabeled, neg-vocab
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["pred_label"]
        for r in quality_classifier(docs, rules, n_buckets=256, salt="q").collect()
    }
    assert got[1] == "pos" and got[2] == "neg"
    assert got[3] == "pos" and got[4] == "neg"


def test_train_validation(spark):
    train = _labeled(spark, [(1, "x", "a")])
    with pytest.raises(ValueError):
        train_token_classifier(train, [], "text", "label")
    with pytest.raises(ValueError):
        train_token_classifier(train, ["a", "a"], "text", "label")
    with pytest.raises(ValueError):
        train_token_classifier(train, ["a"], "text", "label", n_buckets=0)


def test_classifier_agreement_hand_computed(spark):
    """Agreement metrics against a corpus where the rules separate
    perfectly: the scorer must recover its own labeling function, so
    every per-class row reads precision = recall = f1 = 1e6 ppm."""
    from nspc_etl_basic_spark.operators.classifier import classifier_agreement

    rows = [
        (1, "apple apple fruit"), (2, "apple pie"),
        (3, "motor engine"), (4, "motor oil"),
        (5, "nothing relevant here"),  # unlabeled: excluded from eval
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    rules = {"fruitish": ["apple"], "carish": ["motor"]}
    got = {
        r["label"]: r
        for r in classifier_agreement(
            docs, rules, n_buckets=256, salt="agree"
        ).collect()
    }
    assert set(got) == {"carish", "fruitish"}
    for lab, r in got.items():
        assert r["n_true"] == 2 and r["n_pred"] == 2 and r["n_correct"] == 2
        assert r["precision_ppm"] == 1_000_000
        assert r["recall_ppm"] == 1_000_000
        assert r["f1_ppm"] == 1_000_000


def test_classifier_agreement_matches_reference_confusion(spark):
    """The agreement row set must equal a confusion matrix computed
    directly from keyword_labels + quality_classifier outputs — the
    operator is an aggregation, not a new model."""
    from nspc_etl_basic_spark.operators.classifier import (
        classifier_agreement,
        quality_classifier,
    )
    from nspc_etl_basic_spark.operators.labeling import keyword_labels

    rows = [
        (i, t) for i, t in enumerate(
            ["zeta zeta rare", "zeta zeta", "rare rare", "zeta rare rare",
             "nothing", "zeta", "rare", "zeta zeta zeta rare rare"]
        )
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    rules = {"common": ["zeta"], "rare": ["rare"]}
    weak = {
        r["doc_id"]: r["label"]
        for r in keyword_labels(docs, "doc_id", "text", rules).collect()
    }
    pred = {
        r["doc_id"]: r["pred_label"]
        for r in quality_classifier(
            docs, rules, n_buckets=64, salt="dis"
        ).collect()
    }
    expected = {}
    for lab in rules:
        labeled = [d for d, w in weak.items() if w is not None]
        n_true = sum(1 for d in labeled if weak[d] == lab)
        n_pred = sum(1 for d in labeled if pred[d] == lab)
        n_corr = sum(1 for d in labeled if weak[d] == lab and pred[d] == lab)
        expected[lab] = (n_true, n_pred, n_corr)
    got = {
        r["label"]: r
        for r in classifier_agreement(
            docs, rules, n_buckets=64, salt="dis"
        ).collect()
    }
    assert set(got) == set(expected)
    for lab, (n_true, n_pred, n_corr) in expected.items():
        r = got[lab]
        assert (r["n_true"], r["n_pred"], r["n_correct"]) == (
            n_true, n_pred, n_corr
        )
        assert r["precision_ppm"] == (
            1_000_000 * n_corr // n_pred if n_pred else None
        )
        assert r["recall_ppm"] == (
            1_000_000 * n_corr // n_true if n_true else None
        )
        assert r["f1_ppm"] == (
            2_000_000 * n_corr // (n_pred + n_true)
            if n_pred + n_true else None
        )


def test_classifier_agreement_no_labels_yields_zero_rows(spark):
    """When no rule fires anywhere, the eval must still emit one
    all-zero row per class (null ratios), not an empty frame."""
    from nspc_etl_basic_spark.operators.classifier import classifier_agreement

    docs = spark.createDataFrame(
        [(1, "nothing matches"), (2, "still nothing")], ["doc_id", "text"]
    )
    rules = {"a": ["qqq"], "b": ["zzz"]}
    got = {
        r["label"]: r
        for r in classifier_agreement(
            docs, rules, n_buckets=64, salt="none"
        ).collect()
    }
    assert set(got) == {"a", "b"}
    for r in got.values():
        assert (r["n_true"], r["n_pred"], r["n_correct"]) == (0, 0, 0)
        assert r["precision_ppm"] is None
        assert r["recall_ppm"] is None
        assert r["f1_ppm"] is None


def test_classifier_handles_null_text(spark):
    # a null text column must not drop the row: zero scores, null label
    from pyspark.sql import functions as F

    train = _labeled(spark, [(1, "alpha beta", "a"), (2, "gamma", "b")])
    w = train_token_classifier(train, ["a", "b"], "text", "label", 64, "n")
    docs = spark.createDataFrame(
        [(1, "alpha"), (2, None)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in classify_tokens(docs, w, ["a", "b"], n_buckets=64, salt="n").collect()
    }
    assert len(got) == 2
    assert got[2]["score_a"] == 0 and got[2]["score_b"] == 0
    assert got[2]["pred_label"] is None


def test_holdout_eval_scores_only_the_eval_slice(spark):
    from nspc_etl_basic_spark.operators.classifier import (
        classifier_agreement,
        classifier_holdout_eval,
    )

    rules = {"cats": ["cat", "kitten"], "dogs": ["dog", "puppy"]}
    train = spark.createDataFrame(
        [
            (1, "cat cat kitten purrs"),
            (2, "dog dog puppy barks"),
            (3, "kitten naps on the cat tree"),
            (4, "puppy chews the dog toy"),
        ],
        "doc_id long, text string",
    )
    # eval docs share VOCABULARY but not ids with train; doc 12 has no
    # keyword -> excluded from metrics (null weak label)
    evald = spark.createDataFrame(
        [
            (10, "a sleepy cat"),
            (11, "a loud dog"),
            (12, "a quiet afternoon"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["label"]: r
        for r in classifier_holdout_eval(
            train, evald, rules, n_buckets=64, salt="h"
        ).collect()
    }
    assert set(rows) == {"cats", "dogs"}
    # only the two weak-labeled eval docs count: one true per class
    assert rows["cats"]["n_true"] == 1 and rows["dogs"]["n_true"] == 1
    for r in rows.values():
        assert r["n_correct"] <= min(r["n_pred"], r["n_true"])
    # the model trained on 1-4 generalizes the keyword signal to 10/11
    assert rows["cats"]["n_correct"] == 1
    assert rows["dogs"]["n_correct"] == 1
    # and the metric is computed on the EVAL slice only: train-set
    # agreement over the same 4 train docs sees 2 per class
    agree = {
        r["label"]: r
        for r in classifier_agreement(
            train, rules, n_buckets=64, salt="h"
        ).collect()
    }
    assert agree["cats"]["n_true"] == 2 and agree["dogs"]["n_true"] == 2


def test_pr_curve_matches_python_reference(spark):
    """classifier_pr_curve's sweep must equal a Python cumulative
    recomputation from the SAME scores and weak labels the component
    operators produce (scoring itself is pinned elsewhere)."""
    from nspc_etl_basic_spark.operators.classifier import (
        classifier_pr_curve,
        classify_tokens,
        train_token_classifier,
    )
    from nspc_etl_basic_spark.operators.labeling import keyword_labels

    rules = {"cats": ["cat", "kitten"], "dogs": ["dog", "puppy"]}
    train = spark.createDataFrame(
        [
            (1, "cat cat kitten purrs"),
            (2, "dog dog puppy barks"),
            (3, "kitten naps on the cat tree"),
            (4, "puppy chews the dog toy"),
        ],
        "doc_id long, text string",
    )
    evald = spark.createDataFrame(
        [
            (10, "a sleepy cat cat"),
            (11, "a loud dog"),
            (12, "the kitten and the cat nap"),
            (13, "dog puppy dog"),
            (14, "a quiet afternoon"),  # no keyword: excluded
        ],
        "doc_id long, text string",
    )
    got = (
        classifier_pr_curve(
            train, evald, rules, "cats", n_buckets=64, salt="h"
        )
        .orderBy(F.col("threshold").desc())
        .collect()
    )

    # independent recomputation from the component operators
    labels = sorted(rules)
    train_weak = keyword_labels(train, "doc_id", "text", rules).where(
        F.col("label").isNotNull()
    ).select("doc_id", "label")
    w = train_token_classifier(
        train.join(train_weak, "doc_id"), labels, "text", "label", 64, "h"
    )
    scores = {
        r["doc_id"]: r["score_cats"]
        for r in classify_tokens(
            evald, w, labels, "doc_id", "text", 64, "h"
        ).collect()
    }
    weak = {
        r["doc_id"]: r["label"]
        for r in keyword_labels(evald, "doc_id", "text", rules)
        .where(F.col("label").isNotNull())
        .collect()
    }
    pts = sorted(
        ((scores[d], weak[d] == "cats") for d in weak), reverse=True
    )
    n_pos = sum(p for _, p in pts)
    n_eval = len(pts)
    expected, n_keep, n_pos_kept = [], 0, 0
    for t in sorted({s for s, _ in pts}, reverse=True):
        grp = [(s, p) for s, p in pts if s == t]
        n_keep += len(grp)
        n_pos_kept += sum(p for _, p in grp)
        expected.append(
            (
                t,
                n_keep,
                n_pos_kept,
                (1_000_000 * n_pos_kept) // n_keep,
                (1_000_000 * n_pos_kept) // n_pos if n_pos else None,
                (2_000_000 * n_pos_kept) // (n_keep + n_pos),
                (1_000_000 * n_keep) // n_eval,
            )
        )
    assert [tuple(r) for r in got] == expected
    # curve invariants: keep set grows, recall never decreases
    keeps = [r["n_keep"] for r in got]
    recalls = [r["recall_ppm"] for r in got]
    assert keeps == sorted(keeps)
    assert recalls == sorted(recalls)
    # the full-keep row recovers every positive
    assert got[-1]["recall_ppm"] == 1_000_000
    assert got[-1]["keep_frac_ppm"] == 1_000_000


def test_pr_curve_and_holdout_validation_guards(spark):
    from nspc_etl_basic_spark.operators.classifier import (
        classifier_holdout_eval,
        classifier_pr_curve,
    )

    rules = {"cats": ["cat"], "dogs": ["dog"]}
    a = spark.createDataFrame(
        [(1, "cat one"), (2, "dog two")], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(2, "dog two"), (3, "cat three")], "doc_id long, text string"
    )
    import pytest

    with pytest.raises(ValueError, match="positive_label"):
        classifier_pr_curve(a, b, rules, "birds")
    # the disjointness guard: id 2 overlaps
    with pytest.raises(ValueError, match="overlap"):
        classifier_pr_curve(a, b, rules, "cats", check_disjoint=True)
    with pytest.raises(ValueError, match="overlap"):
        classifier_holdout_eval(a, b, rules, check_disjoint=True)
    # disjoint slices pass the guard
    c = spark.createDataFrame([(3, "cat three")], "doc_id long, text string")
    assert classifier_holdout_eval(
        a, c, rules, n_buckets=16, check_disjoint=True
    ).count() == 2


def test_pr_curve_precomputed_weights_equal_in_curve_training(spark):
    """The weights parameter exists so a selection pipeline trains ONCE
    for both the curve and downstream scoring; training is
    deterministic, so passing the externally-trained grid must
    reproduce the default path's curve exactly (the
    corpus_quality_select_pr single-train contract)."""
    from nspc_etl_basic_spark.operators.classifier import (
        classifier_pr_curve,
        train_weak_weights,
    )

    rules = {"cats": ["cat", "purr"], "dogs": ["dog", "bark"]}
    train = spark.createDataFrame(
        [(i, f"cat purr number {i}") for i in range(6)]
        + [(10 + i, f"dog bark number {i}") for i in range(6)],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "cat purr evaluation"), (101, "dog bark evaluation"),
         (102, "cat item"), (103, "dog item")],
        "doc_id long, text string",
    )
    default = classifier_pr_curve(train, ev, rules, "cats", n_buckets=32)

    w = train_weak_weights(train, rules, n_buckets=32)
    external = classifier_pr_curve(
        train, ev, rules, "cats", n_buckets=32, weights=w
    )
    assert sorted(map(tuple, default.collect())) == sorted(
        map(tuple, external.collect())
    )
