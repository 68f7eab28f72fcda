"""Train-and-score quality classifier over hashed token features — the
fasttext-style curation stage between keyword heuristics and importance
resampling: weak labels (``labeling.keyword_labels``) train a
one-vs-rest linear scorer whose weights are Laplace-smoothed
CLASS-CONDITIONAL TOKEN RATES in fixed-point, and every document in the
corpus gets per-class scores plus an argmax label.

Published pipelines (CCNet / LLaMA "quality classifier", fasttext
supervised) train a linear model over hashed n-gram features from a
small labeled seed and score the whole corpus. This implementation keeps
that shape but swaps learned float weights for the engine's FIXED-POINT
integer arithmetic (the ``dsir.py`` precedent), so train + score is
exact BIGINT end-to-end and a DuckDB oracle replays every value:

    w(c, b)     = ((cnt(b, c) + 1) * CLF_SCALE) div (n_c + n_buckets)
    score(d, c) = sum over d's buckets b of cnt(d, b) * w(c, b)
    label(d)    = argmax_c score(d, c)  (ties -> first sorted label;
                  zero-token docs -> null, same ladder as
                  keyword_labels)

where ``n_c`` is the class's total training-token count — i.e. w is
the Laplace-smoothed rate p(b | c) at CLF_SCALE fixed-point. The
per-class NORMALIZATION is load-bearing: a first cut used unnormalized
class-vs-rest count ratios, and because ratio weights are all positive
and additive, every class-NEUTRAL token contributed a bias proportional
to class share — on a real corpus the argmax degenerated to the
majority class for all 500 documents. With conditional rates a neutral
token contributes (near-)equally to every class and cancels in the
argmax, so the discriminative vocabulary decides. (Sums of rates, not
products of probabilities — this is a linear scorer in NB clothing, not
a probabilistic NB; no transcendentals, no floats.)

Scale: training aggregates the LABELED slice to EXACTLY
``n_labels * n_buckets`` weight rows (the full grid, a few thousand —
broadcast at any corpus size; full coverage is what lets scoring use a
plain inner join with no per-class smoothing fallback). Scoring is one
explode + per-(doc, bucket) pre-aggregate over the corpus, a broadcast
join against the weight table, and one groupBy(doc). The corpus text
never shuffles; only (doc, bucket, cnt) triples do.

n_buckets sizing: keep n_buckets well BELOW the per-class training
token count. In the opposite regime (n_buckets >> n_c) the +1 Laplace
mass dominates the rates and itself skews neutral tokens by class
size; with n_c >> n_buckets a neutral token's rate converges to its
corpus share for every class and the +1 contributes only an O(1/n_c)
minority-ward drift.

CLF_SCALE sizing: score(d, c) <= n_tokens(d) * CLF_SCALE and weights
quantize at CLF_SCALE / (n_c + n_buckets) resolution, so 1e9 keeps
~4 significant digits on a 1e5-token training class while bounding
per-doc scores around 1e13 for 10k-token documents — far inside BIGINT
on both engines. (dsir's 1e6 underflows to 0 once a class holds ~1e6+
training tokens; at 100 TB raise CLF_SCALE, not the token budget.)

Reference parity: no counterpart in /root/reference — extension surface
(LLM-pipeline family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nspc_etl_basic_spark.operators.dsir import hashed_token_counts

__all__ = [
    "train_token_classifier",
    "classify_tokens",
    "quality_classifier",
    "classifier_agreement",
    "classifier_holdout_eval",
    "classifier_pr_curve",
]

CLF_SCALE = 1_000_000_000


def _label_buckets(
    labeled: DataFrame,
    text_col: str,
    label_col: str,
    n_buckets: int,
    salt: str,
) -> DataFrame:
    """One row per (label, bucket) token occurrence in the labeled
    slice — the training token stream."""
    from nspc_etl_basic_spark.operators.dsir import _token_bucket
    from nspc_etl_basic_spark.operators.text import word_tokens

    return labeled.where(F.col(label_col).isNotNull()).select(
        F.col(label_col).alias("label"),
        F.explode(word_tokens(F.col(text_col))).alias("__tok"),
    ).select(
        "label", _token_bucket(F.col("__tok"), n_buckets, salt).alias("bucket")
    )


def train_token_classifier(
    labeled: DataFrame,
    labels: list[str],
    text_col: str = "text",
    label_col: str = "label",
    n_buckets: int = 1024,
    salt: str = "clf",
) -> DataFrame:
    """``(label, bucket, w)`` fixed-point Laplace-smoothed
    class-conditional token rates from a labeled corpus slice:
    ``w = ((cnt(b, c) + 1) * CLF_SCALE) div (n_c + n_buckets)``.
    ``labels`` is the full class list; the output covers the COMPLETE
    ``len(labels) * n_buckets`` grid (every class x every possible
    bucket), so scoring never needs a smoothing fallback — a class that
    never saw a bucket carries its smoothed zero-count rate explicitly.
    A few thousand rows — always broadcastable."""
    if not labels or len(set(labels)) != len(labels):
        raise ValueError(f"labels must be non-empty and unique: {labels}")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")

    b = _label_buckets(labeled, text_col, label_col, n_buckets, salt)
    # ONE tokenize pass over the training slice (round 13, guide §2.4):
    # the per-label total is the bucket-marginal of the (label, bucket)
    # grid — sum(c_cnt) over buckets == count of the label's token
    # occurrences — so deriving nc from the tiny materialized grid
    # replaces a second full tokenize+explode of the slice. The grid is
    # <= |labels| * n_buckets rows (broadcast-sized by the module
    # contract), so the checkpoint is metadata-cheap.
    lb = b.groupBy("label", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c_cnt")
    ).localCheckpoint(eager=True)
    nc = lb.groupBy("label").agg(
        F.sum("c_cnt").cast("long").alias("n_c")
    )
    # full labels x buckets grid via range + literal-array explode
    # (pure projection — no cartesian join enters the plan)
    spark = labeled.sparkSession
    grid = spark.range(n_buckets).select(
        F.explode(F.lit(sorted(labels))).alias("label"),
        F.col("id").cast("long").alias("bucket"),
    )
    return (
        grid.join(lb, ["label", "bucket"], "left")
        .join(nc, "label", "left")
        .select(
            "label",
            "bucket",
            F.expr(
                f"(coalesce(c_cnt, CAST(0 AS BIGINT)) + 1) "
                f"* CAST({CLF_SCALE} AS BIGINT) "
                f"div (coalesce(n_c, CAST(0 AS BIGINT)) + {int(n_buckets)})"
            ).alias("w"),
        )
    )


def classify_tokens(
    df: DataFrame,
    weights: DataFrame,
    labels: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    salt: str = "clf",
) -> DataFrame:
    """Score every row of ``df``: ``(id_col, score_<label>...,
    pred_label)`` with one BIGINT score column per class (sorted label
    order) and the argmax label (ties -> first sorted label; docs with
    zero word tokens score 0 everywhere and get a null label).
    ``weights`` must cover the full labels x buckets grid (what
    ``train_token_classifier`` emits) — the join is inner, so a
    missing (label, bucket) row would silently drop that bucket's
    contribution for that class. One row out per row in."""
    labels = sorted(labels)
    dc = hashed_token_counts(df, id_col, text_col, n_buckets, salt)
    # pivot the (broadcast-sized) weight grid to ONE row per bucket with
    # one weight column per class, so the corpus-sized (doc, bucket, cnt)
    # stream joins ONCE per row instead of once per (row, label) — the
    # previous explode-by-labels multiplied the scored stream (and the
    # partial-aggregate input feeding the doc-keyed shuffle) by
    # len(labels). Arithmetic is unchanged: score_<lab> is still
    # sum(cnt * w(lab, bucket)) over the same (doc, bucket) set — a
    # label's missing (label, bucket) row pivots to a NULL weight whose
    # product the sum skips, exactly as the inner join dropped it.
    wide = (
        weights.groupBy("bucket")
        .pivot("label", labels)
        .agg(F.first("w"))
        .select(
            "bucket",
            *[
                F.col(f"`{lab}`").alias(f"__w_{lab}")
                for lab in labels
            ],
        )
    )
    parts = dc.join(F.broadcast(wide), "bucket").select(
        id_col,
        *[
            (F.col("cnt") * F.col(f"__w_{lab}")).alias(f"__part_{lab}")
            for lab in labels
        ],
    )
    scores = parts.groupBy(id_col).agg(
        *[
            F.sum(f"__part_{lab}").cast("long").alias(f"score_{lab}")
            for lab in labels
        ]
    )
    full = df.select(id_col).join(scores, id_col, "left").select(
        id_col,
        *[
            F.coalesce(F.col(f"score_{lab}"), F.lit(0).cast("long")).alias(
                f"score_{lab}"
            )
            for lab in labels
        ],
    )
    # same first-in-sorted-order tie-break ladder as keyword_labels
    expr = None
    for i, lab in enumerate(labels):
        s = F.col(f"score_{lab}")
        cond = s > 0
        for other in labels[i + 1 :]:
            cond = cond & (s >= F.col(f"score_{other}"))
        expr = F.when(cond, lab) if expr is None else expr.when(cond, lab)
    return full.withColumn("pred_label", expr)


def quality_classifier(
    df: DataFrame,
    rules: dict[str, list[str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    salt: str = "clf",
) -> DataFrame:
    """The composed curation stage: weak-label the corpus with keyword
    rules, train the one-vs-rest scorer on the rows the rules decided,
    and score EVERY row — including the ones the keyword heuristics
    left unlabeled, which is the whole point of promoting heuristics to
    a classifier. Returns ``(id_col, score_<label>..., pred_label)``,
    one row per input row."""
    from nspc_etl_basic_spark.operators.labeling import keyword_labels

    # keyword_labels is a pure projection, so the training slice is its
    # OWN carry-through — one corpus scan instead of a scan + self-join
    # (ids are unique by the operator contract, so the inner join this
    # replaces selected exactly these rows; round 13, guide §2.4)
    train = keyword_labels(
        df, id_col, text_col, rules, carry=(text_col,)
    ).where(F.col("label").isNotNull()).select(id_col, text_col, "label")
    weights = train_token_classifier(
        train, sorted(rules), text_col, "label", n_buckets, salt
    )
    return classify_tokens(
        df, weights, sorted(rules), id_col, text_col, n_buckets, salt
    )


def classifier_agreement(
    df: DataFrame,
    rules: dict[str, list[str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    salt: str = "clf",
) -> DataFrame:
    """Per-class agreement of the trained scorer with its weak labels —
    the evaluation row a curation pipeline reads before trusting
    classifier scores to select data: one row per class,
    ``(label, n_true, n_pred, n_correct, precision_ppm, recall_ppm,
    f1_ppm)``, computed over the LABELED slice (docs where the keyword
    rules fired). High agreement means the hashed-token model
    recovered the rules' signal (and generalizes it to the unlabeled
    rest); a class with low recall is under-represented in the hash
    space — grow n_buckets or the rule list.

    This is train-set agreement, not held-out accuracy: the weak labels
    are the only supervision that exists at this stage, so the metric
    reads as "did the model capture the labeling function", the
    standard sanity gate before fasttext-style corpus scoring.

    All ratios are integer ppm (truncating div on non-negative BIGINTs
    — exact on both engines); ``f1_ppm`` uses the identity
    F1 = 2*correct / (pred + true), so no intermediate rounding
    compounds. Classes never predicted get null precision (0/0), and
    f1 is null only when pred + true = 0 (cannot happen for a class
    with training rows).

    Scale: the confusion matrix is ONE groupBy over (label, pred_label)
    — at most ``len(rules)^2`` rows out of a corpus-sized input, fully
    map-side combined; the per-class reshape is a literal explode over
    that tiny frame. Everything upstream is quality_classifier's
    broadcast-join scoring plan."""
    from nspc_etl_basic_spark.operators.labeling import keyword_labels

    labels = sorted(rules)
    # weak-label the corpus ONCE (round 13, guide §5): the labeled
    # slice feeds both the training pass and the agreement join, and
    # composing via quality_classifier re-ran the keyword projection
    # over the full corpus a second time. The materialized slice is the
    # rows the rules fired on — the training working set. Training and
    # scoring are exactly quality_classifier's (same shared recipe).
    lab = keyword_labels(
        df, id_col, text_col, rules, carry=(text_col,)
    ).where(F.col("label").isNotNull()).select(
        id_col, text_col, "label"
    ).localCheckpoint(eager=True)
    weights = train_token_classifier(
        lab, labels, text_col, "label", n_buckets, salt
    )
    pred = classify_tokens(
        df, weights, labels, id_col, text_col, n_buckets, salt
    ).select(id_col, "pred_label")
    conf = (
        lab.select(id_col, "label").join(pred, id_col)
        .groupBy("label", "pred_label")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return _per_class_metrics(conf, labels)


def _per_class_metrics(conf: DataFrame, labels: list[str]) -> DataFrame:
    """Per-class (n_true, n_pred, n_correct, precision/recall/f1 ppm)
    from a ``(label, pred_label, n)`` confusion frame — the shared tail
    of ``classifier_agreement`` and ``classifier_holdout_eval``."""
    # seed a zero row per class so every class emits a row even when NO
    # rule fired anywhere (an empty confusion frame would otherwise
    # yield an empty eval instead of all-zero metrics — the oracle's
    # labels-table left join keeps the per-class rows, so must we)
    zero_rows = conf.sparkSession.createDataFrame(
        [(lab, None, 0) for lab in labels],
        "label string, pred_label string, n long",
    )
    conf = conf.unionByName(zero_rows)
    per_class = (
        conf.select(
            "label", "pred_label", "n",
            F.explode(F.lit(labels)).alias("cls"),
        )
        .groupBy("cls")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("label") == F.col("cls"), F.col("n"))),
                F.lit(0),
            ).cast("long").alias("n_true"),
            F.coalesce(
                F.sum(F.when(F.col("pred_label") == F.col("cls"), F.col("n"))),
                F.lit(0),
            ).cast("long").alias("n_pred"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("label") == F.col("cls"))
                        & (F.col("pred_label") == F.col("cls")),
                        F.col("n"),
                    )
                ),
                F.lit(0),
            ).cast("long").alias("n_correct"),
        )
    )
    return per_class.select(
        F.col("cls").alias("label"),
        "n_true",
        "n_pred",
        "n_correct",
        F.when(
            F.col("n_pred") > 0,
            F.expr("(1000000 * n_correct) div n_pred"),
        ).cast("long").alias("precision_ppm"),
        F.when(
            F.col("n_true") > 0,
            F.expr("(1000000 * n_correct) div n_true"),
        ).cast("long").alias("recall_ppm"),
        F.when(
            (F.col("n_pred") + F.col("n_true")) > 0,
            F.expr("(2000000 * n_correct) div (n_pred + n_true)"),
        ).cast("long").alias("f1_ppm"),
    )


def _check_slices_disjoint(
    train_df: DataFrame, eval_df: DataFrame, id_col: str
) -> None:
    """Raise if any id appears in both slices — the overlap silently
    inflates every held-out metric, which is the exact failure mode
    the held-out evaluations exist to catch. One id-only semi-join
    count (an eager action; that is why callers gate it on a flag)."""
    n = train_df.select(id_col).join(
        eval_df.select(id_col), id_col, "left_semi"
    ).count()
    if n:
        raise ValueError(
            f"train/eval slices overlap on {n} {id_col} value(s); "
            "a held-out evaluation requires disjoint slices "
            "(use sampling.leakage_safe_split)"
        )


def classifier_holdout_eval(
    train_df: DataFrame,
    eval_df: DataFrame,
    rules: dict[str, list[str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    salt: str = "clf",
    check_disjoint: bool = False,
) -> DataFrame:
    """HELD-OUT classifier evaluation — the generalization upgrade over
    ``classifier_agreement``'s train-set metric: the scorer is trained
    ONLY on ``train_df``'s weak-labeled rows and evaluated ONLY on
    ``eval_df``'s, so the per-class precision/recall/F1 measure whether
    the hashed-token model generalizes the labeling function to
    documents it never saw, not merely whether it memorized it. Same
    output row shape and integer-ppm arithmetic as
    ``classifier_agreement``.

    The SPLIT is the caller's responsibility, and it must be
    leakage-safe: pass slices from ``sampling.leakage_safe_split``
    (membership hashed on the near-dup CLUSTER id) — a plain doc-id
    split leaks near-copies of eval documents into training and
    inflates every metric, which is the exact failure mode this
    evaluation exists to catch. ``train_df`` and ``eval_df`` must be
    disjoint — ``check_disjoint=True`` verifies that with one id-only
    semi-join count and raises on overlap (an extra eager action, so
    it is opt-in; leave it off when the slices provably come from one
    split call). Rows whose keyword rules fire in neither slice
    contribute nothing (train) / are excluded from metrics (eval),
    same as agreement.

    Scale: identical plan inventory to ``classifier_agreement`` — the
    weight grid is ``len(rules) * n_buckets`` rows (broadcast at any
    corpus size), scoring is one explode + broadcast join over the
    EVAL slice only, and the confusion matrix is one map-side-combined
    groupBy to ``len(rules)^2`` rows."""
    from nspc_etl_basic_spark.operators.labeling import keyword_labels

    if check_disjoint:
        _check_slices_disjoint(train_df, eval_df, id_col)
    labels = sorted(rules)
    # one training-slice scan: the weak labels carry the text through
    # the projection instead of re-scanning the slice for a self-join
    # (round 13, guide §2.4; ids unique by contract)
    train = keyword_labels(
        train_df, id_col, text_col, rules, carry=(text_col,)
    ).where(F.col("label").isNotNull()).select(id_col, text_col, "label")
    weights = train_token_classifier(
        train, labels, text_col, "label", n_buckets, salt
    )
    pred = classify_tokens(
        eval_df, weights, labels, id_col, text_col, n_buckets, salt
    ).select(id_col, "pred_label")
    eval_weak = keyword_labels(eval_df, id_col, text_col, rules).where(
        F.col("label").isNotNull()
    ).select(id_col, "label")
    conf = (
        eval_weak.join(pred, id_col)
        .groupBy("label", "pred_label")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return _per_class_metrics(conf, labels)


def train_weak_weights(
    train_df: DataFrame,
    rules: dict[str, list[str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    salt: str = "clf",
) -> DataFrame:
    """The weight grid trained on a slice's weak keyword labels — the
    ONE definition of "train on weak labels" shared by
    ``classifier_pr_curve``'s default path and any pipeline that also
    scores other slices with the same model (the curve-driven selection
    query): keyword-label the slice, drop unlabeled rows, train the
    Laplace-smoothed grid. Sharing the function is what makes a
    precomputed-weights curve provably identical to the default path —
    there is no second copy of the training recipe to drift."""
    from nspc_etl_basic_spark.operators.labeling import keyword_labels

    # one training-slice scan (carry precedent; ids unique by contract)
    train = keyword_labels(
        train_df, id_col, text_col, rules, carry=(text_col,)
    ).where(F.col("label").isNotNull()).select(id_col, text_col, "label")
    return train_token_classifier(
        train, sorted(rules), text_col, "label", n_buckets, salt,
    )


def classifier_pr_curve(
    train_df: DataFrame,
    eval_df: DataFrame,
    rules: dict[str, list[str]],
    positive_label: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    salt: str = "clf",
    check_disjoint: bool = False,
    weights: DataFrame | None = None,
) -> DataFrame:
    """Held-out precision/recall sweep over SCORE THRESHOLDS for one
    class — the curve that turns ``top_fraction``'s keep-fraction from
    an arbitrary knob into a measured operating point: before keeping
    "the top 25% by score_joins", read the row whose keep_frac_ppm is
    nearest 250000 and see what precision/recall that threshold buys
    on data the scorer never trained on.

    Trains on ``train_df``'s weak labels exactly like
    ``classifier_holdout_eval``, scores the eval slice, and sweeps the
    decision rule ``keep iff score_<positive_label> >= t`` over every
    DISTINCT observed score t on the weak-labeled eval rows (the exact
    PR curve — no binning error). One row per distinct score,
    descending::

        (threshold, n_keep, n_pos_kept, precision_ppm, recall_ppm,
         f1_ppm, keep_frac_ppm)

    where n_keep / n_pos_kept count weak-labeled eval docs at or above
    the threshold (n_pos_kept those whose weak label IS the positive
    class), precision = n_pos_kept/n_keep, recall vs the slice's total
    positives, F1 via 2*tp/(kept+pos) so nothing rounds twice, and
    keep_frac is n_keep over all weak-labeled eval docs — every ratio
    integer ppm (truncating div on BIGINTs, exact on both engines).
    Ground truth is the weak label (positive iff it equals
    ``positive_label``); unlabeled eval rows are excluded, same
    contract as the holdout eval.

    Scale: training and scoring are the holdout plan (broadcast weight
    grid; the corpus text never shuffles). The sweep itself is one
    groupBy(score) over the eval slice — map-side combined to the
    distinct-score count — and the cumulative sums run in ONE
    unpartitioned window over that AGGREGATED frame, which is at most
    eval-slice-sized (a fixed-size sample in production, never the
    corpus); the slice totals ride a 1-row scalar broadcast."""
    from nspc_etl_basic_spark.operators.labeling import keyword_labels

    if positive_label not in rules:
        raise ValueError(
            f"positive_label {positive_label!r} not in rules "
            f"{sorted(rules)}"
        )
    if check_disjoint:
        _check_slices_disjoint(train_df, eval_df, id_col)
    labels = sorted(rules)
    if weights is None:
        # trained here by default via the SHARED recipe; callers that
        # ALSO score other slices with the same model
        # (select_by_pr_threshold pipelines) pass the grid from the
        # same train_weak_weights call so the training pass runs once,
        # not per consumer — training is deterministic, so the result
        # is identical either way
        weights = train_weak_weights(
            train_df, rules, id_col, text_col, n_buckets, salt
        )
    scored = classify_tokens(
        eval_df, weights, labels, id_col, text_col, n_buckets, salt
    ).select(id_col, f"score_{positive_label}")
    eval_weak = keyword_labels(eval_df, id_col, text_col, rules).where(
        F.col("label").isNotNull()
    ).select(id_col, "label")
    per_score = (
        eval_weak.join(scored, id_col)
        .select(
            F.col(f"score_{positive_label}").alias("threshold"),
            (F.col("label") == F.lit(positive_label))
            .cast("long")
            .alias("__pos"),
        )
        .groupBy("threshold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum("__pos").cast("long").alias("__npos"),
        )
        # materialize the distinct-score aggregate ONCE: two consumers
        # (the cumulative window and the 1-row totals) would otherwise
        # each re-run the whole train+score chain (measured 16 s vs
        # ~5 s at sf0.1); the frame is curve-sized, blocks are
        # ContextCleaner-freed (the corpus_quality_select precedent)
        .localCheckpoint(eager=True)
    )
    from pyspark.sql.window import Window

    w = (
        Window.orderBy(F.col("threshold").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    totals = per_score.agg(
        F.sum("__n").cast("long").alias("__n_eval"),
        F.sum("__npos").cast("long").alias("__n_pos_total"),
    )
    return (
        per_score.withColumn("n_keep", F.sum("__n").over(w).cast("long"))
        .withColumn("n_pos_kept", F.sum("__npos").over(w).cast("long"))
        .crossJoin(F.broadcast(totals))
        .select(
            "threshold",
            "n_keep",
            "n_pos_kept",
            F.expr("(1000000 * n_pos_kept) div n_keep")
            .cast("long")
            .alias("precision_ppm"),
            F.when(
                F.col("__n_pos_total") > 0,
                F.expr("(1000000 * n_pos_kept) div __n_pos_total"),
            ).cast("long").alias("recall_ppm"),
            F.when(
                (F.col("n_keep") + F.col("__n_pos_total")) > 0,
                F.expr(
                    "(2000000 * n_pos_kept) div (n_keep + __n_pos_total)"
                ),
            ).cast("long").alias("f1_ppm"),
            F.expr("(1000000 * n_keep) div __n_eval")
            .cast("long")
            .alias("keep_frac_ppm"),
        )
    )
