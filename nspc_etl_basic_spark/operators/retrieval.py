"""BM25 ranked retrieval over the document corpus — the lexical search
tier a training-data pipeline uses for dedup-by-retrieval, test-set
decontamination sweeps, and targeted corpus audits ("show me documents
like this one"), per Robertson & Zaragoza, "The Probabilistic Relevance
Framework: BM25 and Beyond" (2009); the idf form is Lucene's
non-negative variant.

    score(q, d) = sum over terms t in q of
        idf(t) * tf(t, d) * (k1 + 1)
                 / (tf(t, d) + k1 * (1 - b + b * dl(d) / avgdl))
    idf(t) = ln((N - df(t) + 0.5) / (df(t) + 0.5) + 1)

Determinism contract: each TERM's contribution is rounded to integer
MICROS (``round(x * 1e6)`` as BIGINT — the pq.py quantization-error
precedent) and the per-(query, doc) score is an INTEGER sum, so the
ranking is exactly order-independent and a DuckDB oracle replays every
score bit-for-bit. (A raw double sum would depend on engine summation
order; ln itself is IEEE-stable across both engines at the inputs the
micros rounding then absorbs — the ``tfidf_topk`` precedent.)

Scale: the same shuffle inventory as ``text.tfidf_topk`` — (doc,
token) for TF (map-side combined), token for the DF aggregate (also
map-side combined — NEVER a token-partitioned window, which would
funnel a Zipf-hot token's df ~ N rows through one unsplittable task),
token for the query-terms inverted-index probe (query side broadcast —
it is query-sized, never corpus-sized, and carries each term's df so
the probe adds no corpus-side df join), (query, doc) for the score
aggregate, query for the final top-k window. The only window over the
corpus-sized TF table is doc-length, whose partitions are
document-sized by construction. One corpus text scan; N and avgdl are
1-row aggregates broadcast into the plan (scalar-subquery shape).
Nothing is all-pairs: a query only meets the documents that share a
term with it.

Reference parity: no counterpart in /root/reference — extension surface
(LLM-pipeline family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nspc_etl_basic_spark.operators.text import word_token_count, word_tokens

__all__ = ["bm25_topk"]


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    max_query_terms: int | None = None,
    max_df_fraction: float | None = None,
) -> DataFrame:
    """Top-k documents per query by BM25: ``(query_id, doc_id,
    score_micro, rank)`` with ``score_micro`` the integer-micros BM25
    score (see module contract) and rank ties broken by ascending
    doc id. Queries with no term overlap anywhere yield no rows —
    retrieval semantics, not an error.

    Side effect: constructing the result DataFrame EAGERLY runs the
    corpus tokenize/prune/TF aggregation (an internal
    ``localCheckpoint(eager=True)`` materializes the query-term TF
    table for its two consumers), even if the result is only
    ``explain()``ed and never executed. The checkpointed blocks are
    freed by the JVM ContextCleaner once the result frame is garbage
    collected; a long-lived multi-query session that wants immediate
    release should drop its reference to the returned frame when done.

    ``max_query_terms`` keeps only each query's N RAREST terms (lowest
    corpus df; ties by token) — the standard query-pruning lever for
    DOCUMENT-AS-QUERY workloads (dedup-by-retrieval, decontamination
    sweeps), where a long query's probe volume is sum over its terms
    of df(term) and the rare terms carry the high-idf mass that
    decides rankings. Scores CHANGE when pruning fires (dropped terms
    contribute nothing), so this is an explicit retrieval variant, not
    an optimization of the exact operator; the default None stays
    exact. Pruning reads df off the single pruned, checkpointed TF
    table (no extra corpus pass), joined query-side via a broadcast of
    the query terms, never a corpus shuffle. Know the regime before
    reaching for it (measured,
    SCALE.md): the lever cuts VOCABULARY-RICH long queries; against a
    degenerate vocabulary where every query term is corpus-common
    (the sf1 stand-in: ~25 distinct terms/query, mean df 36k over 50k
    docs -> a 452M-row probe and a 25M-key aggregate), no query-side
    RANK-based pruning can shrink the probe — the per-(query, doc)
    aggregate IS the exact-scoring cost.

    ``max_df_fraction`` is the lever for exactly that degenerate
    regime: SKIP every query term whose corpus document frequency
    exceeds ``fraction * N`` — the Elasticsearch cutoff-frequency /
    dynamic-stopword cap. Unlike ``max_query_terms`` (a per-query
    RANK, which always keeps its N terms no matter how common they
    are), the df-cap is an absolute bound on probe volume: a term
    with df > fraction*N would alone touch that fraction of the
    corpus, and its idf — ln((N-df+0.5)/(df+0.5)+1) — is already near
    the floor, so dropping it removes the bulk of the probe while
    moving scores least. Both levers read df straight off the single
    pruned, checkpointed TF table — no extra corpus pass. The
    predicate is exact integer arithmetic
    (``df * 1e6 <= ppm * N`` with ``ppm = max(1, round(fraction *
    1e6))``, all BIGINT — the clamp keeps a sub-5e-7 fraction from
    flooring to ppm=0 and silently dropping every term), so an SQL
    oracle replays the kept-term set bit-for-bit. Composes with
    ``max_query_terms``: the cap filters first, the rarest-N rank
    runs on the survivors. Like the rank lever this is a retrieval
    VARIANT (dropped terms contribute nothing to scores); a query
    whose every term is capped yields no rows — retrieval semantics,
    not an error."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if max_query_terms is not None and max_query_terms < 1:
        raise ValueError(
            f"max_query_terms must be >= 1, got {max_query_terms}"
        )
    if max_df_fraction is not None and not 0 < max_df_fraction <= 1:
        raise ValueError(
            f"max_df_fraction must be in (0, 1], got {max_df_fraction}"
        )
    # materialize the QUERY frame once (round 13, guide §5): it has two
    # consumers below (the distinct-token prune set and the per-query
    # term table), and in the document-as-query workloads the frame is
    # derived FROM the corpus (a filter over the documents scan), so
    # each consumer re-ran a full corpus read to rebuild a query-sized
    # result. The checkpoint is query-set-sized by the operator
    # contract — never corpus-sized.
    queries = queries.select(
        query_id_col, query_text_col
    ).localCheckpoint(eager=True)
    # doc length is a PROJECTION, not a window: dl(d) == size of the
    # token array (== the sum-of-tf the previous doc-partitioned window
    # computed — identical integer), so it rides the tokenize scan for
    # free and the TF table never pays the window's second corpus-sized
    # exchange + sort by doc id. Document frequency is NOT a window
    # either — a Zipf-hot token ("the") would funnel its df ~ N row set
    # through one window task, and AQE cannot split a window the way it
    # splits a skewed join. Instead df is a map-side-combined groupBy
    # aggregate attached to the BROADCAST query-term side below, so it
    # never costs a corpus-sized shuffle or join at all.
    toks = docs.select(
        F.col(id_col), word_tokens(F.col(text_col)).alias("__toks")
    ).select(
        F.col(id_col),
        F.size("__toks").cast("long").alias("dl"),
        F.explode("__toks").alias("token"),
    )
    # EARLY PRUNE (guide §3.2 — reduce the big side before any
    # aggregate/shuffle): only tokens that appear in some query can
    # reach the probe join or change a reported df, so the exploded
    # corpus stream is semi-joined against the broadcast distinct
    # query-token set BEFORE the (doc, token) aggregate. df computed
    # over the pruned postings is IDENTICAL for every surviving term
    # (the prune is on token, the df count is per token), and dl was
    # already computed from the full token array in the projection
    # above, so every output value is unchanged. The pruned TF table
    # is materialized ONCE (localCheckpoint): it has two consumers —
    # the df aggregate and the probe join — and without the cut each
    # re-ran the full corpus tokenize+explode (measured ~1.5x the
    # query wall at sf0.1); at corpus scale re-tokenizing 100 TB twice
    # costs far more than spilling the query-term postings to local
    # disk (guide §5: persist when reused and recompute dominates).
    qtok = queries.select(
        F.explode(word_tokens(F.col(query_text_col))).alias("token")
    ).distinct()
    tf = (
        toks.join(F.broadcast(qtok), "token")
        .groupBy(id_col, "token")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.max("dl").alias("dl"),
        )
        .localCheckpoint(eager=True)
    )
    with_stats = tf
    # N and total-token globals in ONE light pass over the doc scan:
    # regexp_count over the word_tokens pattern counts exactly the
    # matches regexp_extract_all would materialize, so the per-doc token
    # count needs no array build and no explode — the previous
    # toks.agg(count) paid a full tokenize+explode pass for the same
    # integer. NULL text: regexp_count is NULL and sum() skips it,
    # matching explode's zero rows.
    globals_row = docs.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.coalesce(
            F.sum(word_token_count(F.col(text_col))),
            F.lit(0),
        )
        .cast("long")
        .alias("__total_tokens"),
    )
    q_terms = queries.select(
        F.col(query_id_col),
        F.explode(word_tokens(F.col(query_text_col))).alias("token"),
    ).distinct()
    dfs = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("__df")
    )
    # broadcast the QUERY side into the vocab-sized df table (the
    # vocabulary can be huge at corpus scale; the query terms never
    # are) — from here every frame is query-sized and carries its
    # term's df, so the probe join below needs no df on the TF side
    q_terms = dfs.join(F.broadcast(q_terms), "token")
    if max_query_terms is not None or max_df_fraction is not None:
        if max_df_fraction is not None:
            # absolute cutoff first: df * 1e6 <= ppm * N, exact BIGINT;
            # clamp to 1 ppm so a fraction below 5e-7 (which validation
            # accepts) cannot silently floor to ppm=0 and drop every term
            ppm = max(1, round(max_df_fraction * 1_000_000))
            q_terms = q_terms.crossJoin(
                F.broadcast(
                    docs.agg(F.count(F.lit(1)).cast("long").alias("__capn"))
                )
            ).filter(
                F.col("__df") * F.lit(1_000_000).cast("long")
                <= F.lit(int(ppm)).cast("long") * F.col("__capn")
            ).drop("__capn")
        if max_query_terms is not None:
            # then the per-query rarest-N rank over the survivors
            wq = Window.partitionBy(query_id_col).orderBy(
                F.col("__df").asc(), F.col("token").asc()
            )
            q_terms = q_terms.withColumn(
                "__qrk", F.row_number().over(wq)
            ).filter(F.col("__qrk") <= max_query_terms)
    q_terms = q_terms.select(
        query_id_col, "token", F.col("__df").alias("df")
    )
    # inverted-index probe: the (query, token) side is query-sized and
    # already carries df, so the corpus-sized TF side joins on token only
    hits = with_stats.join(F.broadcast(q_terms), "token")
    idf = F.log(
        (
            (F.col("__n") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        )
        + F.lit(1.0)
    )
    # avgdl = total corpus tokens / N, exact in double (both BIGINT)
    avgdl = F.col("__total_tokens") / F.col("__n")
    saturation = (
        F.col("tf")
        * F.lit(float(k1) + 1.0)
        / (
            F.col("tf")
            + F.lit(float(k1))
            * (F.lit(1.0 - float(b)) + F.lit(float(b)) * F.col("dl") / avgdl)
        )
    )
    contrib = F.round(idf * saturation * F.lit(1e6)).cast("long")
    scored = (
        hits.crossJoin(F.broadcast(globals_row))
        .select(query_id_col, id_col, contrib.alias("__c"))
        .groupBy(query_id_col, id_col)
        .agg(F.sum("__c").cast("long").alias("score_micro"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score_micro").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "score_micro", F.col("rank").cast("int").alias("rank"))
    )


RRF_SCALE = 1_000_000_000


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 5,
    rrf_k: int = 60,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of N
    ranked lists — the standard way to combine a lexical (BM25) and a
    dense (ANN) retrieval tier without score calibration, since RRF
    consumes only RANKS: ``rrf(q, d) = sum over lists of
    1 / (rrf_k + rank(q, d))``. Returns ``(query_id, doc_id,
    rrf_score, n_lists, rank)`` — top-k per query, ties by ascending
    doc id; ``n_lists`` is how many input lists ranked the doc (the
    both-tiers-agree signal a dedup-by-retrieval audit reads first).

    Determinism contract: each reciprocal is the INTEGER
    ``RRF_SCALE div (rrf_k + rank)`` and the fused score is a BIGINT
    sum — exactly order-independent and bit-replayable in any SQL
    engine (the bm25_topk integer-micros precedent). With rrf_k=60 and
    RRF_SCALE=1e9 adjacent-rank reciprocals stay distinct while
    ``1e9/(60+r)^2 >= 1``, i.e. up to rank ~31.6k; beyond that depth
    adjacent ranks can floor to the same integer, and the resulting
    ties resolve deterministically via the ascending-doc-id tiebreak
    (top-k shortlists in practice sit 3 orders of magnitude below the
    bound).

    Scale: the inputs are already top-k-per-query shortlists (query-
    sized, never corpus-sized), so the whole operator is one union +
    one (query, doc)-keyed aggregate + one per-query window — the
    corpus is never touched. Input lists must share the three column
    names (rename before fusing); a doc absent from a list simply
    contributes nothing for it."""
    if not rankings:
        raise ValueError("rankings must be a non-empty list")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if rrf_k < 0:
        raise ValueError(f"rrf_k must be >= 0, got {rrf_k}")
    contrib = F.expr(
        f"CAST({RRF_SCALE} AS BIGINT) div "
        f"(CAST({rrf_k} AS BIGINT) + CAST({rank_col} AS BIGINT))"
    )
    legs = [
        r.select(
            F.col(query_id_col),
            F.col(id_col),
            contrib.alias("__c"),
        )
        for r in rankings
    ]
    allc = legs[0]
    for leg in legs[1:]:
        allc = allc.unionByName(leg)
    fused = allc.groupBy(query_id_col, id_col).agg(
        F.sum("__c").cast("long").alias("rrf_score"),
        F.count(F.lit(1)).cast("long").alias("n_lists"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col, id_col, "rrf_score", "n_lists",
            F.col("rank").cast("int").alias("rank"),
        )
    )
