"""Benchmark decontamination: drop training documents that share a
word n-gram with a held-out evaluation set.

Standard practice for training-corpus hygiene (GPT-3 appx. C / PaLM /
Llama papers all describe n-gram-overlap decontamination): a training
document is "contaminated" if any of its n consecutive-token grams
appears in any eval document. No reference counterpart — the reference
engine (src/file-to-sql-loader.py) has no corpus operators; this module
extends the engine for training-data pipelines.

Plan shape, sized for a 100 TB corpus vs a benchmarks-scale eval set:

1. Eval n-grams: explode + distinct — the eval set is tiny (benchmark
   suites are thousands of documents), so this stays broadcast-sized.
2. Corpus n-grams are built IN-ROW (``transform`` over a start-index
   ``sequence``, ``slice`` + ``concat_ws`` per window — a projection),
   then exploded: the exploded volume equals the corpus token count,
   the same volume tokenization already pays. No corpus self-shuffle.
3. Contamination test is a broadcast LEFT SEMI join of corpus n-grams
   against the eval set (corpus side never shuffles), followed by a
   distinct on doc id (map-side-combined; output is bounded by the
   contaminated-doc count, which is small by construction).
4. ``decontaminate`` removes those ids with a broadcast LEFT ANTI join.

At petabyte scale you would additionally hash each n-gram to 8 bytes
(``xxhash64``) before the join to shrink the broadcast and the probe —
kept as raw strings here so the result is exactly replayable in any
SQL engine for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nspc_etl_basic_spark.operators.text import word_tokens

__all__ = ["ngram_array", "contaminated_ids", "decontaminate"]


def ngram_array(text: Column, n: int) -> Column:
    """array<string> of space-joined n-grams over the word tokens of
    ``text``, built in-row (no explode, no join). Empty array for docs
    with fewer than n tokens — ``sequence`` would count DOWN for a
    negative span (sequence(1, 0) is [1, 0]), so the short-doc case must
    be guarded, not clamped."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = word_tokens(text)
    starts = F.sequence(F.lit(1), F.size(toks) - n + 1)
    return F.when(
        F.size(toks) >= n,
        F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
    ).otherwise(F.array().cast("array<string>"))


def contaminated_ids(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct ``id_col`` of corpus docs sharing at least one word
    n-gram with ``eval_df``. The eval n-gram set is broadcast — the
    corpus side is explode + semi-join + distinct, no corpus shuffle
    until the (small) contaminated-id distinct."""
    eval_grams = eval_df.select(
        F.explode(ngram_array(F.col(text_col), n)).alias("gram")
    ).distinct()
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(ngram_array(F.col(text_col), n)).alias("gram")
    )
    return (
        corpus_grams.join(F.broadcast(eval_grams), on="gram", how="left_semi")
        .select(id_col)
        .distinct()
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus minus contaminated docs (broadcast LEFT ANTI on the
    contaminated-id set — the corpus never shuffles)."""
    bad = contaminated_ids(corpus, eval_df, n, text_col, id_col)
    return corpus.join(F.broadcast(bad), on=id_col, how="left_anti")
