"""Text-analysis operators for large-scale training-data pipelines.

All hot-path logic is built-in ``pyspark.sql.functions`` (JVM, codegen) —
no Python UDFs. Each function returns a DataFrame transformation usable on
any table with a text column; `__spark_entry__.py` wires them to the
driver's ``documents`` table with DuckDB oracles.

Scale: every op here is a narrow projection (no shuffle) except the
aggregating ones, which do one map-side-combined groupBy. They stream
through 100 TB as pure scan work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small, deterministic per-language stopword marker sets for the n-gram/
# stopword language-ID heuristic. Public-knowledge function words.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ein"],
    "zh": ["de", "shi", "le", "zai", "you"],
}

EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "this", "be",
]


def token_count(text: Column) -> Column:
    """Whitespace token count — ``regexp_count(text, '\\S+')`` so leading/
    trailing/multiple whitespace never miscounts (unlike split-based)."""
    return F.regexp_count(text, F.lit(r"\S+"))


def word_tokens(text: Column) -> Column:
    """array<string> of lowercase word tokens (BPE-ish regex: word chars)."""
    return F.regexp_extract_all(F.lower(text), F.lit(r"[a-z0-9']+"), 0)


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality scoring: length, token count, punctuation
    ratio, stopword ratio, mean token length. One narrow projection."""
    t = F.col(text_col)
    n_tokens = token_count(t)
    n_chars = F.length(t)
    n_punct = F.regexp_count(t, F.lit(r"[\.,;:!\?]"))
    words = word_tokens(t)
    n_stop = F.size(
        F.filter(words, lambda w: w.isin(*EN_STOPWORDS))
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(
            n_stop.cast("double") / F.greatest(F.size(words), F.lit(1)), 6
        ).alias("stopword_ratio"),
        F.round(
            F.aggregate(
                F.transform(words, F.length), F.lit(0), lambda acc, v: acc + v
            ).cast("double")
            / F.greatest(F.size(words), F.lit(1)),
            4,
        ).alias("mean_token_len"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language ID: count hits from each language's marker set
    over the word tokens; argmax with deterministic tiebreak (first in
    alphabetical language-code order wins a tie — matches the SQL-oracle
    CASE chain exactly). Pure column algebra — scan-only at scale."""
    words = word_tokens(F.col(text_col))

    def marker_score(markers: list[str]) -> Column:
        # closure (not a lambda default) — pyspark lambdas must be unary
        return F.size(F.filter(words, lambda w: w.isin(*markers)))

    scores = [
        marker_score(markers).alias(f"score_{lang}")
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    scored = df.select(F.col(id_col), *scores)
    langs = sorted(LANG_MARKERS)
    best_score = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = None
    for lang in langs:
        cond = F.when(F.col(f"score_{lang}") == best_score, F.lit(lang))
        pred = cond if pred is None else pred.when(
            F.col(f"score_{lang}") == best_score, F.lit(lang)
        )
    return scored.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        best_score.alias("marker_hits"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 content hash + a 60-bit numeric rolling
    fingerprint derived from the md5 (hex -> long), usable as a join/
    partition key. Exact-parity with SQL oracles (DuckDB hex cast)."""
    t = F.col(text_col)
    md5 = F.md5(t)
    return df.select(
        F.col(id_col),
        md5.alias("fp_md5"),
        F.conv(F.substring(md5, 1, 15), 16, 10).cast("long").alias("fp60"),
    )
