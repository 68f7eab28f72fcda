"""Weak-supervision keyword labeling — rule-based document labels for
distant supervision / corpus routing.

The simplest useful labeling-function family (Snorkel-style, public):
each label owns a keyword list; a document's score for a label is the
total substring-occurrence count of the label's keywords in the
lowercased text, and the assigned label is the best-scoring one with a
DETERMINISTIC tie-break (first label in sorted order wins ties — an
explicit CASE ladder, never an engine-arbitrary ``arg_max``). Zero
hits across all labels -> null label (explicitly unlabeled, same
stance as ``stratified_sample``'s missing-stratum drop).

Occurrence counting is the exact integer identity
``(len(t) - len(replace(t, kw, ''))) / len(kw)`` — expressible
bit-for-bit in any SQL engine, no regex dialect in play.

Scale: a pure projection (text never shuffles; one pass, all
whole-stage-codegen string ops). Keyword lists are plan literals —
suitable for tens of labels x tens of keywords; past that, broadcast a
keyword table and aggregate token joins instead.

Reference parity: no counterpart in /root/reference — extension
surface (LLM-pipeline family).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["keyword_labels"]


def _occurrences(text_col, kw: str):
    return (
        (F.length(text_col) - F.length(F.replace(text_col, F.lit(kw))))
        / F.lit(len(kw))
    ).cast("long")


def keyword_labels(
    df: DataFrame,
    id_col: str,
    text_col: str,
    rules: dict[str, list[str]],
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Label rows by keyword-occurrence votes: returns ``(id_col,
    score_<label>... , label)`` with one score column per rule (sorted
    label order) and the winning label (ties -> first sorted label;
    all-zero -> null).

    ``carry`` names extra input columns threaded through unchanged —
    the operator is a pure projection, so a consumer that needs e.g.
    the text of the labeled rows gets it from THIS scan instead of
    re-joining the label output back against the corpus (a second full
    corpus read plus a shuffle at 100 TB; the quality_filter carry
    precedent, guide §2.4). Carried names must not collide with the
    output columns and must not repeat."""
    if not rules or any(not kws for kws in rules.values()):
        raise ValueError("rules must map each label to a non-empty keyword list")
    # [a-z0-9 ] only: lower() is a no-op on quotes/punctuation, and a
    # keyword like "don't" would be interpolated into single-quoted
    # oracle SQL downstream — reject at the boundary instead of
    # escaping in every consumer.
    kw_re = re.compile(r"^[a-z0-9 ]+$")
    lab_re = re.compile(r"^[a-z0-9_]+$")
    for lab in rules:
        if not lab_re.fullmatch(lab):
            raise ValueError(
                f"labels must be non-empty [a-z0-9_] only (they become "
                f"column names and SQL literals): {lab!r}"
            )
    for kws in rules.values():
        for kw in kws:
            if not kw or not kw_re.fullmatch(kw):
                raise ValueError(
                    f"keywords must be non-empty [a-z0-9 ] only: {kw!r}"
                )

    labels = sorted(rules)
    reserved = {id_col, "label", "__t", *(f"score_{lab}" for lab in labels)}
    clash = [c for c in carry if c in reserved]
    if clash:
        raise ValueError(
            f"carry columns collide with label outputs: {clash}"
        )
    dupes = sorted({c for c in carry if list(carry).count(c) > 1})
    if dupes:
        raise ValueError(f"carry contains duplicate columns: {dupes}")
    lowered = df.select(
        F.col(id_col), F.lower(F.col(text_col)).alias("__t"),
        *[F.col(c) for c in carry],
    )
    scored = lowered.select(
        id_col,
        *[
            sum(
                (_occurrences(F.col("__t"), kw) for kw in rules[lab]),
                F.lit(0).cast("long"),
            ).alias(f"score_{lab}")
            for lab in labels
        ],
        *[F.col(c) for c in carry],
    )
    expr = None
    for i, lab in enumerate(labels):
        s = F.col(f"score_{lab}")
        cond = s > 0
        for other in labels[i + 1:]:
            cond = cond & (s >= F.col(f"score_{other}"))
        # earlier labels already lost if we got here, so only later
        # labels need comparing — which is exactly the first-in-sorted-
        # order tie-break
        expr = F.when(cond, lab) if expr is None else expr.when(cond, lab)
    return scored.withColumn("label", expr)
