"""Byte-pair-encoding tokenizer: distributed training + Arrow-batched encode.

Training follows Sennrich et al. 2016 (the public BPE algorithm): start
from characters, repeatedly merge the most-frequent adjacent symbol pair.
The distributed formulation works on the WORD-FREQUENCY table, not the
corpus: one corpus-wide aggregate builds ``(word, freq)`` (distinct words
are orders of magnitude smaller than the token stream — the only
100 TB-sized stage), and every merge round then runs on that small table:

  - pair counting: in-row adjacent-pair projection + one map-side-combined
    groupBy over (pair) weighted by word freq;
  - argmax: ``orderBy(count desc, pair asc).limit(1)`` — a bounded
    1-row collect per round (deterministic lexicographic tiebreak);
  - merge application: an in-row ``F.aggregate`` fold that rewrites each
    word's symbol array left-to-right, non-overlapping — no Python.

Each round localCheckpoints the (small) word table: the fold otherwise
nests one expression tree per round and the plan would grow without
bound. Rounds are inherently sequential (each merge depends on the last)
— the O(vocab) driver loop IS the algorithm, with a 1-row collect per
iteration, never the data.

Encoding applies the learned merge ranks greedily (lowest rank first —
the standard BPE encode loop). That inner loop is data-dependent and not
expressible in fixed column algebra, so it runs as an Arrow-batched
``mapInPandas`` kernel — executor-parallel, zero shuffle, the documented
slow-path-when-you-must pattern.

Precision contract: nothing lossy crosses the Arrow boundary — inputs
are UTF-8 strings, outputs integer token ids / counts (exact); no
timestamps, no floats, no unit conversions inside the kernel.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import word_tokens

#: end-of-word marker (Sennrich's ``</w>``) so merges never cross words
EOW = "</w>"  # word_tokens symbols are [a-z0-9'] so the marker cannot collide


def _word_freq(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(F.explode(word_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_fold(a: str, b: str):
    """In-row left-to-right non-overlapping replacement of the adjacent
    symbol pair (a, b) with a||b, as a carry-fold over the symbol array."""
    merged = a + b

    def step(acc, s):
        carry = acc.getField("carry")
        out = acc.getField("out")
        hit = carry.isNotNull() & (carry == F.lit(a)) & (s == F.lit(b))
        return F.struct(
            F.when(hit, F.concat(out, F.array(F.lit(merged))))
            .when(carry.isNotNull(), F.concat(out, F.array(carry)))
            .otherwise(out)
            .alias("out"),
            F.when(hit, F.lit(None).cast("string")).otherwise(s).alias("carry"),
        )

    def finish(acc):
        carry = acc.getField("carry")
        out = acc.getField("out")
        return F.when(carry.isNotNull(), F.concat(out, F.array(carry))).otherwise(out)

    def apply(col):
        return F.aggregate(
            col,
            F.struct(
                F.array().cast("array<string>").alias("out"),
                F.lit(None).cast("string").alias("carry"),
            ),
            step,
            finish,
        )

    return apply


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 50,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merge rules from a corpus.

    Returns the ordered merge list ``[(left, right), ...]`` (rank =
    position). Stops early when no pair reaches ``min_pair_count``.
    Deterministic: pair argmax tiebreaks lexicographically.
    """
    words = _word_freq(df, text_col).select(
        F.concat(
            F.split(F.col("w"), "(?!$)"),  # chars; trailing "" excluded
            F.array(F.lit(EOW)),
        ).alias("syms"),
        "freq",
    ).localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts = (
            words.select(
                F.explode(
                    F.when(
                        F.size("syms") >= 2,
                        F.transform(
                            F.sequence(F.lit(0), F.size("syms") - 2),
                            lambda i: F.struct(
                                F.element_at("syms", i + 1).alias("a"),
                                F.element_at("syms", i + 2).alias("b"),
                            ),
                        ),
                    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
                ).alias("p"),
                "freq",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
        )
        top = (
            pair_counts.where(F.col("n") >= min_pair_count)
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        old = words
        words = words.select(
            _merge_fold(a, b)(F.col("syms")).alias("syms"), "freq"
        ).localCheckpoint(eager=True)
        old.unpersist()
    words.unpersist()
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference greedy BPE encode of one word (lowest-rank pair first)."""
    syms = list(word) + [EOW]
    while len(syms) >= 2:
        best = None
        best_rank = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = (syms[i], syms[i + 1]), r
        if best is None:
            break
        a, b = best
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize a text column with learned merges.

    Returns ``(id_col, n_words, n_bpe_tokens, bpe_preview)`` where
    ``bpe_preview`` is the first 8 BPE tokens space-joined (EOW markers
    stripped). Runs as one Arrow-batched ``mapInPandas`` kernel with the
    rank table captured in the closure — executor-parallel, no shuffle;
    per-word results are memoized per batch (Zipf reuse)."""
    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
    tokenize_re = r"[a-z0-9']+"
    out_schema = T.StructType(
        [
            T.StructField("_id", T.LongType()),
            T.StructField("n_words", T.LongType()),
            T.StructField("n_bpe_tokens", T.LongType()),
            T.StructField("bpe_preview", T.StringType()),
        ]
    )

    def kernel(batches: Iterator) -> Iterator:
        import re

        import pandas as pd

        pat = re.compile(tokenize_re)
        memo: dict[str, list[str]] = {}

        def enc(word: str) -> list[str]:
            got = memo.get(word)
            if got is None:
                got = memo[word] = _encode_word(word, ranks)
            return got

        for pdf in batches:
            ids, nw, nt, pv = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                # null text is an empty doc, not the literal word "none"
                words = pat.findall(text.lower()) if isinstance(text, str) else []
                toks: list[str] = []
                for w in words:
                    toks.extend(enc(w))
                ids.append(did)
                nw.append(len(words))
                nt.append(len(toks))
                pv.append(
                    " ".join(
                        s for s in (t.replace(EOW, "") for t in toks[:8]) if s
                    )
                )
            yield pd.DataFrame(
                {"_id": ids, "n_words": nw, "n_bpe_tokens": nt, "bpe_preview": pv}
            )

    return (
        df.select(id_col, text_col)
        .mapInPandas(kernel, out_schema)
        .withColumnRenamed("_id", id_col)
    )
