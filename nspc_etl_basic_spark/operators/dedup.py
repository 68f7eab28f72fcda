"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

These extend the reference's surface (its only dedup is last-wins on a
primary key, reference loader.py:1227-1241 — see operators/merge.py) with
the near-duplicate detection a large-scale training-data pipeline needs.

Design notes (100 TB stance):
  - exact dedup is a hash groupBy on the content hash (md5), NOT the full
    text — group keys stay 32 bytes, the shuffle moves hashes not bodies;
  - MinHash is computed from character shingles: explode -> per-shingle
    md5 -> n hash functions derived as disjoint 4-hex-char slices of the
    md5 (one md5 per distinct shingle, not one per hash function — 8x
    cheaper) -> min per slice = signature -> band -> bucket groupBy. Only
    bucket collisions ever meet in a shuffle — the classic LSH contract,
    so the pairwise stage is bounded by bucket volume, never |docs|^2;
  - SimHash packs a 48-bit token-hash majority vote via bit arithmetic in
    pure column expressions (one explode + one groupBy, map-side combined);
  - n-gram Jaccard runs ONLY on candidate pairs (same LSH band bucket).

Everything is built-in-function column algebra — JVM-side, codegen-friendly,
and exact-parity with the DuckDB oracles in ``__spark_entry__.py`` (md5 /
hex-slice semantics shared: Spark ``conv(hex,16,10)`` == DuckDB
``CAST('0x'||hex AS BIGINT)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SHINGLE_K = 8
N_MINHASHES = 8  # md5 = 32 hex chars -> 8 disjoint 4-char slices


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups: md5-hash groupBy keeping the min id as the
    canonical representative. Returns (fp_md5, canonical_id, dup_count).

    Scale: the shuffle key is the 32-byte hash; document bodies never move.
    """
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("fp_md5"))
        .groupBy("fp_md5")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def char_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_SHINGLE_K,
    distinct: bool = True,
) -> DataFrame:
    """k-char shingles per document: (id, shingle).

    One narrow explode via sequence+substring — no Python in the row path.
    A document shorter than ``k`` contributes its whole text as the single
    shingle (sequence is clamped to start position 1).

    ``distinct=True`` (set semantics, one full shuffle) is required for
    Jaccard counting; MinHash passes ``distinct=False`` because min over a
    multiset equals min over its set — saving the shuffle entirely (the
    signature groupBy is map-side combined over the raw explode).
    """
    t = F.col(text_col)
    sh = df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(1))),
                lambda i: F.substring(t, i, k),
            )
        ).alias("shingle"),
    )
    return sh.distinct() if distinct else sh


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_SHINGLE_K,
    n_hashes: int = N_MINHASHES,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash signature per document: (id, mh_0..mh_{n-1}).

    hash_j(shingle) = md5(shingle)[4j+1 : 4j+4] (hex slice); the minimum
    over a document's shingles under ANY total order is a valid MinHash —
    lexicographic hex order serves, no numeric conversion needed.

    Pass a (cached) ``shingles`` DataFrame to share the explode with other
    stages — the shingle scan is the dominant cost of the whole pipeline.
    """
    sh = (
        shingles
        if shingles is not None
        else char_shingles(df, text_col, id_col, k, distinct=False)
    )
    hashed = sh.select(F.col(id_col), F.md5("shingle").alias("h"))
    aggs = [
        F.min(F.substring("h", 4 * j + 1, 4)).alias(f"mh_{j}") for j in range(n_hashes)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = N_MINHASHES,
    band_size: int = 2,
) -> DataFrame:
    """Band the signature (band = concat of ``band_size`` consecutive
    minhashes) and self-join per (band_id, band_key) bucket. Returns
    candidate pairs (id_a < id_b, n_shared_bands).

    Scale: the self-join shuffles on (band_id, band_key) so only documents
    sharing a bucket are compared; with b bands of r rows, a pair with
    Jaccard s collides with prob 1-(1-s^r)^b — the standard LSH S-curve.
    """
    n_bands = n_hashes // band_size
    bands = signatures.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat_ws(
                            "",
                            *[F.col(f"mh_{b * band_size + j}") for j in range(band_size)],
                        ).alias("band_key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_id", "band.band_key")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_key") == F.col("b.band_key"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 48
) -> DataFrame:
    """SimHash over word tokens: token -> 48-bit hash (md5 hex slice ->
    long); per bit, majority vote (+1/-1 sum >= 0 -> bit set) across the
    document's tokens; pack votes back into one long.

    Pure column algebra: one explode, one groupBy with ``bits`` conditional
    sums (map-side combined), one packing projection. Hamming distance on
    the packed long is then ``bit_count(a ^ b)``.
    """
    from nspc_etl_basic_spark.operators.text import word_tokens

    toks = df.select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("tok")
    )
    h = F.conv(F.substring(F.md5("tok"), 1, 12), 16, 10).cast("long")  # 48 bits
    toks = toks.select(F.col(id_col), h.alias("h"))
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    votes = toks.groupBy(id_col).agg(*bit_aggs)
    packed = None
    for i in range(bits):
        term = F.when(F.col(f"v{i}") >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        packed = term if packed is None else (packed + term)
    return votes.select(F.col(id_col), packed.alias("simhash"))


def jaccard_on_candidates(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_SHINGLE_K,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """n-gram (char-shingle) Jaccard similarity for candidate pairs only:
    (id_a, id_b, jaccard).

    |A ∩ B| via a shingle equi-join restricted to candidate pairs;
    |A ∪ B| = |A| + |B| - |A ∩ B|. The candidate restriction keeps this
    linear in bucket volume at scale — never all-pairs.
    """
    sh = shingles if shingles is not None else char_shingles(df, text_col, id_col, k)

    # Prune the shingle set to documents that appear in ANY candidate pair
    # BEFORE the equi-join: candidates are bucket collisions — a tiny id set
    # relative to the corpus — so this broadcast semi-join turns a
    # corpus-sized shuffle into a candidates-sized one. At 100 TB this is
    # the difference between joining every document's shingles and joining
    # only the colliding few percent.
    cand_ids = (
        candidates.select(F.col("id_a").alias(id_col))
        .union(candidates.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sh = sh.join(F.broadcast(cand_ids), id_col, "left_semi")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))

    sh_a = sh.select(F.col(id_col).alias("id_a"), F.col("shingle"))
    sh_b = sh.select(F.col(id_col).alias("id_b"), F.col("shingle"))
    inter = (
        candidates.select("id_a", "id_b")
        .join(sh_a, "id_a")
        .join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        candidates.select("id_a", "id_b")
        .join(inter, ["id_a", "id_b"], "left")
        .join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.coalesce(F.col("n_inter"), F.lit(0)).cast("double")
                / (F.col("n_a") + F.col("n_b") - F.coalesce(F.col("n_inter"), F.lit(0))),
                6,
            ).alias("jaccard"),
        )
    )


def near_dedup_minhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_SHINGLE_K,
    n_hashes: int = N_MINHASHES,
    band_size: int = 2,
    threshold: float = 0.8,
) -> DataFrame:
    """End-to-end near-dup pipeline: MinHash -> LSH candidates -> exact
    Jaccard filter >= threshold. Returns confirmed near-duplicate pairs.

    The shingle explode (the dominant scan) is computed ONCE and cached;
    the candidate set is materialized eagerly (it is referenced twice by
    the verification stage — broadcast id-pruning + the pair join)."""
    sh = char_shingles(df, text_col, id_col, k).cache()
    sigs = minhash_signatures(df, text_col, id_col, k, n_hashes, shingles=sh)
    cand = lsh_candidate_pairs(sigs, id_col, n_hashes, band_size).cache()
    cand.count()
    jac = jaccard_on_candidates(df, cand, text_col, id_col, k, shingles=sh)
    return jac.filter(F.col("jaccard") >= threshold)
