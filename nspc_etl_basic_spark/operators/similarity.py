"""Similarity search over embedding columns (array<float>).

Two tiers, both pure DataFrame algebra (no Python UDFs in the hot path):

  - ``cosine_topk``: brute-force exact cosine top-k — the correctness
    baseline. O(|queries| x |corpus|) via a crossJoin; at scale you bound
    |queries| per job (it's the re-ranking stage, not the recall stage).
    The dot product is ``aggregate(zip_with(a, b, *), sum)`` in double —
    JVM higher-order functions, codegen'd, no shuffle until the top-k
    window (which shuffles only (query_id, dist) pairs, not vectors).

  - ``rp_lsh_topk``: random-hyperplane LSH (SimHash-for-vectors) as the
    scale path. Each vector gets a ``n_planes``-bit signature; candidates
    are corpus vectors sharing a signature bucket with the query; exact
    cosine re-ranks candidates only. The hyperplanes are DETERMINISTIC
    (component sign derived from md5(plane || '_' || dim)) so the same
    buckets are reproducible across engines — the DuckDB oracle in
    ``__spark_entry__.py`` derives the identical planes.

Scale notes: at 100 TB the corpus side is scanned once to signatures
(narrow projection), bucketed by signature (one shuffle), and only bucket
collisions are re-ranked. Brute force remains as the per-bucket kernel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Sum of elementwise products, computed in double. Left-to-right fold
    — deterministic summation order (matches DuckDB list_dot_product)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for every query vector.

    ``queries`` must carry (query_id_col, vec_col). Self-matches (same id)
    are excluded when query ids live in the corpus id space. Ties broken by
    corpus id ascending — deterministic, SQL-expressible.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("__cvec"))
    sim = (
        q.crossJoin(c)
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(
            query_id_col,
            id_col,
            F.round(cosine(F.col("__qvec"), F.col("__cvec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        sim.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(query_id_col, id_col, "cos_sim", F.col("__rk").alias("rank"))
    )


def _plane_component(plane: int, dim: Column) -> Column:
    """Deterministic ±1 hyperplane component: parity of the first hex
    nibble of md5('<plane>_<dim>'). Reproducible in any engine with md5."""
    h = F.conv(F.substring(F.md5(F.concat_ws("_", F.lit(str(plane)), dim.cast("string"))), 1, 1), 16, 10)
    return F.when(h.cast("int").bitwiseAND(F.lit(1)) == 1, F.lit(1.0)).otherwise(F.lit(-1.0))


def rp_signature(vec: Column, n_planes: int = 8) -> Column:
    """Random-hyperplane signature: bit p = (vec . plane_p) >= 0, packed
    into a long. Planes are the deterministic md5-derived ±1 vectors."""
    def plane_fn(p: int):
        # unary closure — a lambda with a default arg would be (mis)read by
        # pyspark as a binary (element, index) lambda
        return lambda i: _plane_component(p, i)

    sig = None
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.transform(F.sequence(F.lit(0), F.size(vec) - 1), plane_fn(p)),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(proj >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else (sig + bit)
    return sig


def rp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: bucket by random-hyperplane signature, exact
    cosine re-rank within the query's bucket only.

    Recall tuning is n_planes (fewer planes -> bigger buckets -> higher
    recall, more work). At scale, the corpus signature projection is a
    one-pass scan and the join shuffles on the 8-byte signature.
    """
    c_sig = corpus.select(
        F.col(id_col), F.col(vec_col).alias("__cvec"),
        rp_signature(F.col(vec_col), n_planes).alias("__sig"),
    )
    q_sig = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec"),
        rp_signature(F.col(vec_col), n_planes).alias("__sig"),
    )
    sim = (
        q_sig.join(c_sig, "__sig")
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(
            query_id_col,
            id_col,
            F.round(cosine(F.col("__qvec"), F.col("__cvec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        sim.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(query_id_col, id_col, "cos_sim", F.col("__rk").alias("rank"))
    )
