"""Iterative graph analytics over plain edge tables.

PageRank here is the repo's generic "iterative relational algorithm"
shape (the same one ``dedup.neardup_components`` and the trained-codebook
loops use): per round ONE equi-join + ONE map-side-combined groupBy over
the edge table, ``localCheckpoint`` lineage cuts so round N's plan never
embeds rounds 1..N-1, and **fixed-point integer arithmetic** so the
result is bit-identical regardless of partitioning — which is what lets
``oracle_sql()`` replay the whole iteration in DuckDB (floating-point
summation order would make every run its own answer).

Reference parity: the reference engine has no graph operators — this is
part of the training-data-pipeline extension surface (link-graph
quality weighting for web corpora).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    n_iter: int = 10,
    damping_pct: int = 85,
    scale: int = 1_000_000,
) -> DataFrame:
    """Weighted PageRank over a directed edge table; returns
    ``(node, rank)`` with ``rank`` in fixed-point units of
    ``1/scale`` (initial rank = ``scale`` = 1.0 per node).

    Determinism contract — every quantity is integer:
      * edge fractions ``frac = (w * scale) div W_out`` (exact decimal
        multiply, integral ``div``),
      * per-edge contribution ``(rank * frac) div scale``,
      * dangling mass redistributed uniformly as ``dsum div N``,
      * damping applied as ``(damping_pct * x) div 100``.
    Integer sums are order-independent, so the same input graph yields
    the same BIGINT ranks on any partitioning/engine; mass lost to the
    floors is bounded by one unit per edge per round and is part of the
    pinned semantics, not noise. Runs a FIXED ``n_iter`` rounds (no
    convergence test) so the oracle can unroll the exact computation.

    Scale: the iteration state is node-sized, orders below the edge
    table. Per round: one ``src`` equi-join edge×rank, one groupBy(dst)
    with map-side partial sums, one node-table left join, and a 1-row
    broadcast for the dangling sum (never a driver collect). The edge
    fraction table is computed once and cached — weights never move
    again. Rank magnitudes stay ≤ N*scale, so the BIGINT contribution
    product is safe for graphs up to ~9e18/scale total mass; the hot
    multiplications go through DECIMAL(38,0) anyway, so overflow is
    structurally impossible. High-degree dst skew inherits the same
    remedy as ``neardup_components`` (broadcast the hot nodes' rank
    rows); not wired here because rank tables are uniformly tiny
    relative to edges.
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be in [0,100], got {damping_pct}")
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")

    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(weight).cast("long").alias("w"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n_nodes = nodes.count()  # bounded metadata scalar (node count)
    out_w = e.groupBy("src").agg(F.sum("w").alias("__ow"))
    frac = (
        e.join(out_w, "src")
        .select(
            "src",
            "dst",
            F.expr(f"(CAST(w AS DECIMAL(38,0)) * {int(scale)}) div __ow").alias(
                "frac"
            ),
        )
        .cache()
    )
    frac.count()  # materialize once; the loop reads it n_iter times
    src_nodes = out_w.select(F.col("src").alias("node"))

    base = ((100 - damping_pct) * scale) // 100
    ranks = nodes.select("node", F.lit(int(scale)).cast("long").alias("rank"))
    for _ in range(n_iter):
        dang = ranks.join(src_nodes, "node", "left_anti").agg(
            F.coalesce(F.sum("rank"), F.lit(0)).cast("long").alias("__dsum")
        )
        inc = (
            frac.join(ranks, frac["src"] == ranks["node"])
            .groupBy("dst")
            .agg(
                F.sum(
                    F.expr(f"(CAST(rank AS DECIMAL(38,0)) * frac) div {int(scale)}")
                ).alias("__inc")
            )
            .withColumnRenamed("dst", "node")
        )
        ranks = (
            nodes.join(inc, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"(CAST({int(damping_pct)} AS DECIMAL(38,0))"
                        f" * (coalesce(__inc, CAST(0 AS BIGINT))"
                        f"    + (__dsum div {int(n_nodes)}))) div 100"
                    )
                )
                .cast("long")
                .alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
