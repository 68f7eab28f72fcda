"""pagerank: fixed-point semantics pinned against a pure-Python replay."""

from __future__ import annotations

import pytest

from nspc_etl_basic_spark.operators.graph import pagerank


def _replay(edges, n_iter, damping_pct=85, scale=1_000_000):
    """Independent integer replay of the documented semantics."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    frac = {(s, d): (w * scale) // out_w[s] for s, d, w in edges}
    base = ((100 - damping_pct) * scale) // 100
    rank = {v: scale for v in nodes}
    for _ in range(n_iter):
        dsum = sum(rank[v] for v in nodes if v not in out_w)
        inc = {v: 0 for v in nodes}
        for (s, d), f in frac.items():
            inc[d] += (rank[s] * f) // scale
        rank = {
            v: base + (damping_pct * (inc[v] + dsum // n)) // 100 for v in nodes
        }
    return rank


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string, weight long")
    return {r.node: r.rank for r in pagerank(df, **kw).collect()}


def test_pagerank_matches_integer_replay(spark):
    edges = [
        ("a", "b", 3),
        ("a", "c", 1),
        ("b", "a", 2),
        ("b", "c", 2),
        ("d", "a", 5),  # d has no in-edges; c is dangling
    ]
    got = _run(spark, edges, n_iter=6)
    assert got == _replay(edges, n_iter=6)
    # the dangling node keeps receiving mass, the source-only node decays
    assert got["a"] > got["d"]


def test_pagerank_uniform_ring_is_symmetric(spark):
    ring = [(str(i), str((i + 1) % 5), 7) for i in range(5)]
    got = _run(spark, ring, n_iter=8)
    assert len(set(got.values())) == 1  # perfect symmetry -> equal ranks
    assert got == _replay(ring, n_iter=8)


def test_pagerank_weight_splits_mass(spark):
    # one source, 9:1 weight split -> the heavy target outranks the light
    edges = [("s", "x", 9), ("s", "y", 1), ("x", "s", 1), ("y", "s", 1)]
    got = _run(spark, edges, n_iter=10)
    assert got["x"] > got["y"]
    assert got == _replay(edges, n_iter=10)


def test_pagerank_rejects_bad_params(spark):
    df = None
    with pytest.raises(ValueError):
        pagerank(df, damping_pct=101)
    with pytest.raises(ValueError):
        pagerank(df, n_iter=0)


def _tri(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    from nspc_etl_basic_spark.operators.graph import triangle_stats

    return triangle_stats(df).collect()[0]


def test_triangle_stats_k4(spark):
    # complete graph on 4 nodes: 6 edges, 12 wedges, 4 triangles, C=1
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    r = _tri(spark, k4)
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 6, 12, 4)
    assert r.clustering_ppm == 1_000_000


def test_triangle_stats_star_has_no_triangles(spark):
    star = [(0, i) for i in range(1, 6)]
    r = _tri(spark, star)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (6, 5, 0)
    assert r.n_wedges == 10 and r.clustering_ppm == 0


def test_triangle_stats_dedupes_reversed_and_self_pairs(spark):
    # one triangle given with duplicates, reversed edges, and a self-loop
    pairs = [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1), (7, 7)]
    r = _tri(spark, pairs)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (3, 3, 1)
    assert r.n_wedges == 3
    assert r.clustering_ppm == 1_000_000


def test_triangle_stats_matches_bruteforce_on_random_graph(spark):
    import itertools
    import random

    rng = random.Random(5)
    edges = sorted({tuple(sorted(rng.sample(range(12), 2))) for _ in range(30)})
    adj = set(edges)
    expect = sum(
        1
        for a, b, c in itertools.combinations(range(12), 3)
        if (a, b) in adj and (b, c) in adj and (a, c) in adj
    )
    r = _tri(spark, [(a, b) for a, b in edges])
    assert r.n_triangles == expect


def test_pagerank_identical_across_checkpoint_intervals(spark):
    # the periodic lineage cut is a job-count optimization only: ranks
    # must be bit-identical for every interval, including one that does
    # not divide n_iter (the last round always checkpoints)
    edges = [
        ("a", "b", 3),
        ("a", "c", 1),
        ("b", "a", 2),
        ("b", "c", 2),
        ("d", "a", 5),
    ]
    baseline = _run(spark, edges, n_iter=7, checkpoint_every=1)
    assert baseline == _replay(edges, n_iter=7)
    for every in (2, 3, 7, 50):
        assert _run(spark, edges, n_iter=7, checkpoint_every=every) == baseline


def test_pagerank_rejects_bad_checkpoint_every(spark):
    # validated with the other params BEFORE any eager job runs, so the
    # df is never touched: None must not raise anything but ValueError
    with pytest.raises(ValueError):
        pagerank(None, checkpoint_every=0)
