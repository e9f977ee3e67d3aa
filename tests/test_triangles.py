"""Cross-implementation triangle-count agreement (the reference's de-facto
oracle, SURVEY.md §5): all four Spark strategies must agree with each other,
with the numpy trace(A^3)/6 oracle, and with known exact counts."""

from __future__ import annotations

import pytest

from accelerating_tc_spark.operators import prep, triangles
from accelerating_tc_spark.sources import synthetic

STRATEGIES = ["join", "array_intersect", "kernel", "blocked"]


def _count(df) -> int:
    return df.collect()[0]["triangles"]


@pytest.mark.parametrize("name", sorted(synthetic.TINY_GRAPHS))
def test_tiny_graphs_exact(spark, name):
    edges, expected = synthetic.tiny_graph(spark, name)
    for strategy in STRATEGIES:
        got = _count(triangles.count_triangles(edges, strategy=strategy, n_blocks=2))
        assert got == expected, f"{name}/{strategy}: {got} != {expected}"


@pytest.mark.parametrize("seed", [42, 43])
def test_powerlaw_matches_numpy_oracle(spark, seed):
    pairs = synthetic.powerlaw_edge_pairs(300, 1500, seed=seed)
    expected = synthetic.numpy_triangle_count(pairs)
    edges = synthetic.edges_df(spark, pairs.tolist())
    for strategy in STRATEGIES:
        got = _count(triangles.count_triangles(edges, strategy=strategy, n_blocks=3))
        assert got == expected, f"{strategy}: {got} != {expected}"


def test_hub_graph_all_strategies_agree(spark):
    edges = synthetic.hub_edges(spark, n_vertices=150)
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    expected = synthetic.numpy_triangle_count(pairs)
    for strategy in STRATEGIES:
        got = _count(triangles.count_triangles(edges, strategy=strategy, n_blocks=4))
        assert got == expected


def test_blocked_broadcast_route_parity(spark, monkeypatch):
    """n_blocks=None on a small graph engages the r7 broadcast-CSR route;
    it must agree with the numpy oracle, with the budget kill switch
    forcing the cogroup plan back on, and with 64-bit sparse ids (the
    kernel's rank compression)."""
    from pyspark.sql import functions as F

    from accelerating_tc_spark.operators import triangles as T

    pairs = synthetic.powerlaw_edge_pairs(300, 1500, seed=7)
    expected = synthetic.numpy_triangle_count(pairs)
    edges = synthetic.edges_df(spark, pairs.tolist())
    assert _count(triangles.count_triangles(edges, strategy="blocked")) == expected
    hashed = edges.select(
        F.xxhash64(F.col("src").cast("string")).alias("src"),
        F.xxhash64(F.col("dst").cast("string")).alias("dst"),
    )
    assert _count(triangles.count_triangles(hashed, strategy="blocked")) == expected
    monkeypatch.setattr(T, "_TC_BROADCAST_MAX_BYTES", 0)
    assert _count(triangles.count_triangles(edges, strategy="blocked")) == expected


def test_blocked_sparse_64bit_vertex_ids(spark):
    """A user feeding raw xxhash64 vertex keys (value span ~2^64, no
    compact_ids) must still get exact counts: the kernel's shard-local rank
    compression keeps the encoded probe path applicable to any id space
    (functions/csr.py)."""
    from pyspark.sql import functions as F

    pairs = synthetic.powerlaw_edge_pairs(250, 1400, seed=11)
    expected = synthetic.numpy_triangle_count(pairs)
    edges = synthetic.edges_df(spark, pairs.tolist()).select(
        F.xxhash64(F.col("src").cast("string")).alias("src"),
        F.xxhash64(F.col("dst").cast("string")).alias("dst"),
    )
    got = _count(triangles.count_triangles(edges, strategy="blocked", n_blocks=3))
    assert got == expected


@pytest.mark.parametrize("hub_threshold", [2, 5, 20])
def test_blocked_hub_route_parity(spark, hub_threshold):
    """Force the hub route on (low thresholds make MANY vertices hubs —
    including hub-hub edges and empty-adjacency hubs) and require exact
    parity with the numpy oracle."""
    pairs = synthetic.powerlaw_edge_pairs(200, 1200, seed=7)
    expected = synthetic.numpy_triangle_count(pairs)
    edges = synthetic.edges_df(spark, pairs.tolist())
    for nb in (2, 4):
        got = _count(
            triangles.count_triangles(
                edges, strategy="blocked", n_blocks=nb, hub_threshold=hub_threshold
            )
        )
        assert got == expected, f"threshold={hub_threshold} n_blocks={nb}"


def test_blocked_mega_hub_parity(spark):
    """Planted mega-hub (one vertex adjacent to half the graph): the
    default (no hub route) and an explicitly-engaged hub route must both
    be exact."""
    edges = synthetic.hub_edges(spark, n_vertices=300)
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    expected = synthetic.numpy_triangle_count(pairs)
    got = _count(triangles.count_triangles(edges, strategy="blocked", n_blocks=4))
    assert got == expected
    # explicitly routing the mega-hub must give the same answer
    got_on = _count(
        triangles.count_triangles(
            edges, strategy="blocked", n_blocks=4, hub_threshold=50
        )
    )
    assert got_on == expected


def test_blocked_task_stats_schema(spark):
    edges = synthetic.hub_edges(spark, n_vertices=120)
    oriented = prep.orient_by_degree(prep.canonicalize_edges(edges))
    row = triangles.blocked_task_stats(oriented, n_blocks=2, hub_threshold=10).collect()[0]
    pairs = [(r["src"], r["dst"]) for r in prep.canonicalize_edges(edges).collect()]
    assert row["triangles"] == synthetic.numpy_triangle_count(pairs)
    assert row["n_tasks"] >= 1 and row["max_task_s"] >= row["median_task_s"]


def test_per_vertex_counts_sum_to_3x(spark):
    edges, expected = synthetic.tiny_graph(spark, "k5")
    oriented = prep.orient_by_degree(prep.canonicalize_edges(edges))
    pv = triangles.per_vertex_triangle_counts(oriented)
    total = pv.groupBy().sum("tri_cnt").collect()[0][0]
    assert total == 3 * expected


def test_local_clustering_known(spark):
    # triangle 0-1-2 plus pendant edge (2,3): clustering 1.0 for 0 and 1,
    # 2/ (3*2/2*...) -> vertex 2 has degree 3, 1 triangle -> 2*1/(3*2)=1/3
    edges = synthetic.edges_df(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    rows = {r["vertex"]: r for r in triangles.local_clustering(edges).collect()}
    assert rows[0]["clustering"] == 1.0 and rows[0]["tri_cnt"] == 1
    assert rows[1]["clustering"] == 1.0
    assert abs(rows[2]["clustering"] - round(1 / 3, 6)) < 1e-9
    assert rows[3]["clustering"] == 0.0 and rows[3]["tri_cnt"] == 0


def test_triangle_count_estimate_unbiased_ballpark(spark):
    """DOULION sampled estimate: deterministic coin, so the estimate is a
    fixed value per (graph, p, seed); it must land within the
    concentration envelope of the exact count on a triangle-rich graph."""
    pairs = synthetic.powerlaw_edge_pairs(400, 4000, seed=12)
    exact = synthetic.numpy_triangle_count(pairs)
    edges = synthetic.edges_df(spark, pairs.tolist())
    row = triangles.triangle_count_estimate(edges, p=0.5, seed=42).collect()[0]
    assert row["p"] == 0.5
    assert 0 < row["sampled_edges"] < len(pairs)
    # p=0.5 on thousands of triangles: 3-sigma envelope is well under 40%
    assert abs(row["triangles_est"] - exact) / exact < 0.4, (
        row["triangles_est"],
        exact,
    )
    # determinism: same coin -> same estimate
    again = triangles.triangle_count_estimate(edges, p=0.5, seed=42).collect()[0]
    assert again["triangles_est"] == row["triangles_est"]


def test_hub_route_hostile_threshold_bounded_driver(spark, monkeypatch):
    """hub_threshold=1 makes EVERY vertex a hub candidate on a large graph:
    the candidate collect must be bounded by construction (row cap inside
    the query), the selected set must respect both caps, and the count must
    still be exact — the escape hatch for the hostile case the cap exists
    for. A tiny _MAX_HUB_ROWS makes the cap's effect observable."""
    from accelerating_tc_spark.operators import triangles as T

    monkeypatch.setattr(T, "_MAX_HUB_ROWS", 7)
    pairs = synthetic.powerlaw_edge_pairs(500, 3000, seed=11)
    expected = synthetic.numpy_triangle_count(pairs)
    edges = synthetic.edges_df(spark, pairs.tolist())
    got = _count(
        T.count_triangles(edges, strategy="blocked", n_blocks=3, hub_threshold=1)
    )
    assert got == expected
