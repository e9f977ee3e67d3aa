"""Vertex ordering suite: interleave bijectivity/banding, SlashBurn shape,
compression-ratio diagnostic."""

from __future__ import annotations

from pyspark.sql import functions as F

from accelerating_tc_spark.operators import order, prep
from accelerating_tc_spark.sources import synthetic


def test_balanced_interleave_bijective_and_banded(spark):
    edges = synthetic.powerlaw_edges(spark, n_vertices=200, n_edges=1000, seed=5)
    canonical = prep.canonicalize_edges(edges)
    mix = 8
    relabeled, mapping = order.balanced_interleave_relabel(canonical, mix_ratio=mix)
    rows = mapping.collect()
    n = len(rows)
    ids = sorted(r["new_id"] for r in rows)
    assert ids == list(range(n))  # bijective onto [0, n)
    # banding: every aligned window of mix consecutive new ids draws one
    # vertex from each degree-band chunk
    deg = {r["vertex"]: r["degree"] for r in prep.degrees(canonical).collect()}
    by_rank = sorted(rows, key=lambda r: (-deg[r["vertex"]], r["vertex"]))
    chunk_size = n // mix
    chunk_of = {r["vertex"]: i // chunk_size for i, r in enumerate(by_rank) if i < mix * chunk_size}
    for r in rows:
        if r["new_id"] < mix * chunk_size:
            assert r["new_id"] % mix == chunk_of[r["vertex"]]
    # graph structure preserved
    orig = synthetic.numpy_triangle_count([(x["src"], x["dst"]) for x in canonical.collect()])
    new = synthetic.numpy_triangle_count([(x["src"], x["dst"]) for x in relabeled.collect()])
    assert orig == new


def test_slashburn_bijective_hubs_front(spark):
    edges = synthetic.hub_edges(spark, n_vertices=150, seed=4)
    canonical = prep.canonicalize_edges(edges)
    mapping = order.slashburn_order(spark, canonical, k=5, max_rounds=6)
    rows = {r["vertex"]: r["new_id"] for r in mapping.collect()}
    n = len(rows)
    assert sorted(rows.values()) == list(range(n))
    # the global max-degree vertex is the first hub -> new_id 0
    deg = {r["vertex"]: r["degree"] for r in prep.degrees(canonical).collect()}
    top = min(deg, key=lambda v: (-deg[v], v))
    assert rows[top] == 0


def test_bfs_order_levels(spark):
    # path graph 0-1-2-3-4 plus disjoint edge (10,11): BFS from each
    # component's min vertex gives level = distance; ids rank (level, vertex)
    edges = synthetic.edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)])
    mapping = {r["vertex"]: r["new_id"] for r in order.bfs_order(spark, prep.canonicalize_edges(edges)).collect()}
    assert sorted(mapping.values()) == list(range(7))
    # level 0: vertices 0 and 10 (component minima), ordered by id
    assert mapping[0] == 0 and mapping[10] == 1
    # level 1: 1 and 11; level 2: 2; ...
    assert mapping[1] == 2 and mapping[11] == 3
    assert mapping[2] == 4 and mapping[3] == 5 and mapping[4] == 6


def test_auto_strategy_parity(spark):
    from accelerating_tc_spark.operators import triangles

    edges = synthetic.powerlaw_edges(spark, n_vertices=150, n_edges=900, seed=2)
    pairs = [(r["src"], r["dst"]) for r in prep.canonicalize_edges(edges).collect()]
    expected = synthetic.numpy_triangle_count(pairs)
    got = triangles.count_triangles(edges, strategy="auto", n_blocks=4).collect()[0]["triangles"]
    assert got == expected


def test_compression_ratio_known(spark):
    # out lists: 0 -> [1, 2, 64] = bases {0, 1} -> 2 distinct
    # in  lists: 1 -> [0], 2 -> [0], 64 -> [0]  -> 3 distinct; m = 3
    edges = synthetic.edges_df(spark, [(0, 1), (0, 2), (0, 64)])
    canonical = prep.canonicalize_edges(edges)
    row = order.compression_ratio(canonical).collect()[0]
    assert abs(row["out_comp_ratio"] - 2 / 3) < 1e-6
    assert abs(row["in_comp_ratio"] - 1.0) < 1e-6
    assert abs(row["comp_ratio"] - (2 / 3 + 1.0) / 2) < 1e-6


def test_compression_ratio_improves_with_ordering(spark):
    # a graph whose natural ids scatter neighbors across base words: the
    # degree-rank relabel should not WORSEN the hub's packing
    edges = synthetic.powerlaw_edges(spark, n_vertices=400, n_edges=2500, seed=12)
    canonical = prep.canonicalize_edges(edges)
    base = order.compression_ratio(canonical).collect()[0]["comp_ratio"]
    _, mapping = prep.degree_rank_relabel(canonical)
    relab = order.compression_ratio(
        canonical, mapping.select("vertex", F.col("new_id"))
    ).collect()[0]["comp_ratio"]
    assert 0 < relab <= 1.0 and 0 < base <= 1.0
    assert relab <= base + 0.05  # ordering should roughly help, never blow up


def test_bfs_order_deep_path_flat_rounds(spark):
    """A 40-level path drives bfs_order through 40 frontier rounds — past
    the measured ~15-chained-localCheckpoint Spark 4.1 cliff (BENCH.md
    §6a). With LineageCutter routing every 8th cut through parquet the
    per-round wall stays flat; without it the tail rounds degrade
    geometrically and this test times out. Correctness: new_id must equal
    the path position (single component, source = vertex 0)."""
    import time

    n = 41  # vertices 0..40, path 0-1-...-40 => BFS levels 0..40
    edges = synthetic.edges_df(spark, [(i, i + 1) for i in range(n - 1)])
    t0 = time.time()
    mapping = {
        r["vertex"]: r["new_id"]
        for r in order.bfs_order(spark, prep.canonicalize_edges(edges), max_rounds=64).collect()
    }
    wall = time.time() - t0
    assert mapping == {v: v for v in range(n)}
    # flat-cost bound, sized for a loaded box (measured 35s quiet): the
    # pre-cutter geometric tail alone (x2.5/round past ~15 cuts) exceeds
    # this by orders of magnitude before round 40
    assert wall < 300, f"bfs_order 40-round wall {wall:.1f}s — lineage chain regressed"


def test_slashburn_deep_rounds_terminates(spark):
    """30 slashburn rounds (k=2 on a 300-vertex hub-heavy graph) exercise
    the cutter-backed remaining-edges chain; mapping must stay bijective."""
    edges = synthetic.powerlaw_edges(spark, n_vertices=300, n_edges=1800, seed=9)
    canonical = prep.canonicalize_edges(edges)
    mapping = order.slashburn_order(spark, canonical, k=2, max_rounds=30)
    rows = mapping.collect()
    n_v = canonical.select(F.col("src").alias("v")).union(
        canonical.select(F.col("dst").alias("v"))
    ).distinct().count()
    assert len(rows) == n_v
    assert len({r["new_id"] for r in rows}) == n_v
    assert {r["new_id"] for r in rows} == set(range(n_v))


def test_bandwidth_pack_bijective_balanced(spark):
    edges = synthetic.powerlaw_edges(spark, n_vertices=300, n_edges=1500, seed=9)
    canonical = prep.canonicalize_edges(edges)
    relabeled, mapping = order.bandwidth_pack_relabel(canonical, bucket_size=10)
    rows = mapping.collect()
    n = len(rows)
    assert sorted(r["new_id"] for r in rows) == list(range(n))  # bijective
    # degree<=1 tail sits at the BACK with bucket -1
    tail = [r for r in rows if r["bucket"] == -1]
    body = [r for r in rows if r["bucket"] >= 0]
    assert all(r["degree"] <= 1 for r in tail)
    assert all(r["degree"] >= 2 for r in body)
    if tail and body:
        assert min(r["new_id"] for r in tail) > max(r["new_id"] for r in body)
    # buckets are contiguous new-id ranges of near-equal size
    by_bucket: dict[int, list[int]] = {}
    for r in body:
        by_bucket.setdefault(r["bucket"], []).append(r["new_id"])
    sizes = {len(v) for v in by_bucket.values()}
    assert max(sizes) - min(sizes) <= 1
    for ids in by_bucket.values():
        ids.sort()
        assert ids == list(range(ids[0], ids[0] + len(ids)))
    # cost balance: for a piecewise-monotone per-slot cost the strided
    # packing's per-bucket spread is bounded by the full node-delta range
    # (per-segment total variation telescopes); a contiguous degree-sorted
    # packing concentrates whole classes per bucket and does far worse
    costs = {r["bucket"]: r["cost"] for r in order.bucket_costs(mapping).collect()}
    import math

    def node_delta(d):
        bw = 384.1 * d**0.1491 if d >= 10 else [0, 0, 271, 310, 399, 419, 458, 478, 524, 539][d]
        lam = 12.0 if d >= 10 else [0, 0, 145.51, 121.98, 53.26, 23.92, 16, 14, 12.94, 10.24][d]
        return bw - lam * math.sqrt(bw) / math.sqrt(d)

    deltas = [node_delta(r["degree"]) for r in body]
    spread = max(costs.values()) - min(costs.values())
    assert spread <= (max(deltas) - min(deltas)) + 1e-6
    # contiguous comparison packing: same slot order, buckets cut in blocks
    n_b = len(by_bucket)
    ordered = sorted(
        body,
        key=lambda r: (
            0 if r["degree"] >= 5 else 1,
            -r["degree"] if r["degree"] >= 5 else r["degree"],
            r["vertex"],
        ),
    )
    block = [0.0] * n_b
    for i, r in enumerate(ordered):
        block[min(i * n_b // len(ordered), n_b - 1)] += node_delta(r["degree"])
    assert spread < (max(block) - min(block))
    # graph structure preserved through the relabel
    orig = synthetic.numpy_triangle_count([(x["src"], x["dst"]) for x in canonical.collect()])
    new = synthetic.numpy_triangle_count([(x["src"], x["dst"]) for x in relabeled.collect()])
    assert orig == new
