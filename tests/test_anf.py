"""Neighborhood function (operators/anf.py): exact pair-BFS vs a scalar
BFS oracle, HLL estimates vs exact within tolerance, and the gate row."""

from __future__ import annotations

import random
from collections import deque

from accelerating_tc_spark.operators import anf


def python_anf(pairs, max_t):
    """Exact N(t) for t = 0..max_t by per-vertex BFS."""
    edges = {(a, b) for a, b in pairs if a != b}
    verts = sorted({v for e in edges for v in e})
    out: dict[int, list[int]] = {v: [] for v in verts}
    for a, b in edges:
        out[a].append(b)
    counts = [0] * (max_t + 1)
    for s in verts:
        dist = {s: 0}
        q = deque([s])
        while q:
            v = q.popleft()
            if dist[v] >= max_t:
                continue
            for w in out[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        for d in dist.values():
            for t in range(d, max_t + 1):
                counts[t] += 1
    return counts


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_exact_on_path_and_cycle(spark):
    # path 1->2->3->4: N(0)=4, N(1)=7, N(2)=9, N(3)=10, N(4)=10 (saturated)
    path = [(1, 2), (2, 3), (3, 4)]
    got = {
        r["t"]: r["n_pairs"]
        for r in anf.neighborhood_function_exact(spark, _edges_df(spark, path), max_t=4).collect()
    }
    assert got == {0: 4, 1: 7, 2: 9, 3: 10, 4: 10}
    # 3-cycle saturates at 9 ordered pairs by t=2
    cyc = [(1, 2), (2, 3), (3, 1)]
    got = {
        r["t"]: r["n_pairs"]
        for r in anf.neighborhood_function_exact(spark, _edges_df(spark, cyc), max_t=3).collect()
    }
    assert got == {0: 3, 1: 6, 2: 9, 3: 9}


def test_exact_random_digraph_parity(spark):
    rng = random.Random(11)
    pairs = list({(rng.randrange(60), rng.randrange(60)) for _ in range(180)})
    exp = python_anf(pairs, max_t=4)
    got = [
        r["n_pairs"]
        for r in anf.neighborhood_function_exact(spark, _edges_df(spark, pairs), max_t=4)
        .orderBy("t")
        .collect()
    ]
    assert got == exp


def test_hll_close_to_exact_and_monotone(spark):
    rng = random.Random(13)
    pairs = list({(rng.randrange(80), rng.randrange(80)) for _ in range(300)})
    exact = python_anf(pairs, max_t=3)
    est = [
        r["est_pairs"]
        for r in anf.neighborhood_function(spark, _edges_df(spark, pairs), max_t=3)
        .orderBy("t")
        .collect()
    ]
    assert len(est) == 4
    assert all(b >= a for a, b in zip(est, est[1:]))  # balls only grow
    for e_est, e_exact in zip(est, exact):
        assert abs(e_est - e_exact) / e_exact <= 0.05


def test_gate_row_shape_and_verdict(spark):
    rng = random.Random(17)
    pairs = list({(rng.randrange(50), rng.randrange(50)) for _ in range(150)})
    rows = anf.anf_error_gate(spark, _edges_df(spark, pairs), max_t=3).collect()
    assert [r["t"] for r in rows] == [0, 1, 2, 3]
    exp = python_anf(pairs, max_t=3)
    assert [r["n_pairs"] for r in rows] == exp
    assert all(r["within_tol"] for r in rows)


def python_harmonic(pairs, max_t):
    """Inbound bounded harmonic: c(u) = sum over v!=u reaching u within
    max_t of 1/d(v, u)."""
    edges = {(a, b) for a, b in pairs if a != b}
    verts = sorted({v for e in edges for v in e})
    out: dict[int, list[int]] = {v: [] for v in verts}
    for a, b in edges:
        out[a].append(b)
    cent: dict[int, float] = {}
    for s in verts:
        dist = {s: 0}
        q = deque([s])
        while q:
            v = q.popleft()
            if dist[v] >= max_t:
                continue
            for w in out[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        for u, d in dist.items():
            if d > 0:
                cent[u] = cent.get(u, 0.0) + 1.0 / d
    return {u: round(c, 6) for u, c in cent.items()}


def test_harmonic_path_and_star(spark):
    # path 1->2->3->4: c(2)=1, c(3)=1+1/2, c(4)=1+1/2+1/3; 1 unreached
    got = {
        r["vertex"]: r["centrality"]
        for r in anf.harmonic_centrality(spark, _edges_df(spark, [(1, 2), (2, 3), (3, 4)]), max_t=4).collect()
    }
    assert got == {2: 1.0, 3: 1.5, 4: round(11 / 6, 6)}
    # inbound star: everything points at 9
    got = {
        r["vertex"]: r["centrality"]
        for r in anf.harmonic_centrality(spark, _edges_df(spark, [(i, 9) for i in range(4)]), max_t=2).collect()
    }
    assert got == {9: 4.0}


def test_harmonic_horizon_truncates(spark):
    pairs = [(1, 2), (2, 3), (3, 4)]
    got = {
        r["vertex"]: r["centrality"]
        for r in anf.harmonic_centrality(spark, _edges_df(spark, pairs), max_t=1).collect()
    }
    assert got == {2: 1.0, 3: 1.0, 4: 1.0}


def test_harmonic_random_parity(spark):
    rng = random.Random(19)
    pairs = list({(rng.randrange(50), rng.randrange(50)) for _ in range(160)})
    got = {
        r["vertex"]: r["centrality"]
        for r in anf.harmonic_centrality(spark, _edges_df(spark, pairs), max_t=3).collect()
    }
    assert got == python_harmonic(pairs, max_t=3)
