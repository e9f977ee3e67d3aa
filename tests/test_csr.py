"""Differential tests of the CSR-shard kernel vs the scalar-merge oracle."""

from __future__ import annotations

import numpy as np

from accelerating_tc_spark.functions.csr import CsrShard, intersect_count_csr


def build_random_shard(rng, n_vertices=50, universe=100):
    verts = np.sort(rng.choice(1000, size=n_vertices, replace=False))
    lists = [
        np.sort(rng.choice(universe, size=rng.integers(0, 20), replace=False)).astype(np.int64)
        for _ in range(n_vertices)
    ]
    return verts, lists


def test_csr_gather_roundtrip():
    rng = np.random.default_rng(0)
    verts, lists = build_random_shard(rng)
    shard = CsrShard.from_lists(verts, lists)
    by_vertex = dict(zip(verts.tolist(), lists))
    rows = shard.rows_of(verts)
    flat, row_ids, lens = shard.gather(rows)
    for i, v in enumerate(verts):
        got = flat[row_ids == i]
        assert got.tolist() == by_vertex[v].tolist()


def test_rows_of_missing_keys():
    shard = CsrShard.from_lists([5, 10], [[1, 2], [3]])
    rows = shard.rows_of(np.array([5, 7, 10, 99]))
    assert rows.tolist()[0] >= 0 and rows.tolist()[2] >= 0
    assert rows.tolist()[1] == -1 and rows.tolist()[3] == -1


def test_intersect_count_csr_matches_oracle():
    rng = np.random.default_rng(1)
    verts, lists = build_random_shard(rng, n_vertices=80, universe=60)
    shard = CsrShard.from_lists(verts, lists)
    by_vertex = dict(zip(verts.tolist(), lists))
    u = rng.choice(verts, size=500)
    v = rng.choice(verts, size=500)
    got = intersect_count_csr(shard, u, v)
    for i in range(500):
        expected = len(np.intersect1d(by_vertex[int(u[i])], by_vertex[int(v[i])]))
        assert got[i] == expected


def test_intersect_count_csr_missing_vertices():
    shard = CsrShard.from_lists([1, 2], [[10, 20], [20, 30]])
    got = intersect_count_csr(shard, np.array([1, 99]), np.array([2, 2]))
    assert got.tolist() == [1, 0]


def test_empty_shard():
    shard = CsrShard.from_lists([], [])
    got = intersect_count_csr(shard, np.array([1]), np.array([2]))
    assert got.tolist() == [0]


def test_intersect_count_csr_sparse_64bit_ids():
    """Raw sparse 64-bit ids (xxhash64-style, value span ~2^63) force the
    rank-compression path; results must match the scalar oracle exactly."""
    rng = np.random.default_rng(7)
    n_vertices = 60
    verts = np.sort(
        rng.integers(-(2**62), 2**62, size=n_vertices, dtype=np.int64)
    )
    universe = rng.integers(-(2**62), 2**62, size=200, dtype=np.int64)
    lists = [
        np.sort(rng.choice(universe, size=int(rng.integers(0, 25)), replace=False)).astype(
            np.int64
        )
        for _ in range(n_vertices)
    ]
    shard = CsrShard.from_lists(verts, lists)
    by_vertex = dict(zip(verts.tolist(), lists))
    u = rng.choice(verts, size=400)
    v = rng.choice(verts, size=400)
    got = intersect_count_csr(shard, u, v)
    for i in range(400):
        expected = len(np.intersect1d(by_vertex[int(u[i])], by_vertex[int(v[i])]))
        assert got[i] == expected


def test_sparse_id_stride_actually_overflows():
    """Sanity: the fixture above genuinely exceeds the direct-encoding
    budget (n_rows * span overflows int64), so the rank path is exercised."""
    rng = np.random.default_rng(7)
    vals = rng.integers(-(2**62), 2**62, size=200, dtype=np.int64)
    span = int(vals.max()) - int(vals.min()) + 1
    assert 60 >= np.iinfo(np.int64).max // span
