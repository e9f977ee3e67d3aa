"""Link prediction (operators/linkpred.py) vs a scalar common-neighbor /
Adamic-Adar / Jaccard oracle on crafted and random graphs."""

from __future__ import annotations

import math
import random

from accelerating_tc_spark.operators import linkpred


def python_scores(pairs, min_common=1, max_center_degree=None):
    edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    out = {}
    verts = sorted(adj)
    for i, u in enumerate(verts):
        for v in verts[i + 1 :]:
            if (u, v) in edges:
                continue
            common = [
                w
                for w in adj[u] & adj[v]
                if max_center_degree is None or deg[w] <= max_center_degree
            ]
            if len(common) < min_common:
                continue
            aa = sum(1.0 / math.log(deg[w]) for w in common)
            jac = len(common) / (deg[u] + deg[v] - len(common))
            out[(u, v)] = (len(common), round(aa, 6), round(jac, 6))
    return out


def spark_scores(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = linkpred.common_neighbor_scores(df, **kw).collect()
    return {
        (r["u"], r["v"]): (r["common_cnt"], r["aa_score"], r["jaccard"]) for r in got
    }


def test_crafted_square_with_diagonal_candidates(spark):
    # square 1-2-3-4-1: the two diagonals (1,3) and (2,4) each have 2
    # common neighbors and no edge; every adjacent pair shares 0
    pairs = [(1, 2), (2, 3), (3, 4), (4, 1)]
    got = spark_scores(spark, pairs, min_common=1)
    exp = python_scores(pairs, min_common=1)
    assert got == exp
    assert set(got) == {(1, 3), (2, 4)}
    cnt, aa, jac = got[(1, 3)]
    assert cnt == 2
    assert aa == round(2 / math.log(2), 6)
    assert jac == round(2 / 2, 6)


def test_adjacent_pairs_excluded(spark):
    # triangle + pendant: (1,2),(2,3),(1,3) adjacent; (1,4)? 4-3 edge
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4)]
    got = spark_scores(spark, pairs, min_common=1)
    exp = python_scores(pairs, min_common=1)
    assert got == exp
    assert all((u, v) not in {(1, 2), (2, 3), (1, 3), (3, 4)} for u, v in got)


def test_center_degree_cap_changes_scores_not_degrees(spark):
    # star center 0 with leaves 1..5 plus a 1-2 path: capping the hub
    # removes its wedges, but Jaccard still uses FULL degrees
    pairs = [(0, i) for i in range(1, 6)] + [(1, 2)]
    for cap in (None, 3):
        got = spark_scores(spark, pairs, min_common=1, max_center_degree=cap)
        exp = python_scores(pairs, min_common=1, max_center_degree=cap)
        assert got == exp
    # with the hub capped away only wedges through deg<=3 centers remain:
    # leaves 1 and 2 are adjacent; pairs (0,?) via centers 1,2
    capped = spark_scores(spark, pairs, min_common=1, max_center_degree=3)
    assert all(w[0] >= 1 for w in capped.values())
    assert (3, 4) not in capped  # only wedge center was the capped hub


def test_min_common_threshold(spark):
    # K4 minus one edge: (1,4) has common {2,3}; with min_common=3 empty
    pairs = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    assert spark_scores(spark, pairs, min_common=3) == {}
    got = spark_scores(spark, pairs, min_common=2)
    assert set(got) == {(1, 4)}


def test_random_graph_parity(spark):
    rng = random.Random(7)
    pairs = list(
        {
            (rng.randrange(40), rng.randrange(40))
            for _ in range(260)
        }
    )
    for kw in ({"min_common": 1}, {"min_common": 2, "max_center_degree": 8}):
        got = spark_scores(spark, pairs, **kw)
        exp = python_scores(pairs, **kw)
        assert got == exp


def test_duplicate_and_reversed_edges_collapse(spark):
    pairs = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 2), (1, 1)]
    got = spark_scores(spark, pairs, min_common=1)
    exp = python_scores(pairs, min_common=1)
    assert got == exp
    assert set(got) == {(1, 3)}
