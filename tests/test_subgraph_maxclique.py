"""Subgraph matching + maximal cliques vs pure-python oracles."""

from __future__ import annotations

from collections import defaultdict
from itertools import permutations

import pytest

from accelerating_tc_spark.operators import maxclique, subgraph
from accelerating_tc_spark.sources import synthetic


def make_labels(spark, pairs, n_labels=3):
    verts = sorted({v for e in pairs for v in e})
    rows = [(v, v % n_labels) for v in verts]
    return spark.createDataFrame(rows, "vertex long, label int"), dict(rows)


def py_subgraph_count(pairs, labels, q_labels, q_edges) -> int:
    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    verts = sorted(adj)
    qs = sorted(q_labels)
    count = 0
    for perm in permutations(verts, len(qs)):
        binding = dict(zip(qs, perm))
        if any(labels.get(binding[q]) != q_labels[q] for q in qs):
            continue
        if all(binding[b] in adj[binding[a]] for a, b in q_edges):
            count += 1
    return count


def py_maximal_cliques(pairs):
    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)

    out = []

    def bk(R, P, X):
        if not P and not X:
            out.append(tuple(sorted(R)))
            return
        for v in list(P):
            bk(R | {v}, P & adj[v], X & adj[v])
            P.remove(v)
            X.add(v)

    bk(set(), set(adj), set())
    return sorted(out)


@pytest.fixture(scope="module")
def small_graph(spark):
    pairs = synthetic.powerlaw_edge_pairs(40, 120, seed=21).tolist()
    clean = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    edges = synthetic.edges_df(spark, clean)
    return clean, edges


def test_subgraph_match_labeled_triangle(spark, small_graph):
    clean, edges = small_graph
    labels_df, labels = make_labels(spark, clean)
    q_labels = {0: 0, 1: 1, 2: 2}
    q_edges = [(0, 1), (1, 2), (0, 2)]
    got = subgraph.subgraph_match_count(edges, labels_df, q_labels, q_edges).collect()[0][
        "embeddings"
    ]
    assert got == py_subgraph_count(clean, labels, q_labels, q_edges)


def test_subgraph_match_labeled_path(spark, small_graph):
    clean, edges = small_graph
    labels_df, labels = make_labels(spark, clean)
    q_labels = {0: 1, 1: 0, 2: 1}
    q_edges = [(0, 1), (1, 2)]
    got = subgraph.subgraph_match_count(edges, labels_df, q_labels, q_edges).collect()[0][
        "embeddings"
    ]
    assert got == py_subgraph_count(clean, labels, q_labels, q_edges)


def test_subgraph_oracle_sql_matches(small_graph, spark):
    import duckdb
    import pandas as pd

    clean, _ = small_graph
    _, labels = make_labels(spark, clean)
    con = duckdb.connect()
    con.register("edge_tbl", pd.DataFrame(clean, columns=["src", "dst"]))
    con.register("label_tbl", pd.DataFrame(labels.items(), columns=["vertex", "label"]))
    q_labels = {0: 0, 1: 1, 2: 2}
    q_edges = [(0, 1), (1, 2), (0, 2)]
    sql = subgraph.subgraph_match_oracle_sql(
        "WITH edges AS (SELECT src, dst FROM edge_tbl)",
        ", vlabels AS (SELECT vertex, label FROM label_tbl)",
        q_labels,
        q_edges,
    )
    got = con.execute(sql).fetchone()[0]
    assert got == py_subgraph_count(clean, labels, q_labels, q_edges)


def test_maximal_cliques_exact(spark, small_graph):
    clean, edges = small_graph
    got = sorted(tuple(r["clique"]) for r in maxclique.maximal_cliques(edges).collect())
    expected = py_maximal_cliques(clean)
    assert got == expected


def test_maximal_cliques_hub_graph(spark):
    """Skewed fixture: the per-seed payload must stay bounded (pre-intersected
    adjacency) and the enumeration exact even with a mega-hub seed."""
    edges = synthetic.hub_edges(spark, n_vertices=200)
    clean = sorted(
        {(min(r["src"], r["dst"]), max(r["src"], r["dst"])) for r in edges.collect() if r["src"] != r["dst"]}
    )
    got = sorted(tuple(r["clique"]) for r in maxclique.maximal_cliques(edges).collect())
    assert got == py_maximal_cliques(clean)


def test_maximal_clique_oracle_sql_matches(spark, small_graph):
    import duckdb
    import pandas as pd

    clean, _ = small_graph
    con = duckdb.connect()
    con.register("edge_tbl", pd.DataFrame(clean, columns=["src", "dst"]))
    sql = maxclique.maximal_clique_oracle_sql(
        "WITH edges AS (SELECT src, dst FROM edge_tbl)"
    )
    got = con.execute(sql).fetchone()[0]
    assert got == len(py_maximal_cliques(clean))


def test_maximal_cliques_known(spark):
    # K4 + triangle sharing vertex 0 + pendant edge
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (0, 10), (0, 11), (10, 11), (11, 20)]
    edges = synthetic.edges_df(spark, pairs)
    got = sorted(tuple(r["clique"]) for r in maxclique.maximal_cliques(edges).collect())
    assert got == [(0, 1, 2, 3), (0, 10, 11), (11, 20)]


def test_subgraph_match_counts_from_file(spark, tmp_path):
    """Multi-query .sm.queries file: labeled triangle + labeled P3 path on
    a known graph, counts checked by hand."""
    from accelerating_tc_spark.operators import subgraph
    from accelerating_tc_spark.sources import synthetic

    # K4 over vertices 0..3 with labels = vertex % 2
    edges = synthetic.edges_df(spark, [(a, b) for a in range(4) for b in range(a + 1, 4)])
    labels = spark.createDataFrame(
        [(v, v % 2) for v in range(4)], "vertex long, label int"
    )
    qfile = tmp_path / "multi.sm.queries"
    # q0: triangle labeled (0,1,0); q1: path 0-1 (single labeled edge)
    qfile.write_text("3 3\n0 1 0\n0 1\n1 2\n0 2\n" "2 1\n0 1\n0 1\n")
    out = {
        r["query_idx"]: r["embeddings"]
        for r in subgraph.subgraph_match_counts_from_file(
            spark, edges, labels, str(qfile)
        ).collect()
    }
    # triangles with labels (0,1,0): pick q1 from {1,3}(label 1), q0/q2 from
    # {0,2} ordered pairs -> 2 * 2 = 4 embeddings
    assert out[0] == 4
    # labeled edge (0,1): ordered (even, odd) adjacent pairs: 2*2 = 4
    assert out[1] == 4


def test_save_load_cliques_roundtrip(spark, tmp_path):
    """File sink parity with the reference listing format (mc.cpp:53):
    one clique per line, ascending space-separated members."""
    edges, pairs = synthetic.tiny_graph(spark, "two_triangles")
    out = str(tmp_path / "mc_out")
    cliques = maxclique.maximal_cliques(edges)
    maxclique.save_cliques(cliques, out)
    back = {tuple(r["clique"]) for r in maxclique.load_cliques(spark, out).collect()}
    want = {tuple(sorted(r["clique"])) for r in cliques.collect()}
    assert back == want and len(back) > 0
