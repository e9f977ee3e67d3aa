"""k-clique counts vs pure-python oracle; edge IO round-trips."""

from __future__ import annotations

from collections import defaultdict

from accelerating_tc_spark.operators import kclique, triangles
from accelerating_tc_spark.sources import io, synthetic


def py_kclique4(pairs) -> int:
    adj = defaultdict(set)
    edges = set()
    for a, b in pairs:
        if a == b:
            continue
        u, v = min(a, b), max(a, b)
        edges.add((u, v))
        adj[u].add(v)
        adj[v].add(u)
    count = 0
    for u, v in edges:
        common = sorted(n for n in (adj[u] & adj[v]) if n > v)
        for i, w in enumerate(common):
            for x in common[i + 1 :]:
                if x in adj[w]:
                    count += 1
    return count


def _n(df):
    return df.collect()[0]["cliques"]


def test_kclique_on_known_graphs(spark):
    k5, _ = synthetic.tiny_graph(spark, "k5")
    assert _n(kclique.kclique_count(k5, 3)) == 10
    assert _n(kclique.kclique_count(k5, 4)) == 5
    assert _n(kclique.kclique_count(k5, 5)) == 1
    k4, _ = synthetic.tiny_graph(spark, "k4")
    assert _n(kclique.kclique_count(k4, 4)) == 1
    two, _ = synthetic.tiny_graph(spark, "two_triangles")
    assert _n(kclique.kclique_count(two, 4)) == 0


def test_kclique3_equals_triangle_count(spark):
    pairs = synthetic.powerlaw_edge_pairs(150, 700, seed=9)
    edges = synthetic.edges_df(spark, pairs.tolist())
    tri = triangles.count_triangles(edges, strategy="kernel").collect()[0]["triangles"]
    assert _n(kclique.kclique_count(edges, 3)) == tri


def test_kclique4_matches_python_both_orientations(spark):
    pairs = synthetic.powerlaw_edge_pairs(150, 700, seed=9)
    edges = synthetic.edges_df(spark, pairs.tolist())
    expected = py_kclique4(pairs.tolist())
    assert _n(kclique.kclique_count(edges, 4, orient="degree")) == expected
    assert _n(kclique.kclique_count(edges, 4, orient="id")) == expected


def test_kclique_oracle_sql_matches_python():
    import duckdb
    import pandas as pd

    pairs = synthetic.powerlaw_edge_pairs(100, 500, seed=13).tolist()
    clean = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    con = duckdb.connect()
    con.register("edge_tbl", pd.DataFrame(clean, columns=["src", "dst"]))
    cte = "WITH edges AS (SELECT src, dst FROM edge_tbl)"
    got4 = con.execute(kclique.kclique_oracle_sql(cte, 4)).fetchone()[0]
    assert got4 == py_kclique4(clean)
    got3 = con.execute(kclique.kclique_oracle_sql(cte, 3)).fetchone()[0]
    assert got3 == synthetic.numpy_triangle_count(clean)


def test_edge_text_roundtrip(spark, tmp_path):
    pairs = [(0, 1), (1, 2), (2, 0), (3, 4)]
    edges = synthetic.edges_df(spark, pairs)
    p = str(tmp_path / "edges_txt")
    io.write_edge_text(edges, p)
    back = io.read_edge_text(spark, p)
    assert sorted((r["src"], r["dst"]) for r in back.collect()) == sorted(pairs)


def test_edge_parquet_bucketed_roundtrip(spark, tmp_path):
    pairs = synthetic.powerlaw_edge_pairs(50, 200, seed=4).tolist()
    edges = synthetic.edges_df(spark, pairs)
    p = str(tmp_path / "edges_pq")
    io.write_edges(edges, p, n_buckets=4)
    back = io.read_edges(spark, p)
    assert sorted(map(tuple, pairs)) == sorted((r["src"], r["dst"]) for r in back.collect())
