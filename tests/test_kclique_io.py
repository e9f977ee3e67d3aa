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


def test_vertex_order_and_label_loaders(spark, tmp_path):
    """S7/S8: the order and label loaders parse the reference's text formats
    (comments skipped, typed columns) and drive a relabel end-to-end."""
    from accelerating_tc_spark.sources import io as gio

    order_path = str(tmp_path / "order.txt")
    with open(order_path, "w") as fh:
        fh.write("# org new\n0 2\n1 0\n2 1\n")
    order = gio.read_vertex_order(spark, order_path)
    got = {r["vertex"]: r["new_id"] for r in order.collect()}
    assert got == {0: 2, 1: 0, 2: 1}

    label_path = str(tmp_path / "labels.txt")
    with open(label_path, "w") as fh:
        fh.write("# u l\n0 7\n1 7\n2 3\n")
    labels = gio.read_labels(spark, label_path)
    lv = {r["vertex"]: r["label"] for r in labels.collect()}
    assert lv == {0: 7, 1: 7, 2: 3}

    # drive the loaded order through a relabel: triangle structure invariant
    from pyspark.sql import functions as F

    from accelerating_tc_spark.sources import synthetic

    edges = synthetic.edges_df(spark, [(0, 1), (1, 2), (0, 2)])
    m_src = order.select(F.col("vertex").alias("src"), F.col("new_id").alias("ns"))
    m_dst = order.select(F.col("vertex").alias("dst"), F.col("new_id").alias("nd"))
    relabeled = (
        edges.join(m_src, "src").join(m_dst, "dst")
        .select(F.least("ns", "nd").alias("src"), F.greatest("ns", "nd").alias("dst"))
    )
    pairs = [(r["src"], r["dst"]) for r in relabeled.collect()]
    assert synthetic.numpy_triangle_count(pairs) == 1


def test_load_query_graphs(tmp_path):
    """Reference .sm.queries format (sm.cpp:15-43): repeated blocks of
    v_num e_num / labels / edge pairs (u>v normalized by swap)."""
    from accelerating_tc_spark.sources import io as gio

    p = tmp_path / "q.sm.queries"
    p.write_text("3 3\n7 8 9\n0 1\n2 1\n0 2\n" "4 3\n0 1 2 3\n1 0\n1 2\n3 2\n")
    qs = gio.load_query_graphs(str(p))
    assert len(qs) == 2
    labels0, edges0 = qs[0]
    assert labels0 == {0: 7, 1: 8, 2: 9}
    assert edges0 == [(0, 1), (1, 2), (0, 2)]  # '2 1' swapped
    labels1, edges1 = qs[1]
    assert labels1 == {0: 0, 1: 1, 2: 2, 3: 3}
    assert edges1 == [(0, 1), (1, 2), (2, 3)]


def test_bucketed_edges_join_without_exchange(spark, tmp_path):
    """Bucketed storage must deliver its co-location contract: a self-join
    on the bucket key plans with ZERO Exchange operators (vs 2 for plain
    parquet), and values round-trip exactly."""
    from accelerating_tc_spark.sources import io as gio
    from accelerating_tc_spark.sources import synthetic

    pairs = synthetic.powerlaw_edge_pairs(100, 400, seed=23).tolist()
    edges = synthetic.edges_df(spark, pairs)
    gio.write_edges_bucketed(
        edges, "bkt_edges_test", n_buckets=4, path=str(tmp_path / "bkt")
    )
    try:
        t = gio.read_bucketed(spark, "bkt_edges_test")
        assert t.count() == edges.count()
        # force the sort-merge path (tiny test tables would broadcast and
        # trivially skip the shuffle): bucketed sides must still plan with
        # ZERO shuffle exchanges, while plain parquet needs two
        joined = t.alias("a").hint("merge").join(t.alias("b"), "src")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        plain = spark.read.parquet(str(tmp_path / "bkt"))
        base = plain.alias("a").hint("merge").join(plain.alias("b"), "src")
        base_plan = base._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in base_plan
        # groupBy on the bucket key also skips the exchange
        agg = t.groupBy("src").count()
        plan2 = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan2, plan2
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_edges_test")


def test_level_task_count_formula():
    f = kclique._level_task_count
    # floors at core count, scales with estimate, caps at max_tasks
    assert f(0, 32, 2_000_000, 4096) == 32
    assert f(64_000_000, 32, 2_000_000, 4096) == 32
    assert f(400_000_000, 32, 2_000_000, 4096) == 200
    assert f(10**13, 32, 2_000_000, 4096) == 4096


def test_kclique_dense_community_bounded_fanout(spark):
    """Planted dense community (a 24-clique) inside a sparse ring — the
    adversarial shape for level expansion (kcl.cu chunks embeddings for
    exactly this). The estimator must be EXACT for the expansion join
    (sum of forward degrees over embeddings = join output rows), the task
    count must respond to rows_per_task, and counts stay exact."""
    from math import comb

    n_clq = 24
    clique_edges = [(i, j) for i in range(n_clq) for j in range(i + 1, n_clq)]
    ring = [(100 + i, 100 + (i + 1) % 40) for i in range(40)]
    edges = synthetic.edges_df(spark, clique_edges + ring)

    stats: list = []
    got = _n(
        kclique.kclique_count(
            edges, 5, orient="id", rows_per_task=50, max_tasks=512, stats=stats
        )
    )
    assert got == comb(n_clq, 5)
    assert [s["level"] for s in stats] == [3, 4, 5]
    # exact estimator: with id orientation the level-3 expansion output is
    # the number of directed 2-paths u<v<w (w any forward nbr of v):
    # within the K_n, sum over v of indeg(v)*outdeg(v); the canonical ring
    # adds the 38 chains 100+i < 101+i < 102+i
    exp_paths = sum(i * (n_clq - 1 - i) for i in range(n_clq)) + 38
    assert stats[0]["est_rows"] == exp_paths
    # fan-out control engaged: the estimate forces more tasks than cores
    par = spark.sparkContext.defaultParallelism
    assert stats[0]["n_tasks"] == max(par, min(512, -(-exp_paths // 50)))
    assert stats[1]["n_tasks"] >= stats[0]["n_tasks"]  # level 4 is bigger
    # realized level sizes recorded (evidence trail for the bench)
    assert stats[2]["max_task_rows"] > 0

    # same fixture, generous budget: task floor returns to the core count
    stats2: list = []
    _n(kclique.kclique_count(edges, 4, orient="id", rows_per_task=10**9, stats=stats2))
    assert all(s["n_tasks"] == par for s in stats2)
