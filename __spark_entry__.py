"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Engine: ``accelerating_tc_spark`` (see SURVEY.md for the blueprint).
Graph queries run over the part co-purchase graph derived
deterministically from ``lineitem`` (FIXTURES.md §7); the same
derivation is embedded in each oracle SQL as a CTE so DuckDB builds
the identical graph.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from accelerating_tc_spark.operators import (  # noqa: E402
    components,
    kcore,
    labelprop,
    pagerank,
    prep,
    triangles,
)
from accelerating_tc_spark.sources import tpch_graph  # noqa: E402

# DuckDB CTEs building the exact same graph the Spark side builds.
_EDGES_CTE = """
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
)
"""

_EDGES_DEG_CTE = _EDGES_CTE + """
, degs AS (
  SELECT vertex, COUNT(*) AS degree FROM (
    SELECT src AS vertex FROM edges
    UNION ALL
    SELECT dst AS vertex FROM edges
  ) GROUP BY vertex
)
, oriented AS (
  SELECT
    CASE WHEN ds.degree < dd.degree OR (ds.degree = dd.degree AND e.src < e.dst)
         THEN e.src ELSE e.dst END AS src,
    CASE WHEN ds.degree < dd.degree OR (ds.degree = dd.degree AND e.src < e.dst)
         THEN e.dst ELSE e.src END AS dst
  FROM edges e
  JOIN degs ds ON ds.vertex = e.src
  JOIN degs dd ON dd.vertex = e.dst
)
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: exact triangle count of the
    co-purchase graph via the bounded-shuffle blocked strategy."""
    edges = tpch_graph.copurchase_edges(spark, "/root/testdata/sf0.001")
    return triangles.count_triangles(edges, strategy="blocked", n_blocks=4)


def _q_tc(strategy: str, n_blocks: int = 8):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        edges = tpch_graph.copurchase_edges(spark, sf_dir)
        return triangles.count_triangles(edges, strategy=strategy, n_blocks=n_blocks)

    return run


def _q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = tpch_graph.copurchase_edges(spark, sf_dir)
    return prep.degree_histogram(prep.canonicalize_edges(edges)).orderBy("degree")


def _q_out_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = prep.canonicalize_edges(tpch_graph.copurchase_edges(spark, sf_dir))
    oriented = prep.orient_by_degree(edges)
    return prep.out_degrees(oriented).orderBy("vertex")


def _q_edge_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = prep.canonicalize_edges(tpch_graph.copurchase_edges(spark, sf_dir))
    return edges.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.max(F.greatest("src", "dst")).alias("max_vertex"),
    )


def _canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prep.canonicalize_edges(tpch_graph.copurchase_edges(spark, sf_dir))


def _q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    pr = pagerank.pagerank(spark, _canonical(spark, sf_dir), n_iterations=10)
    return pr.select("vertex", F.round("rank", 6).alias("rank")).orderBy("vertex")


def _q_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    return components.connected_components(spark, _canonical(spark, sf_dir)).orderBy("vertex")


def _q_labelprop(spark: SparkSession, sf_dir: str) -> DataFrame:
    return labelprop.label_propagation(
        spark, _canonical(spark, sf_dir), n_iterations=5
    ).orderBy("vertex")


def _q_core_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kcore.core_numbers(spark, _canonical(spark, sf_dir)).orderBy("vertex")


def _q_orientation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    oriented = prep.orient_by_degree(_canonical(spark, sf_dir))
    return prep.orientation_balance_cost(oriented).select(
        F.round("balance_cost", 6).alias("balance_cost")
    )


def _q_web_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-extraction front end (input_hint): deterministic synthetic web
    corpus -> normalized links -> dense-ID canonical edge table. Rows-only
    check here; byte-identical text + link-structure invariants are pinned
    in tests/test_pages.py."""
    from accelerating_tc_spark.sources import pages as P

    corpus = P.generate_pages(spark, n_sites=10, pages_per_site=10)
    edges, _mapping = P.pages_to_edges(corpus)
    return edges.orderBy("src", "dst")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {
        "tc_join": _q_tc("join"),
        "tc_array_intersect": _q_tc("array_intersect"),
        "tc_kernel": _q_tc("kernel"),
        "tc_blocked": _q_tc("blocked"),
        "degree_histogram": _q_degree_histogram,
        "out_degrees": _q_out_degrees,
        "edge_count": _q_edge_count,
        "pagerank": _q_pagerank,
        "connected_components": _q_components,
        "label_propagation": _q_labelprop,
        "core_numbers": _q_core_numbers,
        "orientation_balance": _q_orientation_balance,
        "web_edges": _q_web_edges,
    }


_TC_ORACLE = _EDGES_CTE + """
SELECT COUNT(*)::BIGINT AS triangles
FROM edges e1
JOIN edges e2 ON e1.dst = e2.src
JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
"""


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names/aliases)."""
    return {
        # id-oriented (src<dst) 3-way join counts each triangle exactly once;
        # degree orientation changes the plan, never the count.
        "tc_join": _TC_ORACLE,
        "tc_array_intersect": _TC_ORACLE,
        "tc_kernel": _TC_ORACLE,
        "tc_blocked": _TC_ORACLE,
        "degree_histogram": _EDGES_DEG_CTE
        + """
SELECT degree, COUNT(*)::BIGINT AS n_vertices
FROM degs GROUP BY degree ORDER BY degree
""",
        "out_degrees": _EDGES_DEG_CTE
        + """
SELECT src AS vertex, COUNT(*)::BIGINT AS out_degree
FROM oriented GROUP BY src ORDER BY vertex
""",
        "edge_count": _EDGES_CTE
        + """
SELECT COUNT(*)::BIGINT AS n_edges, MAX(GREATEST(src, dst))::BIGINT AS max_vertex
FROM edges
""",
        "pagerank": pagerank.pagerank_oracle_sql(_EDGES_CTE, n_iterations=10),
        "connected_components": components.components_oracle_sql(_EDGES_CTE),
        "label_propagation": labelprop.label_propagation_oracle_sql(_EDGES_CTE, n_iterations=5),
        # core_numbers: h-index fixpoint is not reasonably SQL-expressible ->
        # rows-only check; exactness is covered by tests/test_iterative.py.
        "orientation_balance": _EDGES_DEG_CTE
        + """
, od AS (SELECT src, COUNT(*)::DOUBLE AS out_degree FROM oriented GROUP BY src)
SELECT ROUND(SUM(ABS(out_degree - (SELECT AVG(out_degree) FROM od))), 6) AS balance_cost
FROM od
""",
    }
