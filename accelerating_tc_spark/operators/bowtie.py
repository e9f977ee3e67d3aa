"""Bow-tie decomposition of a directed link graph (Broder et al., "Graph
structure in the Web", WWW 2000) — THE canonical whole-crawl analysis:
every page falls into one of

- ``core``  — the giant SCC (largest strongly connected component),
- ``in``    — reaches the core but is not in it (new/fringe pages),
- ``out``   — reachable from the core but not in it (sinks, dead ends),
- ``other`` — everything else (tendrils, tubes, disconnected islands;
  Broder's finer split of this remainder needs core-avoiding path
  queries whose cost buys little diagnostic value — documented
  simplification, the 4-way split is what crawl dashboards report).

Composition of two already-shipped primitives, which is the point of the
engine: ``strongly_connected_components`` (operators/scc.py) finds the
core; ``reachable_from`` (operators/bfs.py) runs the exact forward
closure over the edge table and its transpose. Classification precedence
core > out > in is semantically safe — a vertex that both reaches and is
reached by the core is mutually reachable with it and therefore IS core.

Giant-SCC tie-break: largest size, then smallest component id — total
order, deterministic on both the Spark and the oracle side.

Scale posture: SCC and the two BFS closures are all shuffle-join +
partial-aggregate plans with per-round state O(|V|) (their own module
docstrings); this layer adds one 1-row driver lookup (the giant
component id — a bounded collect by construction) and two left-anti /
semi joins keyed on vertex. Nothing here is new shuffle shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import bfs, scc


def bowtie_classes(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 200,
    **scc_kwargs,
) -> DataFrame:
    """(vertex, cls) over a directed (src, dst) edge table; cls in
    {'core', 'in', 'out', 'other'}. Vertex universe and edge hygiene
    (self-loops/dups dropped) follow the SCC contract."""
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .distinct()
        .cache()
    )
    comp = scc.strongly_connected_components(spark, e, **scc_kwargs).cache()

    # giant SCC: max size, then min component id — a 1-row bounded collect
    giant_row = (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("component"))
        .first()
    )
    if giant_row is None:  # edge-less input
        out = comp.select("vertex", F.lit("other").alias("cls"))
        # release the frames cached above before the early return (ADVICE
        # r6: this path leaked them for the session); comp is empty here so
        # re-deriving `out` costs nothing
        e.unpersist()
        comp.unpersist()
        return out
    giant = int(giant_row["component"])

    core = comp.where(F.col("component") == giant).select("vertex")
    fwd = bfs.reachable_from(spark, e, core, max_rounds=max_rounds)
    rev = bfs.reachable_from(
        spark,
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        core,
        max_rounds=max_rounds,
    )

    out = (
        comp.withColumn("_core", F.col("component") == giant)
        .join(fwd.withColumn("_fwd", F.lit(True)), "vertex", "left")
        .join(rev.withColumn("_rev", F.lit(True)), "vertex", "left")
        .select(
            "vertex",
            F.when(F.col("_core"), F.lit("core"))
            .when(F.col("_fwd").isNotNull(), F.lit("out"))
            .when(F.col("_rev").isNotNull(), F.lit("in"))
            .otherwise(F.lit("other"))
            .alias("cls"),
        )
    )
    e.unpersist()
    comp.unpersist()
    return out


def bowtie_summary(spark: SparkSession, edges: DataFrame, **kwargs) -> DataFrame:
    """(cls, n_vertices) — the four-number crawl-shape dashboard row."""
    return (
        bowtie_classes(spark, edges, **kwargs)
        .groupBy("cls")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
    )


_CLASSIFY_CTES = """
, assign AS (
  SELECT a.vertex, MIN(a.seen) AS component
  FROM fwd a JOIN fwd b ON b.vertex = a.seen AND b.seen = a.vertex
  GROUP BY a.vertex
)
, giant AS (
  SELECT component FROM (
    SELECT component, COUNT(*) AS n FROM assign GROUP BY component
    ORDER BY n DESC, component ASC LIMIT 1
  )
)
, core AS (
  SELECT vertex FROM assign WHERE component = (SELECT component FROM giant)
)
, classified AS (
  SELECT
    v.vertex,
    CASE
      WHEN v.vertex IN (SELECT vertex FROM core) THEN 'core'
      WHEN v.vertex IN (
        SELECT f.seen FROM fwd f JOIN core c ON f.vertex = c.vertex
      ) THEN 'out'
      WHEN v.vertex IN (
        SELECT f.vertex FROM fwd f JOIN core c ON f.seen = c.vertex
      ) THEN 'in'
      ELSE 'other'
    END AS cls
  FROM dverts v
)"""


def directed_graph_stats(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """One-row crawl-shape dashboard for a directed link graph:

    (n_vertices, n_edges, n_reciprocal, reciprocity, n_sources, n_sinks)

    - n_reciprocal: ordered edges whose reverse also exists (2 per mutual
      pair); reciprocity = n_reciprocal / n_edges (Garlaschelli & Loffredo's
      raw r) — high on social graphs, low on crawls.
    - n_sources / n_sinks: vertices with no in-edge / no out-edge — the
      tendril feedstock the bow-tie's trim phase peels.

    Scale posture: one self-join keyed on (src, dst) vs the transpose plus
    flat distinct-aggregates; no driver state beyond the 1-row result.
    """
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .distinct()
        .cache()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    n_edges = e.count()
    n_recip = e.join(rev, ["src", "dst"], "left_semi").count()
    srcs = e.select(F.col("src").alias("vertex")).distinct()
    dsts = e.select(F.col("dst").alias("vertex")).distinct()
    n_src_only = srcs.join(dsts, "vertex", "left_anti").count()
    n_dst_only = dsts.join(srcs, "vertex", "left_anti").count()
    n_both = srcs.join(dsts, "vertex", "left_semi").count()
    e.unpersist()
    return spark.createDataFrame(
        [
            (
                n_src_only + n_dst_only + n_both,
                n_edges,
                n_recip,
                (n_recip / n_edges) if n_edges else None,
                n_src_only,
                n_dst_only,
            )
        ],
        "n_vertices long, n_edges long, n_reciprocal long, "
        "reciprocity double, n_sources long, n_sinks long",
    )


def directed_graph_stats_oracle_sql(edges_cte: str) -> str:
    """Same six numbers from the deduped loop-free edge table."""
    return (
        edges_cte
        + """
, dedges AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst)
, srcs AS (SELECT DISTINCT src AS vertex FROM dedges)
, dsts AS (SELECT DISTINCT dst AS vertex FROM dedges)
SELECT
  (SELECT COUNT(*) FROM (SELECT vertex FROM srcs UNION SELECT vertex FROM dsts))::BIGINT
    AS n_vertices,
  (SELECT COUNT(*) FROM dedges)::BIGINT AS n_edges,
  (SELECT COUNT(*) FROM dedges e
     WHERE EXISTS (SELECT 1 FROM dedges r WHERE r.src = e.dst AND r.dst = e.src))::BIGINT
    AS n_reciprocal,
  (SELECT COUNT(*) FROM dedges e
     WHERE EXISTS (SELECT 1 FROM dedges r WHERE r.src = e.dst AND r.dst = e.src))
    / (SELECT COUNT(*) FROM dedges)::DOUBLE AS reciprocity,
  (SELECT COUNT(*) FROM srcs WHERE vertex NOT IN (SELECT vertex FROM dsts))::BIGINT
    AS n_sources,
  (SELECT COUNT(*) FROM dsts WHERE vertex NOT IN (SELECT vertex FROM srcs))::BIGINT
    AS n_sinks
"""
    )


def bowtie_oracle_sql(edges_cte: str) -> str:
    """Per-vertex bow-tie classes over the shared SCC closure CTEs
    (scc.closure_ctes): the giant SCC from the mutual-reachability
    assignment, out/in from the `fwd` closure joined against the core."""
    return (
        scc.closure_ctes(edges_cte)
        + _CLASSIFY_CTES
        + """
SELECT vertex, cls FROM classified ORDER BY vertex
"""
    )


def bowtie_summary_oracle_sql(edges_cte: str) -> str:
    """Class histogram over the same classification chain."""
    return (
        scc.closure_ctes(edges_cte)
        + _CLASSIFY_CTES
        + """
SELECT cls, COUNT(*)::BIGINT AS n_vertices
FROM classified GROUP BY cls ORDER BY cls
"""
    )
