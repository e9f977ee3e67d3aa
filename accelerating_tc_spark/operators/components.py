"""Connected components: iterative min-id propagation supersteps.

comp_{t+1}(v) = min(comp_t(v), min over neighbors comp_t(u)); exact
component ids at the fixpoint (the id of each component's smallest vertex),
matching the north rule's "component IDs exact". Rounds ~ graph diameter;
every round is one shuffle-join + one groupBy — both on the same vertex
key, so the exchange is reused. State checkpoints via the superstep spine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import prep, supersteps


def connected_components(
    spark: SparkSession,
    canonical: DataFrame,
    max_iterations: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(vertex, component) with component = min vertex id in the component."""
    n_part = spark.sparkContext.defaultParallelism
    sym = prep.symmetrize(canonical).repartition(n_part, "src").cache()
    init = sym.select(F.col("src").alias("vertex")).distinct().select(
        "vertex", F.col("vertex").alias("component")
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        nbr_min = (
            sym.join(state, sym["src"] == state["vertex"])
            .select(F.col("dst").alias("vertex"), F.col("component").alias("nbr_comp"))
            .groupBy("vertex")
            .agg(F.min("nbr_comp").alias("nbr_comp"))
        )
        return state.join(nbr_min, "vertex", "left").select(
            "vertex", F.least("component", F.coalesce("nbr_comp", "component")).alias("component")
        )

    def delta_fn(old: DataFrame, new: DataFrame) -> float:
        o = old.withColumnRenamed("component", "old_comp")
        changed = (
            new.join(o, "vertex").where(F.col("component") != F.col("old_comp")).count()
        )
        return float(changed)

    run = supersteps.iterate(
        spark,
        init,
        step,
        max_iterations=max_iterations,
        delta_fn=delta_fn,
        tolerance=0.0,
        checkpoint_dir=checkpoint_dir,
    )
    return run.state


def components_oracle_sql(edges_cte: str) -> str:
    """Recursive-CTE oracle: component(v) = min vertex reachable from v.

    Correct for any graph; DuckDB's UNION (distinct) recursion converges
    because the walk state space is finite.
    """
    return (
        edges_cte
        + """
, sym AS (
  SELECT src, dst FROM edges
  UNION ALL
  SELECT dst AS src, src AS dst FROM edges
)
, verts AS (SELECT DISTINCT src AS vertex FROM sym)
, walk AS (
  WITH RECURSIVE reach(vertex, seen) AS (
    SELECT vertex, vertex AS seen FROM verts
    UNION
    SELECT r.vertex, e.dst AS seen
    FROM reach r JOIN sym e ON e.src = r.seen
  )
  SELECT vertex, MIN(seen) AS component FROM reach GROUP BY vertex
)
SELECT vertex, component FROM walk ORDER BY vertex
"""
    )
