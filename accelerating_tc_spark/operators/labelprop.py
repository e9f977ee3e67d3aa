"""Synchronous label propagation supersteps (north-star addition).

label_{t+1}(v) = the smallest label among the most frequent labels of v's
neighbors (deterministic tie-break: count DESC, label ASC — so runs are
reproducible and the unrolled SQL oracle matches exactly). Vertices keep
their label when they have no neighbors. Fixed round count for determinism
(synchronous LP need not converge — it can 2-cycle on bipartite structures).

Each round: one join (labels onto edge endpoints), one count agg, one
window argmax — all standard shuffles on the vertex key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import prep, supersteps


def label_propagation_run(
    spark: SparkSession,
    canonical: DataFrame,
    n_iterations: int = 5,
    checkpoint_dir: str | None = None,
) -> "supersteps.SuperstepRun":
    """Full SuperstepRun (state + per-round lineage metrics); `run.state`
    is (vertex, label) after n_iterations of synchronous min-mode
    propagation. In unmetered fixed-round mode the wall of lazy rounds
    lands on the next lineage-cut round."""
    n_part = spark.sparkContext.defaultParallelism
    sym = prep.symmetrize(canonical).repartition(n_part, "src").cache()
    init = sym.select(F.col("src").alias("vertex")).distinct().select(
        "vertex", F.col("vertex").alias("label")
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        nbr_labels = (
            sym.join(state, sym["src"] == state["vertex"])
            .select(F.col("dst").alias("vertex"), "label")
            .groupBy("vertex", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # argmax by (cnt DESC, label ASC) as a plain hash aggregate:
        # max(struct(cnt, -label)) — no sort-window over the (vertex,
        # label) table (early rounds have ~|E| such rows; a partitioned
        # row_number sorts them all). Every vertex of the symmetrized
        # graph receives neighbor labels, so this yields one row per
        # vertex — no keep-own-label left join needed either (the
        # oracle's COALESCE branch is never taken without isolated
        # vertices).
        return nbr_labels.groupBy("vertex").agg(
            (-F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))).getField("nl")).alias("label")
        )

    run = supersteps.iterate(
        spark,
        init,
        step,
        max_iterations=n_iterations,
        checkpoint_dir=checkpoint_dir,
        # fixed-round unmetered mode: lineage cut every 2 rounds
        checkpoint_every=2,
    )
    return supersteps.finalize(run, sym)


def label_propagation(
    spark: SparkSession,
    canonical: DataFrame,
    n_iterations: int = 5,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(vertex, label) after n_iterations of synchronous min-mode propagation."""
    return label_propagation_run(
        spark, canonical, n_iterations=n_iterations, checkpoint_dir=checkpoint_dir
    ).state


def label_propagation_oracle_sql(edges_cte: str, n_iterations: int = 5) -> str:
    """Unrolled SQL with the identical deterministic tie-break."""
    parts = [
        edges_cte,
        """
, sym AS (
  SELECT src, dst FROM edges
  UNION ALL
  SELECT dst AS src, src AS dst FROM edges
)
, verts AS (SELECT DISTINCT src AS vertex FROM sym)
, lp0 AS (SELECT vertex, vertex AS label FROM verts)
""",
    ]
    for i in range(1, n_iterations + 1):
        parts.append(
            f"""
, lp{i} AS (
  SELECT v.vertex, COALESCE(b.new_label, p.label) AS label
  FROM verts v
  JOIN lp{i - 1} p ON p.vertex = v.vertex
  LEFT JOIN (
    SELECT vertex, label AS new_label FROM (
      SELECT e.dst AS vertex, p2.label,
             ROW_NUMBER() OVER (
               PARTITION BY e.dst
               ORDER BY COUNT(*) DESC, p2.label ASC
             ) AS rn
      FROM sym e JOIN lp{i - 1} p2 ON p2.vertex = e.src
      GROUP BY e.dst, p2.label
    ) WHERE rn = 1
  ) b ON b.vertex = v.vertex
)"""
        )
    parts.append(f"\nSELECT vertex, label FROM lp{n_iterations} ORDER BY vertex")
    return "".join(parts)
