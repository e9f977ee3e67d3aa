"""k-clique counting via iterative DAG extension joins.

Spark realization of the reference's level-expansion k-clique counter
(k-clique/kcl.cu:147-215, SURVEY.md G7/J7). The degree (or id) orientation
is a strict total order, so every k-clique has exactly one ordering with
all edges forward — each clique is generated once, no canonicalization
needed. Level i -> i+1 extends each embedding with a vertex w adjacent
(forward) to ALL current members: one join per prior member, all on the
(src, dst) edge key, which Catalyst executes as shuffled hash joins over
the same cached edge relation (the DataFrame analog of the reference's
`is_all_connected_dag` filter).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import prep


def _level_task_count(
    est_rows: int, parallelism: int, rows_per_task: int, max_tasks: int
) -> int:
    """Task count for one expansion level: enough tasks that the ESTIMATED
    expansion output stays under rows_per_task per task, floored at the
    core count and capped (scheduler overhead) at max_tasks."""
    need = math.ceil(est_rows / max(rows_per_task, 1))
    return max(parallelism, min(max_tasks, need))


def kclique_count(
    edges_raw: DataFrame,
    k: int,
    orient: str = "degree",
    rows_per_task: int = 2_000_000,
    max_tasks: int = 4096,
    stats: list | None = None,
) -> DataFrame:
    """1-row DataFrame (cliques: long) — exact count of k-cliques.

    orient='degree' bounds the join fan-out (the reference's reason for
    A-direction); 'id' matches the plain SQL oracle. Counts are identical.

    Level fan-out is BOUNDED the way the reference bounds it (kcl.cu
    chunks embeddings with a binary search so each chunk fits GPU memory,
    kcl.cu:163-181): before each expansion join the exact output size of
    the join is computed as sum(out_degree(last member)) — one cheap
    aggregate — and the embedding table is repartitioned on the join key
    into `_level_task_count` partitions, so per-task expansion output is
    ~rows_per_task regardless of how explosive the level is. Residual
    within-key skew (one hot last-member) is AQE skew-join territory —
    the session enables it; this sizing handles the BETWEEN-level growth
    AQE cannot anticipate (it plans from the previous level's sizes, not
    the expansion factor). `stats` (optional) receives one dict per level:
    {level, est_rows, n_tasks, max_task_rows} — max_task_rows is measured
    post-level and is the bounded-peak evidence in tests.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    canonical = prep.canonicalize_edges(edges_raw)
    oriented = (
        prep.orient_by_degree(canonical) if orient == "degree" else canonical
    ).cache()
    parallelism = edges_raw.sparkSession.sparkContext.defaultParallelism
    # forward-degree per source: the exact per-embedding expansion cost.
    # Carried on the DST side of every extension tuple so each embedding
    # knows its own next-level fan-out — level i's single materializing
    # action then yields level i+1's exact estimate as a byproduct, with no
    # separate estimate join job between levels (r5 verdict task 5).
    out_deg = oriented.groupBy("src").agg(F.count(F.lit(1)).alias("_od"))
    ext_base = (
        oriented.join(out_deg.withColumnRenamed("src", "dst"), "dst", "left")
        .select("src", "dst", F.coalesce("_od", F.lit(0)).alias("_od"))
        .cache()
    )

    emb = ext_base.select(
        F.col("src").alias("v1"), F.col("dst").alias("v2"), F.col("_od").alias("_odl")
    )
    if k == 2:
        return emb.agg(F.count(F.lit(1)).cast("long").alias("cliques"))
    # level-3 estimate: Σ out_degree(v2) over the (cached) edge table
    est = int(ext_base.agg(F.sum("_od")).first()[0] or 0)
    for level in range(3, k + 1):
        last = f"v{level - 1}"
        new = f"v{level}"
        n_tasks = _level_task_count(est, parallelism, rows_per_task, max_tasks)
        prev = emb
        emb = prev.drop("_odl").repartition(n_tasks, last)
        # candidates: forward neighbors of the last member, each tagged with
        # ITS forward degree (the next level's per-embedding expansion cost)
        ext = ext_base.select(
            F.col("src").alias(last), F.col("dst").alias(new), F.col("_od").alias("_odl")
        )
        emb = emb.join(ext, last)
        # w must also be a forward neighbor of every earlier member
        for j in range(1, level - 1):
            ej = oriented.select(F.col("src").alias(f"v{j}"), F.col("dst").alias(new))
            emb = emb.join(ej, [f"v{j}", new], "left_semi")
        emb = emb.persist()
        if level < k or stats is not None:
            # ONE action materializes the level and returns both the peak
            # per-task row count (bounded-fan-out evidence) and the next
            # level's exact expansion estimate
            row = (
                emb.groupBy(F.spark_partition_id().alias("pid"))
                .agg(F.count(F.lit(1)).alias("n"), F.sum("_odl").alias("s"))
                .agg(F.max("n").alias("peak"), F.sum("s").alias("est"))
                .first()
            )
            peak = int(row["peak"] or 0)
            next_est = int(row["est"] or 0)
            if stats is not None:
                stats.append(
                    {
                        "level": level,
                        "est_rows": est,
                        "n_tasks": n_tasks,
                        "max_task_rows": peak,
                    }
                )
            est = next_est
        if level > 3:
            prev.unpersist()
    out = emb.agg(F.count(F.lit(1)).cast("long").alias("cliques"))
    return out


def kclique_oracle_sql(edges_cte: str, k: int) -> str:
    """Equivalent ANSI SQL, level-wise like the Spark plan: each level CTE
    extends embeddings with a forward neighbor of the last member and
    equality-joins the adjacency constraint to every earlier member.
    Canonical (src < dst) edges make the ordering implicit — all-equality
    joins, no inequality blow-up."""
    parts = [edges_cte, ", lvl2 AS (SELECT src AS v1, dst AS v2 FROM edges)"]
    for lv in range(3, k + 1):
        cons = "\n".join(
            f"  JOIN edges c{j} ON c{j}.src = l.v{j} AND c{j}.dst = e.dst"
            for j in range(1, lv - 1)
        )
        cols = ", ".join(f"l.v{j}" for j in range(1, lv))
        parts.append(
            f""", lvl{lv} AS (
  SELECT {cols}, e.dst AS v{lv}
  FROM lvl{lv - 1} l
  JOIN edges e ON e.src = l.v{lv - 1}
{cons}
)"""
        )
    parts.append(f"\nSELECT COUNT(*)::BIGINT AS cliques FROM lvl{k}")
    return "".join(parts)
