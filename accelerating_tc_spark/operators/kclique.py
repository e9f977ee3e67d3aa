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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import prep


def kclique_count(edges_raw: DataFrame, k: int, orient: str = "degree") -> DataFrame:
    """1-row DataFrame (cliques: long) — exact count of k-cliques.

    orient='degree' bounds the join fan-out (the reference's reason for
    A-direction); 'id' matches the plain SQL oracle. Counts are identical.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    canonical = prep.canonicalize_edges(edges_raw)
    oriented = (
        prep.orient_by_degree(canonical) if orient == "degree" else canonical
    ).cache()

    emb = oriented.select(F.col("src").alias("v1"), F.col("dst").alias("v2"))
    for level in range(3, k + 1):
        last = f"v{level - 1}"
        new = f"v{level}"
        # candidates: forward neighbors of the last member
        ext = oriented.select(F.col("src").alias(last), F.col("dst").alias(new))
        emb = emb.join(ext, last)
        # w must also be a forward neighbor of every earlier member
        for j in range(1, level - 1):
            ej = oriented.select(F.col("src").alias(f"v{j}"), F.col("dst").alias(new))
            emb = emb.join(ej, [f"v{j}", new], "left_semi")
    return emb.agg(F.count(F.lit(1)).cast("long").alias("cliques"))


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
