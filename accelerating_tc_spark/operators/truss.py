"""k-truss decomposition: the edge-level analog of k-core.

The k-truss is the maximal subgraph in which every edge closes at least
k-2 triangles WITHIN the subgraph (Cohen 2008 — public definition). The
reference has vertex peeling (A-direction / k-core); this extends the
family to edge peeling over the same DataFrame spine.

Algorithm (synchronous peel to fixpoint): each round computes every
remaining edge's support |N(u) ∩ N(v)| with one adjacency build + two
joins + array_intersect (all JVM-side), drops edges below k-2, and
re-checks. Rounds ≤ peel depth (small in practice); each round's cost is
one shuffle on the vertex key plus the wedge-bounded intersect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import prep


def edge_support(canonical: DataFrame) -> DataFrame:
    """(src, dst, support): triangles through each canonical edge."""
    sym = prep.symmetrize(canonical)
    adj = sym.groupBy("src").agg(F.sort_array(F.collect_set("dst")).alias("nbrs"))
    a_u = adj.withColumnRenamed("nbrs", "nbrs_u")
    a_v = adj.select(F.col("src").alias("dst"), F.col("nbrs").alias("nbrs_v"))
    return (
        canonical.join(a_u, "src")
        .join(a_v, "dst")
        .select(
            "src",
            "dst",
            F.size(F.array_intersect("nbrs_u", "nbrs_v")).alias("support"),
        )
    )


def ktruss(
    spark: SparkSession,
    canonical: DataFrame,
    k: int,
    max_rounds: int = 100,
) -> DataFrame:
    """Canonical edges of the k-truss (fixpoint of support-based peeling)."""
    if k < 3:
        return canonical
    current = canonical.localCheckpoint(eager=True)
    n_current = current.count()
    for _ in range(max_rounds):
        if n_current == 0:
            break
        kept = (
            edge_support(current)
            .where(F.col("support") >= k - 2)
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        n_kept = kept.count()
        if n_kept == n_current:
            return kept
        current, n_current = kept, n_kept
    return current


def truss_numbers(
    spark: SparkSession, canonical: DataFrame, max_k: int = 64
) -> DataFrame:
    """(src, dst, truss): the largest k for which the edge survives in the
    k-truss (>= 2 for every edge). Computed by successive peels — each k
    level starts from the previous level's survivors, so total work is the
    peel cascade, not max_k independent runs."""
    remaining = canonical.localCheckpoint(eager=True)
    labeled: list[DataFrame] = []
    k = 3
    while k <= max_k and remaining.limit(1).count() > 0:
        survivors = ktruss(spark, remaining, k)
        dropped = remaining.join(survivors, ["src", "dst"], "left_anti")
        labeled.append(dropped.select("src", "dst", F.lit(k - 1).cast("long").alias("truss")))
        remaining = survivors
        k += 1
    if remaining.limit(1).count() > 0:
        labeled.append(
            remaining.select("src", "dst", F.lit(k - 1).cast("long").alias("truss"))
        )
    out = labeled[0]
    for df in labeled[1:]:
        out = out.unionAll(df)
    return out
