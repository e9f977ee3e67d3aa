"""Maximal clique enumeration — per-seed local Bron-Kerbosch inside
applyInPandas (the Spark idiom SURVEY.md J9 prescribes for recursion-shaped
operators; reference degeneracy-order BK, org_maximal_clique.cpp:76-130).

Decomposition: on the degree-oriented DAG, every maximal clique C has a
unique minimum vertex v (in orientation order), and C \\ {v} lies entirely
inside N+(v). Each seed task enumerates the maximal cliques containing v
with candidates P = N+(v) and exclusion set X ⊆ N(v) \\ N+(v).

Scale posture (what each seed task is shipped):
- P-members u carry N(u) ∩ N(v)      (≤ the u-v co-neighborhood),
- X-members x carry N(x) ∩ N+(v)     (≤ outdeg(v), orientation-bounded),
- X-members with an EMPTY forward intersection are dropped JVM-side: they
  can never suppress a reported clique (every reported clique contains a
  member of N+(v), which such an x is not adjacent to).
All intersections run JVM-side (array_intersect) BEFORE the per-seed
collect_list, so a hub seed ships O(Σ co-neighborhood sizes), not
O(Σ full neighbor lists) — no single-task blow-up on skewed graphs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from . import prep


def _bron_kerbosch_pivot(R: frozenset, P: set, X: set, adj: dict, out: list) -> None:
    if not P and not X:
        out.append(sorted(R))
        return
    pivot_pool = P | X
    pivot = max(pivot_pool, key=lambda u: len(P & adj[u]))
    for v in list(P - adj[pivot]):
        _bron_kerbosch_pivot(R | {v}, P & adj[v], X & adj[v], adj, out)
        P.remove(v)
        X.add(v)


_MC_SCHEMA = StructType(
    [
        StructField("seed", LongType()),
        StructField("clique", ArrayType(LongType())),
    ]
)


def maximal_cliques(edges_raw: DataFrame) -> DataFrame:
    """(seed, clique array<long>) — every maximal clique of size >= 2 exactly
    once, anchored at its orientation-minimal vertex."""
    canonical = prep.canonicalize_edges(edges_raw)
    oriented = prep.orient_by_degree(canonical)
    sym = prep.symmetrize(canonical)

    fwd = oriented.groupBy(F.col("src").alias("seed")).agg(
        F.sort_array(F.collect_set("dst")).alias("fwd")
    )
    und = sym.groupBy(F.col("src").alias("seed")).agg(
        F.sort_array(F.collect_set("dst")).alias("nbrs")
    )
    # one row per (seed, member) with the member's PRE-INTERSECTED adjacency
    members = (
        sym.select(F.col("src").alias("seed"), F.col("dst").alias("member"))
        .join(
            und.select(F.col("seed").alias("member"), F.col("nbrs").alias("member_nbrs")),
            "member",
        )
        .join(fwd, "seed", "left")
        .join(und, "seed")
    )
    is_fwd = F.array_contains(F.coalesce("fwd", F.array().cast("array<long>")), F.col("member"))
    trimmed = F.array_intersect(
        "member_nbrs",
        F.when(is_fwd, F.col("nbrs")).otherwise(F.coalesce("fwd", F.array().cast("array<long>"))),
    )
    member_rows = members.select(
        "seed", "member", is_fwd.alias("is_fwd"), trimmed.alias("adj")
    ).where(F.col("is_fwd") | (F.size("adj") > 0))

    grouped = member_rows.groupBy("seed").agg(
        F.collect_list(F.struct("member", "is_fwd", "adj")).alias("m")
    )

    def enumerate_seed(pdf: pd.DataFrame) -> pd.DataFrame:
        rows_out: list[tuple[int, list[int]]] = []
        for seed, entries in zip(pdf["seed"], pdf["m"]):
            seed = int(seed)
            adj: dict[int, set] = {}
            P: set = set()
            X: set = set()
            for e in entries:
                m = int(e["member"])
                adj[m] = set(int(x) for x in e["adj"])
                (P if e["is_fwd"] else X).add(m)
            if not P:
                continue  # no forward neighbors -> no clique anchored here
            out: list[list[int]] = []
            _bron_kerbosch_pivot(frozenset({seed}), P, X, adj, out)
            for c in out:
                rows_out.append((seed, c))
        return pd.DataFrame(rows_out, columns=["seed", "clique"])

    return grouped.groupBy("seed").applyInPandas(enumerate_seed, schema=_MC_SCHEMA)


def maximal_clique_count(edges_raw: DataFrame) -> DataFrame:
    return maximal_cliques(edges_raw).agg(
        F.count(F.lit(1)).cast("long").alias("n_maximal_cliques")
    )


def save_cliques(cliques: DataFrame, path: str) -> None:
    """Clique listing sink (reference mc.cpp:53 `mc.save_answers(argv[2])`,
    format per bitpack_maximal_clique.cpp:318-330): one clique per line,
    space-separated member ids, members ascending. Distributed text write
    — no driver collect; lines are sorted within each partition so a given
    partitioning yields a deterministic file set."""
    (
        cliques.select(
            F.concat_ws(
                " ", F.transform(F.sort_array("clique"), lambda c: c.cast("string"))
            ).alias("line")
        )
        .sortWithinPartitions("line")
        .write.mode("overwrite")
        .text(path)
    )


def load_cliques(spark, path: str) -> DataFrame:
    """Inverse of save_cliques: (clique array<long>) rows."""
    return spark.read.text(path).select(
        F.transform(F.split(F.trim("value"), " "), lambda c: c.cast("long")).alias(
            "clique"
        )
    )


def maximal_clique_oracle_sql(edges_cte: str) -> str:
    """DuckDB recursive oracle: enumerate ALL cliques (each once, as a
    sorted member list grown through a neighbor of its max vertex — the
    neighbor join keeps the recursion O(Σ cliques · deg), not O(cliques · V)),
    keep those no outside vertex is adjacent to, count size >= 2."""
    return (
        edges_cte
        + """
, sym AS (
  SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges
), adj AS (
  SELECT src AS v, list(dst ORDER BY dst) AS nbrs FROM sym GROUP BY src
), cliques AS (
  WITH RECURSIVE cl(members, last) AS (
    SELECT [v], v FROM (SELECT DISTINCT src AS v FROM sym)
    UNION ALL
    SELECT list_append(c.members, a.v), a.v
    FROM cl c
    JOIN sym e ON e.src = c.last AND e.dst > c.last
    JOIN adj a ON a.v = e.dst AND list_has_all(a.nbrs, c.members)
  )
  SELECT members FROM cl
)
SELECT COUNT(*)::BIGINT AS n_maximal_cliques FROM cliques c
WHERE len(c.members) >= 2
  AND NOT EXISTS (
    SELECT 1 FROM sym e JOIN adj a ON a.v = e.dst
    WHERE e.src = c.members[1]
      AND NOT list_contains(c.members, a.v)
      AND list_has_all(a.nbrs, c.members)
  )
"""
    )
