"""Link prediction over the undirected graph — common-neighbor counts,
Adamic–Adar, and neighborhood-Jaccard scores for NON-adjacent vertex pairs.

The reference engine stops at counting closed wedges (triangles, tc.cu);
the open wedges it discards on the way are exactly the link-prediction
candidates a web/link-graph pipeline ranks ("pages that share many
neighbors but don't link yet"). This operator keeps them, scoring with the
public classics (Adamic–Adar 2003; Liben-Nowell & Kleinberg CIKM'03).

Semantics (exact, mirrored 1:1 by the SQL oracle):

- Candidate pairs are u < v at distance exactly 2: at least ``min_common``
  common neighbors and NO edge u–v.
- ``common_cnt`` = |N(u) ∩ N(v)| (integer — the selection predicate, so
  the returned row SET is integer-exact, never float-boundary-dependent).
- ``aa_score`` = Σ_w 1/ln(deg(w)) over common neighbors w (every wedge
  center has deg ≥ 2, so ln(deg) ≥ ln 2 > 0), rounded to 6 dp.
- ``jaccard`` = common_cnt / (deg(u) + deg(v) − common_cnt), rounded.
- ``max_center_degree``: optional wedge-center degree cap. Hub centers
  generate deg(w)² candidate pairs while contributing the least signal
  (1/ln(deg) → 0) — capping is the standard quadratic-blowup control at
  scale and, when set, is part of the declared semantics on BOTH sides
  (the bounded-horizon-BFS discipline, operators/bfs.py).

Scale posture: one wedge self-join keyed on the center vertex (the same
shuffle key family as the TC edge-iterator, triangles.py), partial-agg
counts/sums on (u, v), then a broadcast-size degree join and an anti-join
against the edge table. No driver loop, no UDF, no global sort — callers
order/limit the result. The quadratic term is Σ deg(w)² over centers,
bounded by max_center_degree exactly where a 100 TB run needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def common_neighbor_scores(
    edges: DataFrame,
    min_common: int = 2,
    max_center_degree: int | None = None,
) -> DataFrame:
    """(u, v, common_cnt, aa_score, jaccard) for non-adjacent pairs u < v
    with ≥ min_common common neighbors in the undirected graph given by a
    canonical (src < dst) edge table. Degrees count the FULL adjacency,
    independent of any center cap."""
    canon = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").cast("long").alias("a"),
            F.greatest("src", "dst").cast("long").alias("b"),
        )
        .distinct()
    )
    adj = canon.select(F.col("a").alias("vertex"), F.col("b").alias("nbr")).unionByName(
        canon.select(F.col("b").alias("vertex"), F.col("a").alias("nbr"))
    )
    deg = adj.groupBy("vertex").agg(F.count(F.lit(1)).alias("deg"))

    centers = adj.select(F.col("nbr").alias("w"), F.col("vertex").alias("leaf")).join(
        deg.select(F.col("vertex").alias("w"), F.col("deg").alias("deg_w")), "w"
    )
    if max_center_degree is not None:
        centers = centers.where(F.col("deg_w") <= max_center_degree)
    lhs = centers.select("w", F.col("leaf").alias("u"), "deg_w")
    rhs = centers.select("w", F.col("leaf").alias("v"))
    wedges = lhs.join(rhs, "w").where(F.col("u") < F.col("v"))

    scored = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("common_cnt"),
        F.sum(F.lit(1.0) / F.log("deg_w")).alias("aa_raw"),
    )
    # distance exactly 2: drop pairs that are already edges
    open_pairs = scored.join(
        canon.select(F.col("a").alias("u"), F.col("b").alias("v")), ["u", "v"], "left_anti"
    ).where(F.col("common_cnt") >= min_common)

    du = deg.select(F.col("vertex").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("vertex").alias("v"), F.col("deg").alias("deg_v"))
    return (
        open_pairs.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "common_cnt",
            F.round("aa_raw", 6).alias("aa_score"),
            F.round(
                F.col("common_cnt") / (F.col("deg_u") + F.col("deg_v") - F.col("common_cnt")),
                6,
            ).alias("jaccard"),
        )
    )


def common_neighbor_scores_oracle_sql(
    edges_cte: str, min_common: int = 2, max_center_degree: int | None = None
) -> str:
    """Same wedge/degree/anti-join pipeline in ANSI SQL (DuckDB LN is the
    natural log, matching Spark F.log's default base e)."""
    cap = f"WHERE deg_w <= {max_center_degree}" if max_center_degree is not None else ""
    return (
        edges_cte
        + f"""
, canon AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges WHERE src <> dst
)
, adj AS (
  SELECT a AS vertex, b AS nbr FROM canon
  UNION ALL SELECT b AS vertex, a AS nbr FROM canon
)
, deg AS (SELECT vertex, COUNT(*)::BIGINT AS deg FROM adj GROUP BY vertex)
, centers AS (
  SELECT adj.nbr AS w, adj.vertex AS leaf, deg.deg AS deg_w
  FROM adj JOIN deg ON deg.vertex = adj.nbr {cap}
)
, scored AS (
  SELECT l.leaf AS u, r.leaf AS v,
         COUNT(*)::BIGINT AS common_cnt,
         SUM(1.0 / LN(l.deg_w)) AS aa_raw
  FROM centers l JOIN centers r ON l.w = r.w AND l.leaf < r.leaf
  GROUP BY l.leaf, r.leaf
)
SELECT s.u, s.v, s.common_cnt,
       ROUND(s.aa_raw, 6) AS aa_score,
       ROUND(s.common_cnt / (du.deg + dv.deg - s.common_cnt), 6) AS jaccard
FROM scored s
JOIN deg du ON du.vertex = s.u
JOIN deg dv ON dv.vertex = s.v
WHERE s.common_cnt >= {min_common}
  AND NOT EXISTS (SELECT 1 FROM canon c WHERE c.a = s.u AND c.b = s.v)
ORDER BY s.u, s.v
"""
    )
