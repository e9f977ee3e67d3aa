"""Maximal clique enumeration — per-seed local Bron-Kerbosch inside
applyInPandas (the Spark idiom SURVEY.md J9 prescribes for recursion-shaped
operators).

Decomposition: on the degree-oriented DAG, every maximal clique C has a
unique minimum vertex v (in orientation order), and C \\ {v} lies entirely
inside N+(v). So each task enumerates the maximal cliques of the subgraph
induced on {v} ∪ N+(v) that (a) contain v and (b) have no earlier common
neighbor (maximality against the full graph). The per-seed induced subgraph
is bounded by outdeg(v)^2 — the orientation bounds task size exactly as it
bounds wedge counts (reference degeneracy-order BK,
org_maximal_clique.cpp:76-130).

Each seed task receives (v, its forward adjacency, and the adjacency OF
those forward neighbors restricted to N+(v) ∪ N-(v)∩earlier... ) — here we
ship, per seed v: candidate set P = N+(v), exclusion set X = N(v) \\ N+(v),
and the full neighbor sets of every u ∈ N(v) (to test adjacency inside the
local search). Local recursion is pure Python over numpy sets — fine,
because each task's universe is one vertex's neighborhood.
"""

from __future__ import annotations

import numpy as np
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
    """(seed, clique array<long>) — every maximal clique exactly once
    (anchored at its orientation-minimal vertex). Isolated-vertex 'cliques'
    of size 1 are included for vertices with no edges only if they appear in
    the edge table (they don't, by construction) — size >= 2 in practice."""
    canonical = prep.canonicalize_edges(edges_raw)
    oriented = prep.orient_by_degree(canonical)
    sym = prep.symmetrize(canonical)

    # seed -> its undirected neighborhood and forward neighborhood
    fwd = oriented.groupBy(F.col("src").alias("seed")).agg(
        F.sort_array(F.collect_set("dst")).alias("fwd")
    )
    und = sym.groupBy(F.col("src").alias("seed")).agg(
        F.sort_array(F.collect_set("dst")).alias("nbrs")
    )
    # adjacency rows needed by a seed's task: the neighbor sets of each of
    # its neighbors — ship as (seed, member, member_nbrs)
    member_adj = (
        sym.select(F.col("src").alias("seed"), F.col("dst").alias("member"))
        .join(und.select(F.col("seed").alias("member"), F.col("nbrs").alias("member_nbrs")), "member")
    )
    grouped = (
        fwd.join(und, "seed")
        .join(
            member_adj.groupBy("seed").agg(
                F.collect_list(F.struct("member", "member_nbrs")).alias("member_adj")
            ),
            "seed",
        )
    )

    def enumerate_seed(pdf: pd.DataFrame) -> pd.DataFrame:
        rows_out: list[tuple[int, list[int]]] = []
        for _, row in pdf.iterrows():
            seed = int(row["seed"])
            nbrs_all = set(int(x) for x in row["nbrs"])
            fwd_set = set(int(x) for x in row["fwd"]) if row["fwd"] is not None else set()
            adj: dict[int, set] = {}
            for entry in row["member_adj"]:
                adj[int(entry["member"])] = set(int(x) for x in entry["member_nbrs"])
            adj[seed] = nbrs_all
            # local universe: restrict neighbor sets to the closed neighborhood
            universe = nbrs_all | {seed}
            for k in list(adj):
                adj[k] = adj[k] & universe
            P = set(fwd_set)
            X = nbrs_all - fwd_set
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
