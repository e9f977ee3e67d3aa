"""Labeled subgraph matching — iterative candidate joins (WCOJ-style).

Spark realization of the reference's subgraph matcher
(vertex_ordering/other_order/src/org_subgraph_match.cpp:73-199, SURVEY.md
J8/G9): embeddings of a small labeled query graph Q in the data graph.

Plan shape: bind query vertices one at a time in a greedy order (most-
constrained first — fewest candidate vertices, like the reference's
label-frequency order `gen_join_order`); each binding step is
- a label-filtered candidate join through a data edge touching an
  already-bound neighbor (the reference's candidate-list intersection
  becomes join + left_semi constraints),
- left_semi edge-existence joins for every OTHER bound neighbor,
- injectivity filters (all bound vertices distinct).

Data graph edges are the symmetrized table (matching is on the undirected
graph); embeddings count automorphism-inclusively, exactly like the
reference (it reports raw embedding counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import prep


def subgraph_match_count(
    edges_raw: DataFrame,
    vertex_labels: DataFrame,  # (vertex, label)
    query_labels: dict[int, int],  # query vertex -> required label
    query_edges: list[tuple[int, int]],  # query adjacency (undirected)
) -> DataFrame:
    """1-row DataFrame (embeddings: long): number of label-preserving
    embeddings of the query graph (injective on vertices)."""
    canonical = prep.canonicalize_edges(edges_raw)
    sym = prep.symmetrize(canonical).cache()
    labels = vertex_labels.select("vertex", "label").cache()

    q_vertices = sorted(query_labels)
    nbrs: dict[int, list[int]] = {q: [] for q in q_vertices}
    for a, b in query_edges:
        nbrs[a].append(b)
        nbrs[b].append(a)

    # candidate pool sizes per label -> greedy most-constrained-first order,
    # requiring connectivity to already-bound vertices (reference
    # gen_join_order picks rare labels first).
    label_counts = {r["label"]: r["n"] for r in labels.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    order: list[int] = []
    remaining = set(q_vertices)
    while remaining:
        connected = [q for q in remaining if any(n in order for n in nbrs[q])] or list(remaining)
        q = min(connected, key=lambda x: (label_counts.get(query_labels[x], 0), x))
        order.append(q)
        remaining.remove(q)

    first = order[0]
    emb = labels.where(F.col("label") == query_labels[first]).select(
        F.col("vertex").alias(f"q{first}")
    )
    for q in order[1:]:
        bound_nbrs = [n for n in nbrs[q] if n in order[: order.index(q)]]
        col = f"q{q}"
        if bound_nbrs:
            anchor = bound_nbrs[0]
            cand = sym.select(
                F.col("src").alias(f"q{anchor}"), F.col("dst").alias(col)
            )
            emb = emb.join(cand, f"q{anchor}")
        else:  # disconnected query component: cross join with the label pool
            pool = labels.where(F.col("label") == query_labels[q]).select(
                F.col("vertex").alias(col)
            )
            emb = emb.crossJoin(pool)
        # label constraint on the new vertex
        lab = labels.where(F.col("label") == query_labels[q]).select(
            F.col("vertex").alias(col)
        )
        emb = emb.join(lab, col, "left_semi")
        # adjacency to every other bound neighbor
        for n in bound_nbrs[1:]:
            e = sym.select(F.col("src").alias(f"q{n}"), F.col("dst").alias(col))
            emb = emb.join(e, [f"q{n}", col], "left_semi")
        # injectivity
        for prev in order[: order.index(q)]:
            emb = emb.where(F.col(col) != F.col(f"q{prev}"))
    return emb.agg(F.count(F.lit(1)).cast("long").alias("embeddings"))


def subgraph_match_counts_from_file(
    spark,
    edges_raw: DataFrame,
    vertex_labels: DataFrame,
    path: str,
) -> DataFrame:
    """Run EVERY query in a reference `.sm.queries` file (the batch shape
    of sm.cpp's main loop, sm.cpp:60-112): one row (query_idx, embeddings)
    per query block. Queries are few and tiny by construction, so the
    driver-side loop mirrors the reference's sequential query loop; each
    count is a full distributed job. Ceiling: wall time is sequential in
    the number of query blocks — fine for reference-format files (a
    handful of blocks); a thousand-query batch should instead submit the
    per-query jobs from concurrent driver threads (Spark schedules them
    into one fair pool) or union the per-query plans."""
    from ..sources.io import load_query_graphs

    rows = []
    for i, (qlabels, qedges) in enumerate(load_query_graphs(path)):
        n = subgraph_match_count(edges_raw, vertex_labels, qlabels, qedges).first()[
            "embeddings"
        ]
        rows.append((i, int(n)))
    return spark.createDataFrame(rows, "query_idx int, embeddings long")


def subgraph_match_oracle_sql(
    edges_cte: str,
    labels_cte: str,
    query_labels: dict[int, int],
    query_edges: list[tuple[int, int]],
) -> str:
    """Equivalent ANSI SQL: one labels-join per query vertex, one sym-edge
    join per query edge, pairwise inequality for injectivity.

    `edges_cte` must define `edges(src,dst)` canonical; `labels_cte` must
    continue the WITH list defining `vlabels(vertex, label)`.
    """
    qs = sorted(query_labels)
    froms = [f"vlabels l{q}" for q in qs]
    conds = [f"l{q}.label = {query_labels[q]}" for q in qs]
    for i, (a, b) in enumerate(query_edges):
        froms.append(f"sym e{i}")
        conds.append(f"e{i}.src = l{a}.vertex AND e{i}.dst = l{b}.vertex")
    for i, a in enumerate(qs):
        for b in qs[i + 1 :]:
            conds.append(f"l{a}.vertex <> l{b}.vertex")
    return (
        edges_cte
        + labels_cte
        + """
, sym AS (
  SELECT src, dst FROM edges
  UNION ALL
  SELECT dst AS src, src AS dst FROM edges
)
SELECT COUNT(*)::BIGINT AS embeddings
FROM """
        + ", ".join(froms)
        + "\nWHERE "
        + "\n  AND ".join(conds)
    )
