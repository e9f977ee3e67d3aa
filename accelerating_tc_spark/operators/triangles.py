"""Exact triangle counting — four physical strategies over one logical plan.

The logical plan everywhere: orient edges into a DAG (low-degree -> high-degree,
prep.orient_by_degree), then for each oriented edge (u, v) count
|N+(u) ∩ N+(v)|; the global sum is the triangle count. This mirrors the
reference's single logical join realized by many kernels (SURVEY.md §2.3):

- `triangle_count_join`        : pure 3-way self-join (the reference's
  cross-implementation agreement oracle; also what the DuckDB oracle runs).
- `triangle_count_array_intersect` : adjacency join + built-in
  F.array_intersect — stays fully JVM-side / whole-stage codegen.
- `triangle_count_kernel`      : adjacency join + Arrow-batched numpy merge
  kernel (reference J1/J2, org_triangle_count.cpp:56-86 + Hu/tc.cu:69-201).
- `triangle_count_blocked`     : bounded-shuffle block-pair cogroup with
  per-shard CSR built in numpy (reference J6, TriCore
  tricore/src/tricount_gpu.cu:337-408) — the 100 TB path.

All variants return a 1-row DataFrame with column `triangles: long`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..functions.csr import CsrShard, intersect_count_csr
from ..functions.intersect import intersect_count_pairs
from ..plans.blocking import replicate_adjacency, tag_edge_blocks
from . import prep


def _as_long_result(df: DataFrame) -> DataFrame:
    return df.select(F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"))


def triangle_count_join(oriented: DataFrame) -> DataFrame:
    """3-way self-join: (u,v),(v,w),(u,w) each counted once on the DAG.

    Catalyst plans this as two shuffled hash/sort-merge joins; it is the
    independent oracle the other variants must agree with (the reference's
    cross-implementation agreement posture, SURVEY.md §5).
    """
    e1 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e2 = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    e3 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    tri = e1.join(e2, "v").join(e3, ["u", "w"])
    return _as_long_result(tri.agg(F.count(F.lit(1)).alias("triangles")))


def triangle_count_array_intersect(oriented: DataFrame) -> DataFrame:
    """Wedge join with built-in array_intersect — no Python anywhere."""
    adj = prep.adjacency(oriented)
    a_u = adj.withColumnRenamed("nbrs", "nbrs_u")
    a_v = adj.select(F.col("src").alias("dst"), F.col("nbrs").alias("nbrs_v"))
    per_edge = (
        oriented.join(a_u, "src")
        .join(a_v, "dst")
        .select(F.size(F.array_intersect("nbrs_u", "nbrs_v")).alias("c"))
    )
    return _as_long_result(per_edge.agg(F.sum("c").alias("triangles")))


_COUNT_SCHEMA = StructType([StructField("triangles", LongType())])


def triangle_count_kernel(oriented: DataFrame) -> DataFrame:
    """Wedge join + Arrow-batched numpy merge-intersect kernel.

    The join is identical to array_intersect's; the count runs in the
    batch-encoded intersect (one intersect1d per Arrow batch), the Spark
    analog of the warp merge kernels (tricore warp_intersection_kernel,
    tricount_gpu.cu:291-334).
    """
    adj = prep.adjacency(oriented)
    a_u = adj.withColumnRenamed("nbrs", "nbrs_u")
    a_v = adj.select(F.col("src").alias("dst"), F.col("nbrs").alias("nbrs_v"))
    joined = oriented.join(a_u, "src").join(a_v, "dst").select("nbrs_u", "nbrs_v")

    @F.pandas_udf("long")
    def isect_count(a: pd.Series, b: pd.Series) -> pd.Series:
        counts = intersect_count_pairs(
            [np.asarray(x, dtype=np.int64) for x in a],
            [np.asarray(x, dtype=np.int64) for x in b],
        )
        return pd.Series(counts)

    per_edge = joined.select(isect_count("nbrs_u", "nbrs_v").alias("c"))
    return _as_long_result(per_edge.agg(F.sum("c").alias("triangles")))


def triangle_count_blocked(oriented: DataFrame, n_blocks: int = 8) -> DataFrame:
    """Bounded-shuffle block-pair triangle count (the at-scale strategy).

    Vertices hash into n_blocks; each cogrouped task receives the edges of
    one (bu, bv) block pair plus exactly the two adjacency shards it needs
    as FLAT (vertex, nbr) int64 rows (columnar end-to-end), rebuilds the
    shard CSR with one numpy lexsort, and runs the batch merge kernel.
    Shuffle volume: |edges| + 2·n_blocks·|edges| — independent of the wedge
    count, unlike the per-edge array join, and every task's working set is
    ~2/n_blocks of the adjacency. n_blocks is the `cal_part_num` analog
    (reference tricount_gpu.cu:103-115): grow it with data size so a shard
    pair always fits an executor.
    """
    import pyarrow as pa

    edges_b = tag_edge_blocks(oriented, n_blocks)
    adj = prep.adjacency(oriented)  # per-vertex sorted arrays, built ONCE
    adj_rep = replicate_adjacency(adj, n_blocks)

    def count_pair(edges_t: "pa.Table", adj_t: "pa.Table") -> "pa.Table":
        if edges_t.num_rows == 0 or adj_t.num_rows == 0:
            return pa.table({"triangles": pa.array([0], type=pa.int64())})
        # zero-copy CSR: Arrow list buffers ARE the flat array + spans;
        # only the vertex column gets argsorted (no per-pair value re-sort).
        shard = CsrShard.from_arrow_lists(
            adj_t.column("vertex").to_numpy(zero_copy_only=False),
            adj_t.column("nbrs"),
        )
        counts = intersect_count_csr(
            shard,
            edges_t.column("src").to_numpy(zero_copy_only=False),
            edges_t.column("dst").to_numpy(zero_copy_only=False),
        )
        return pa.table({"triangles": pa.array([int(counts.sum())], type=pa.int64())})

    partials = (
        edges_b.groupBy("bu", "bv")
        .cogroup(adj_rep.groupBy("bu", "bv"))
        .applyInArrow(count_pair, schema=_COUNT_SCHEMA)
    )
    return _as_long_result(partials.agg(F.sum("triangles").alias("triangles")))


def count_triangles(edges_raw: DataFrame, strategy: str = "blocked", n_blocks: int = 8) -> DataFrame:
    """End-to-end pipeline: clean -> degree-orient -> count with the chosen strategy."""
    canonical = prep.canonicalize_edges(edges_raw)
    oriented = prep.orient_by_degree(canonical)
    if strategy == "join":
        return triangle_count_join(oriented)
    if strategy == "array_intersect":
        return triangle_count_array_intersect(oriented)
    if strategy == "kernel":
        return triangle_count_kernel(oriented)
    if strategy == "blocked":
        return triangle_count_blocked(oriented, n_blocks=n_blocks)
    raise ValueError(f"unknown strategy: {strategy}")


def per_vertex_triangle_counts(oriented: DataFrame) -> DataFrame:
    """(vertex, tri_cnt) — triangles incident to each vertex, via the same
    DAG join; every triangle (u,v,w) credits all three corners."""
    e1 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e2 = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    e3 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    tri = e1.join(e2, "v").join(e3, ["u", "w"])
    corners = tri.select(F.explode(F.array("u", "v", "w")).alias("vertex"))
    return corners.groupBy("vertex").agg(F.count(F.lit(1)).alias("tri_cnt"))
