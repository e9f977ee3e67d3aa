"""Bounded-shuffle 2D edge blocking + workload-balanced partitioning.

Spark analog of TriCore's memory-bounded partition-pair execution
(reference tricore/src/tricount_gpu.cu:103-115 `cal_part_num`,
:337-408 pair loop; SURVEY.md J6) and of the equal-work range scheduling
in Hu (`tc.cu:22-67,291-305`) / Fox workload bins (`tc.cu:18-33,234-331`).

Design: vertices hash into B blocks; every oriented edge (u,v) carries the
key (block(u), block(v)); the adjacency table is replicated once per role
per block-pair coordinate so a cogrouped applyInPandas task sees exactly
one shard pair — shuffle volume is 2B·|adj| + |edges| and each task's
working set is ~2/B of the adjacency, independent of total graph size.
That bounded replication IS the scale story: B grows with data size so a
task's shard always fits executor memory, mirroring `cal_part_num`.
Hash blocking (vs the reference's contiguous ranges) additionally spreads
degree skew across blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def block_of(col: str | F.Column, n_blocks: int) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.hash(c.cast("long")), F.lit(n_blocks)).cast("int")


def tag_edge_blocks(oriented: DataFrame, n_blocks: int) -> DataFrame:
    """Edges with their 2D block key (bu, bv)."""
    return oriented.select(
        "src",
        "dst",
        block_of("src", n_blocks).alias("bu"),
        block_of("dst", n_blocks).alias("bv"),
    )


def replicate_adjacency(adj: DataFrame, n_blocks: int) -> DataFrame:
    """Replicate adjacency rows to every block-pair coordinate that needs them.

    A vertex in block b serves as the u-side of pairs (b, *) and the v-side of
    pairs (*, b): 2·B copies per row — the bounded, pre-planned shuffle that
    replaces the per-pair device loads of the reference's pair loop.
    """
    blocks = F.sequence(F.lit(0), F.lit(n_blocks - 1))
    base = adj.select(F.col("src").alias("vertex"), "nbrs")
    as_u = base.select(
        "vertex", "nbrs", block_of("vertex", n_blocks).alias("bu"), F.explode(blocks).alias("bv")
    )
    # v-side skips the diagonal (already covered by the u-side) so no
    # distinct is needed.
    as_v = base.select(
        "vertex", "nbrs", F.explode(blocks).alias("bu"), block_of("vertex", n_blocks).alias("bv")
    ).where(F.col("bu") != F.col("bv"))
    return as_u.union(as_v)


def replicate_adjacency_flat(oriented: DataFrame, n_blocks: int) -> DataFrame:
    """FLAT adjacency replication: (vertex, nbr) int64 rows instead of array
    rows — the whole exchange stays columnar/JVM-side and the per-pair CSR is
    rebuilt with numpy sorts (zero per-row Python; input_hint invariant).

    A row owned by a vertex in block b is shipped to pairs (b, *) as the
    u-side shard and (*, b) as the v-side shard; the diagonal (b, b) is
    emitted once (v-side skips bu == b) so no distinct is needed.
    """
    blocks = F.sequence(F.lit(0), F.lit(n_blocks - 1))
    base = oriented.select(F.col("src").alias("vertex"), F.col("dst").alias("nbr"))
    b = block_of("vertex", n_blocks)
    as_u = base.select("vertex", "nbr", b.alias("bu"), F.explode(blocks).alias("bv"))
    as_v = base.select("vertex", "nbr", F.explode(blocks).alias("bu"), b.alias("bv")).where(
        F.col("bu") != F.col("bv")
    )
    return as_u.union(as_v)


def edge_workload(oriented: DataFrame, out_deg: DataFrame) -> DataFrame:
    """Per-edge work estimate (da + db - max)·log2(max + 2), reference Fox/tc.cu:18-33."""
    od_u = out_deg.withColumnRenamed("vertex", "src").withColumnRenamed("out_degree", "od_u")
    od_v = out_deg.withColumnRenamed("vertex", "dst").withColumnRenamed("out_degree", "od_v")
    with_deg = oriented.join(od_u, "src", "left").join(od_v, "dst", "left").fillna(
        0, subset=["od_u", "od_v"]
    )
    mx = F.greatest("od_u", "od_v")
    return with_deg.select(
        "src",
        "dst",
        ((F.col("od_u") + F.col("od_v") - mx) * F.log2(mx + F.lit(2))).alias("workload"),
    )


def workload_balanced(edges_with_workload: DataFrame, n_partitions: int) -> DataFrame:
    """Range-repartition edges on estimated workload so each task gets equal
    work, not equal rows (reference Hu/tc.cu:291-305 equal-work block ranges).

    `repartitionByRange` samples the workload column — Spark's built-in
    range-sample is the analog of the reference's prefix-sum binary search.
    """
    return edges_with_workload.repartitionByRange(n_partitions, "workload", "src")


def hub_vertices(deg: DataFrame, threshold: int) -> DataFrame:
    """Vertices whose degree exceeds the hub threshold (Bisson big-row path,
    reference Bisson/tc.cu:36-87). Used for salting/broadcast decisions."""
    return deg.where(F.col("degree") >= threshold).select("vertex", "degree")


def salt_edges_by_hub(oriented: DataFrame, hubs: DataFrame, n_salts: int) -> DataFrame:
    """Add a salt column that splits rows keyed by a hub dst into n_salts
    sub-keys; non-hub rows get salt 0. Downstream joins use (dst, salt) and
    aggregate twice (per-salt partials, then final) — two-level count merge.
    """
    hub_flag = hubs.select(F.col("vertex").alias("dst"), F.lit(True).alias("is_hub"))
    return (
        oriented.join(F.broadcast(hub_flag), "dst", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("is_hub").isNotNull(),
                F.pmod(F.hash("src"), F.lit(n_salts)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("is_hub")
    )
