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


def workload_balanced(
    edges_with_workload: DataFrame, n_partitions: int, sample_mod: int = 10
) -> DataFrame:
    """Repartition rows into ~equal TOTAL-workload bins (reference
    Hu/tc.cu:291-305: prefix-sum equal-work block ranges).

    A plain repartitionByRange on the workload column gives equal ROW
    counts per partition — the heavy-row partition then carries the most
    work, the opposite of balance. Instead: a deterministic hash-sample of
    workloads builds WEIGHTED quantile boundaries on the driver (the
    distributed analog of the reference's prefix-sum binary search), rows
    are binned by boundary, and bins become partitions.
    """
    df = edges_with_workload
    sample = [
        r["workload"]
        for r in df.where(F.pmod(F.xxhash64("src", "dst"), F.lit(sample_mod)) == 0)
        .select("workload")
        .limit(100000)
        .collect()
    ]
    if not sample:
        sample = [r["workload"] for r in df.select("workload").limit(100000).collect()]
    if not sample:
        return df.repartition(n_partitions)
    sample.sort()
    total = float(sum(sample))
    boundaries: list[float] = []
    acc = 0.0
    target = total / n_partitions
    want = target
    for w in sample:
        acc += w
        if acc >= want and len(boundaries) < n_partitions - 1:
            boundaries.append(float(w))
            want += target
    if not boundaries:
        return df.repartition(n_partitions)
    bin_col = F.lit(0)
    for b in boundaries:
        bin_col = bin_col + (F.col("workload") > F.lit(b)).cast("int")
    # range partitioning never splits equal keys, so each equal-work bin
    # lands whole in one partition — bins ARE the reference's work ranges
    return (
        df.withColumn("_wbin", bin_col)
        .repartitionByRange(n_partitions, "_wbin")
        .drop("_wbin")
    )


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
