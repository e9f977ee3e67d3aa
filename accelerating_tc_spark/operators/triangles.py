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

import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from ..functions.csr import CsrShard, intersect_count_csr
from ..functions.intersect import (
    intersect_count_pairs,
    membership_counts_flat,
    membership_counts_grouped,
)
from ..plans.blocking import (
    auto_n_blocks,
    replicate_adjacency,
    tag_edge_blocks,
    workload_balanced,
)
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


_PARTIAL_SCHEMA = StructType(
    [StructField("triangles", LongType()), StructField("task_s", DoubleType())]
)

# Broadcast-size cap for hub adjacency: total out-neighbor entries shipped to
# every executor (int64 each; 2^22 ≈ 32 MiB). Hubs beyond the cap (rarest
# case: thousands of mega-hubs) fall back to the cogroup path.
_MAX_HUB_ENTRIES = 1 << 22
# Driver-collect row cap for hub candidates, enforced IN the query via
# orderBy(desc(degree)).limit() (a distributed TakeOrdered — no full sort,
# no unbounded collect): a hostile/low hub_threshold selects the whole
# vertex set, and capping only after .collect() would OOM the driver
# before the entry budget ever ran. 4096 rows ≫ any real mega-hub count;
# each row's adjacency is orientation-bounded (O(sqrt m)).
_MAX_HUB_ROWS = 4096

# Broadcast-route budget (bytes of int64 adjacency entries): when the WHOLE
# oriented adjacency fits, it is cheaper to ship it once to every worker
# than to replicate per-block shards through a 2B·|adj| shuffle. The budget
# is PER PYTHON WORKER (each concurrent task holds one deserialized copy),
# so size it as overhead_memory / cores, not "as big as a broadcast can be":
# 64 MiB × 32 local workers = 2 GiB peak — comfortable here and on a
# production executor with cores×(128..256 MiB) overhead. Override with
# SPARK_GRAFT_TC_BROADCAST_MAX_MB; 0 disables the route.
import os as _os

_TC_BROADCAST_MAX_BYTES = int(
    _os.environ.get("SPARK_GRAFT_TC_BROADCAST_MAX_MB", "64")
) << 20


def _cogroup_partials(edges_b: DataFrame, adj_rep: DataFrame) -> DataFrame:
    """Block-pair cogroup partial counts: (triangles, task_s) per pair."""
    import pyarrow as pa

    def count_pair(edges_t: "pa.Table", adj_t: "pa.Table") -> "pa.Table":
        t0 = time.time()
        if edges_t.num_rows == 0 or adj_t.num_rows == 0:
            total = 0
        else:
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
            total = int(counts.sum())
        return pa.table(
            {
                "triangles": pa.array([total], type=pa.int64()),
                "task_s": pa.array([time.time() - t0], type=pa.float64()),
            }
        )

    return (
        edges_b.groupBy("bu", "bv")
        .cogroup(adj_rep.groupBy("bu", "bv"))
        .applyInArrow(count_pair, schema=_PARTIAL_SCHEMA)
    )


def _broadcast_partials(oriented: DataFrame) -> DataFrame:
    """Single-shard broadcast route (guide §3.1: broadcast the side that
    fits): the whole oriented adjacency is built as one CSR on the driver
    and shipped once; the cached edge partitions stream through the probe
    kernel in place. Zero shuffle (the cogroup route pays |E| + 2B·|adj|
    exchange bytes), no adjacency groupBy, no block replication. Engaged
    at runtime only when 16·|E| bytes fit _TC_BROADCAST_MAX_BYTES, so at
    scale the bounded-shuffle cogroup plan takes over unchanged.

    Returns (partials, broadcast) — the caller unpersists the broadcast
    after its eager action so repeated counts don't accumulate executor
    copies."""
    import pyarrow as pa

    spark = oriented.sparkSession
    # toArrow (Spark 4): the collected batches' int64 buffers feed numpy
    # zero-copy — skips toPandas' block consolidation (~0.1s/pass here)
    tbl = oriented.select("src", "dst").toArrow()
    shard = CsrShard.from_flat(
        tbl.column("src").to_numpy(zero_copy_only=False),
        tbl.column("dst").to_numpy(zero_copy_only=False),
    )
    bc = spark.sparkContext.broadcast(
        (shard.vertices, shard.starts, shard.ends, shard.flat)
    )

    def probe(batches):
        v, s, e, fl = bc.value
        sh = CsrShard(v, s, e, fl)
        for rb in batches:
            t0 = time.time()
            tbl = pa.Table.from_batches([rb])
            src = np.asarray(
                tbl.column("src").to_numpy(zero_copy_only=False), dtype=np.int64
            )
            dst = np.asarray(
                tbl.column("dst").to_numpy(zero_copy_only=False), dtype=np.int64
            )
            total = int(intersect_count_csr(sh, src, dst).sum())
            yield pa.record_batch(
                {
                    "triangles": pa.array([total], type=pa.int64()),
                    "task_s": pa.array([time.time() - t0], type=pa.float64()),
                }
            )

    return oriented.select("src", "dst").mapInArrow(probe, schema=_PARTIAL_SCHEMA), bc


def _blocked_partials(
    oriented: DataFrame,
    n_blocks: int | None = None,
    hub_threshold: int | None = None,
    deg: DataFrame | None = None,
    allow_broadcast: bool = True,
) -> tuple[DataFrame, list[DataFrame], int]:
    """Skew-aware blocked plan: per-task partial counts (triangles, task_s).

    Returns (partials, cached_relations_to_unpersist, chosen_n_blocks).
    n_blocks=None auto-derives B from cores + adjacency size
    (plans.blocking.auto_n_blocks, the `cal_part_num` analog); an explicit
    int pins it (A/B tests, cross-round comparability) and also pins the
    cogroup route. With n_blocks=None, hub route off, and the adjacency
    small enough for the per-worker broadcast budget, the zero-shuffle
    broadcast-CSR route is taken instead (reported as n_blocks=1; see
    _broadcast_partials; allow_broadcast=False opts out — used by
    blocked_task_stats so skew diagnostics always describe the cogroup
    plan).

    Two physical routes, split by TOTAL degree (the number of edges that
    reference a vertex's adjacency — in-degree is NOT bounded by the degree
    orientation, so a web-scale hub concentrates wedge work into the few
    block pairs that own it):

    - **hub route** (reference Bisson big-row dual path, Bisson/tc.cu:36-87):
      hubs' out-neighbor sets (orientation-bounded, so small even for
      billion-degree hubs) are broadcast; each hub edge ships only the
      NON-hub side's adjacency and probes it against the broadcast set via
      bitset membership or galloping (functions/intersect.py
      membership_counts_grouped). Rows are spread round-robin — no key, no
      skew, perfectly even tasks.
    - **cogroup route** for everything else: vertices hash into n_blocks,
      each cogrouped task gets one (bu, bv) edge block plus exactly the two
      adjacency shards it needs, rebuilds a zero-copy Arrow CSR and runs the
      batch merge kernel. Shuffle volume |edges| + 2·n_blocks·|adj| —
      independent of wedge count (reference TriCore pair loop,
      tricount_gpu.cu:337-408; n_blocks is the `cal_part_num` analog).

    hub_threshold=None (the DEFAULT) disables the hub route: with the
    degree orientation in force, every out-adjacency is arboricity-bounded
    (O(sqrt m)), so the hash-blocked cogroup has no wedge-work straggler
    even under a planted mega-hub — a warmed interleaved A/B on the
    V=200k/E=2M Zipf + mega-hub fixture measures the pure cogroup FASTER
    than the routed plan in every round (BENCH.md §5h; the r2 table that
    showed the opposite was cold-run warm-up-order bias). Pass an int
    threshold to route vertices of that total degree through the
    broadcast-probe path — the escape hatch for hubs whose per-block-row
    edge mass threatens task memory at cluster scale (auto-B already
    grows B for shard memory, so this is rare by construction).
    """
    spark = oriented.sparkSession
    if hub_threshold is None:
        # hub route off (the default, see docstring): degree statistics are
        # not needed at all — |E| alone drives auto-B and the broadcast
        # decision, and callers' cached `oriented` makes count() ~free
        # (r7: removes the explode+groupBy degree job the old stats pass
        # paid on every call).
        n_edges = oriented.count()
        if (
            allow_broadcast
            and n_blocks is None
            and 16 * n_edges <= _TC_BROADCAST_MAX_BYTES
        ):
            partials, bc = _broadcast_partials(oriented)
            return partials, [bc], 1
        if n_blocks is None:
            n_blocks = auto_n_blocks(spark.sparkContext.defaultParallelism, n_edges)
        partials = _cogroup_partials(
            tag_edge_blocks(oriented, n_blocks),
            replicate_adjacency(prep.adjacency(oriented), n_blocks),
        )
        return partials, [], n_blocks

    if deg is None:
        # callers that already computed degrees for the orientation should
        # pass them in — total degree is orientation-invariant
        deg = (
            oriented.select(F.explode(F.array("src", "dst")).alias("vertex"))
            .groupBy("vertex")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
    stats = deg.agg(
        F.sum("degree").alias("two_m"), F.max("degree").alias("max_deg")
    ).first()
    if n_blocks is None:
        n_blocks = auto_n_blocks(
            spark.sparkContext.defaultParallelism, int(stats["two_m"] or 0) // 2
        )

    if stats["max_deg"] is None or stats["max_deg"] < hub_threshold:
        # no hubs: pure bounded-shuffle cogroup, zero hub-path overhead
        # (no adjacency caching, no broadcast, no edge flagging)
        partials = _cogroup_partials(
            tag_edge_blocks(oriented, n_blocks),
            replicate_adjacency(prep.adjacency(oriented), n_blocks),
        )
        return partials, [], n_blocks

    adj = prep.adjacency(oriented).cache()
    # worst hubs first (they carry the skew), row count bounded by
    # construction BEFORE anything reaches the driver
    hub_rows = (
        deg.where(F.col("degree") >= F.lit(hub_threshold))
        .orderBy(F.desc("degree"), F.asc("vertex"))
        .limit(_MAX_HUB_ROWS)
        .withColumnRenamed("vertex", "src")
        .join(adj, "src", "left")
        .select("src", "degree", "nbrs")
        .collect()
    )
    hub_rows.sort(key=lambda r: (-r["degree"], r["src"]))
    hub_sets: dict[int, np.ndarray] = {}
    budget = _MAX_HUB_ENTRIES
    for r in hub_rows:
        nbrs = r["nbrs"] or []
        if len(nbrs) > budget and hub_sets:
            break
        hub_sets[int(r["src"])] = np.asarray(nbrs, dtype=np.int64)
        budget -= len(nbrs)

    if not hub_sets:
        partials = _cogroup_partials(
            tag_edge_blocks(oriented, n_blocks), replicate_adjacency(adj, n_blocks)
        )
        return partials, [adj], n_blocks

    bc = spark.sparkContext.broadcast(hub_sets)
    hub_vdf = spark.createDataFrame(
        [(int(v),) for v in sorted(hub_sets)], "vertex long"
    )
    flagged = (
        oriented.join(
            F.broadcast(hub_vdf.select(F.col("vertex").alias("src"), F.lit(True).alias("_hs"))),
            "src",
            "left",
        ).join(
            F.broadcast(hub_vdf.select(F.col("vertex").alias("dst"), F.lit(True).alias("_hd"))),
            "dst",
            "left",
        )
    )

    # cogroup route: non-hub edges, shards only for non-hub owners
    normal = flagged.where(F.col("_hs").isNull() & F.col("_hd").isNull()).select("src", "dst")
    adj_nonhub = adj.join(
        F.broadcast(hub_vdf.withColumnRenamed("vertex", "src")), "src", "left_anti"
    )
    cogroup_part = _cogroup_partials(
        tag_edge_blocks(normal, n_blocks), replicate_adjacency(adj_nonhub, n_blocks)
    )

    # hub route: ship the non-hub side's adjacency only
    hubbed = flagged.where(F.col("_hs").isNotNull() | F.col("_hd").isNotNull())
    other = F.when(
        F.col("_hs").isNotNull() & F.col("_hd").isNull(), F.col("dst")
    ).when(F.col("_hd").isNotNull() & F.col("_hs").isNull(), F.col("src"))
    hub_edges = hubbed.select(
        "src",
        "dst",
        F.col("_hs").isNotNull().alias("src_is_hub"),
        F.col("_hd").isNotNull().alias("dst_is_hub"),
        other.alias("other"),
    ).join(
        adj.select(F.col("src").alias("other"), F.col("nbrs").alias("other_nbrs")),
        "other",
        "left",
    )
    # equal-WORK spread (plans.blocking.workload_balanced — the Hu equal-work
    # ranges): per-row probe cost is |other_nbrs| for single-hub rows and
    # min(|N+(src)|, |N+(dst)|) for hub-hub rows (sizes from the tiny
    # broadcastable hub-size table; hub-hub rows ship no arrays).
    hub_szs = spark.createDataFrame(
        [(int(v), len(a)) for v, a in hub_sets.items()], "vertex long, hsz long"
    )
    with_wl = (
        hub_edges.join(
            F.broadcast(hub_szs.select(F.col("vertex").alias("src"), F.col("hsz").alias("_sz_s"))),
            "src",
            "left",
        )
        .join(
            F.broadcast(hub_szs.select(F.col("vertex").alias("dst"), F.col("hsz").alias("_sz_d"))),
            "dst",
            "left",
        )
        .withColumn(
            "workload",
            F.when(
                F.col("src_is_hub") & F.col("dst_is_hub"),
                F.least("_sz_s", "_sz_d"),
            ).otherwise(F.coalesce(F.size("other_nbrs"), F.lit(0)))
            + F.lit(1),
        )
    )
    spread = workload_balanced(with_wl, spark.sparkContext.defaultParallelism).drop(
        "workload", "_sz_s", "_sz_d"
    )

    def probe(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        sets = bc.value
        empty = np.empty(0, dtype=np.int64)
        for rb in batches:
            t0 = time.time()
            tbl = pa.Table.from_batches([rb])
            src = tbl.column("src").to_numpy(zero_copy_only=False)
            dst = tbl.column("dst").to_numpy(zero_copy_only=False)
            s_hub = tbl.column("src_is_hub").to_numpy(zero_copy_only=False)
            d_hub = tbl.column("dst_is_hub").to_numpy(zero_copy_only=False)
            col = tbl.column("other_nbrs").combine_chunks()
            # zero-copy flat layout: Arrow list buffers ARE (flat, lens)
            lens = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
                zero_copy_only=False
            )
            flat = np.asarray(pc.list_flatten(col), dtype=np.int64)
            rows = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
            total = 0
            # single-hub rows: probe shipped adjacency against broadcast set
            # (hub-hub rows carry no arrays so they contribute nothing here)
            hub_of = np.where(s_hub, src, dst)
            total += int(membership_counts_flat(hub_of, flat, rows, sets).sum())
            both = s_hub & d_hub
            if both.any():
                # hub-hub rows: both sides live in the broadcast; probe the
                # dst sets (referenced, not copied) against the src sets
                p_lists = [sets.get(int(d), empty) for d in dst[both]]
                total += int(
                    membership_counts_grouped(src[both], p_lists, sets).sum()
                )
            yield pa.record_batch(
                {
                    "triangles": pa.array([total], type=pa.int64()),
                    "task_s": pa.array([time.time() - t0], type=pa.float64()),
                }
            )

    hub_part = spread.select(
        "src", "dst", "src_is_hub", "dst_is_hub", "other_nbrs"
    ).mapInArrow(probe, schema=_PARTIAL_SCHEMA)
    # bc joins the cleanup list: Broadcast.unpersist() drops the executor
    # copies once the caller's eager action is done (repeated hub-routed
    # counts previously accumulated one broadcast per call)
    return cogroup_part.unionAll(hub_part), [adj, bc], n_blocks


def triangle_count_blocked(
    oriented: DataFrame,
    n_blocks: int | None = None,
    hub_threshold: int | None = None,
    deg: DataFrame | None = None,
) -> DataFrame:
    """Bounded-shuffle, skew-aware block-pair triangle count (the at-scale
    strategy) — see _blocked_partials for the two-route plan. The 1-row
    result is materialized eagerly so the plan's internal caches (hub-route
    adjacency) are released before returning — repeated counts never
    accumulate cached relations."""
    spark = oriented.sparkSession
    partials, caches, _ = _blocked_partials(oriented, n_blocks, hub_threshold, deg=deg)
    row = partials.agg(F.coalesce(F.sum("triangles"), F.lit(0)).alias("t")).first()
    for c in caches:
        c.unpersist()
    return spark.createDataFrame([(int(row["t"] or 0),)], "triangles long")


def blocked_task_stats(
    oriented: DataFrame,
    n_blocks: int | None = None,
    hub_threshold: int | None = None,
    deg: DataFrame | None = None,
) -> DataFrame:
    """Skew diagnostics for the blocked plan: one row with the triangle sum,
    the (auto-)chosen block count, and max / median / total per-task kernel
    seconds. Used by bench to show max/median task time before vs after hub
    routing, and to record the auto-B choice per scaling level."""
    spark = oriented.sparkSession
    partials, caches, chosen_b = _blocked_partials(
        oriented, n_blocks, hub_threshold, deg=deg, allow_broadcast=False
    )
    row = partials.agg(
        F.coalesce(F.sum("triangles"), F.lit(0)).cast("long").alias("triangles"),
        F.count(F.lit(1)).alias("n_tasks"),
        F.round(F.max("task_s"), 4).alias("max_task_s"),
        F.round(F.expr("percentile(task_s, 0.5)"), 4).alias("median_task_s"),
        F.round(F.sum("task_s"), 4).alias("total_task_s"),
    ).first()
    for c in caches:
        c.unpersist()
    return spark.createDataFrame(
        [row.asDict() | {"n_blocks": chosen_b}],
        "triangles long, n_tasks long, max_task_s double, median_task_s double, "
        "total_task_s double, n_blocks int",
    )


def count_triangles(
    edges_raw: DataFrame,
    strategy: str = "blocked",
    n_blocks: int | None = None,
    hub_threshold: int | None = None,
) -> DataFrame:
    """End-to-end pipeline: clean -> degree-orient -> count with the chosen
    strategy. n_blocks=None auto-derives the block count (cal_part_num
    analog); pass an int to pin it."""
    canonical = prep.canonicalize_edges(edges_raw)
    deg = prep.degrees(canonical)
    oriented = prep.orient_by_degree(canonical, deg)
    if strategy == "auto":
        # BENCH.md §3 crossover: the bounded-shuffle blocked plan wins once
        # wedge volume exceeds replication volume (avg degree >= 2*n_blocks);
        # below that, the pure-JVM array_intersect wedge join is cheaper.
        row = deg.agg(F.avg("degree").alias("avg"), F.sum("degree").alias("two_m")).first()
        avg = row["avg"] or 0.0
        b_eff = n_blocks or auto_n_blocks(
            edges_raw.sparkSession.sparkContext.defaultParallelism,
            int(row["two_m"] or 0) // 2,
        )
        strategy = "blocked" if avg >= 2 * b_eff else "array_intersect"
    if strategy == "join":
        return triangle_count_join(oriented)
    if strategy == "array_intersect":
        return triangle_count_array_intersect(oriented)
    if strategy == "kernel":
        return triangle_count_kernel(oriented)
    if strategy == "blocked":
        # the degree table computed for the orientation doubles as the hub
        # detector's input (total degree is orientation-invariant)
        return triangle_count_blocked(
            oriented, n_blocks=n_blocks, hub_threshold=hub_threshold, deg=deg
        )
    raise ValueError(f"unknown strategy: {strategy}")


def triangle_count_estimate(
    edges_raw: DataFrame, p: float = 0.1, seed: int = 42
) -> DataFrame:
    """DOULION-style sampled estimate (Tsourakakis et al., KDD'09 — public
    result): keep each edge with probability p via a deterministic
    xxhash64 coin, exact-count the sparsified graph, scale by the REALIZED
    keep probability^-3 (the coin quantizes p to floor(p·2^20)/2^20).
    Unbiased; relative error concentrates like 1/sqrt(p^3·T), so p is
    chosen by the accuracy target, independent of graph size. The 100 TB
    use: a p=0.01 pass costs ~p^2 of the blocked count's wedge work and
    sizes the full run (triangle count, skew, block count) before paying
    for it. Returns (triangles_est, sampled_edges, p)."""
    canonical = prep.canonicalize_edges(edges_raw)
    m = 1 << 20
    # The coin is integer-quantized: the REALIZED keep probability is
    # floor(p*m)/m, not p — rescale by the realized value or the estimate
    # carries a small systematic bias (and p < 1/m would silently keep
    # nothing: reject it).
    cut = int(p * m)
    if cut < 1:
        raise ValueError(f"p={p} below coin resolution 1/{m}: keeps zero edges")
    p_real = cut / m
    kept = canonical.where(
        F.pmod(F.xxhash64("src", "dst", F.lit(seed)), F.lit(m)) < cut
    )
    row = triangle_count_blocked(prep.orient_by_degree(kept)).first()
    n_kept = kept.count()
    est = int(round(int(row["triangles"]) / (p_real**3)))
    spark = edges_raw.sparkSession
    # p column carries the REALIZED probability so the row is
    # self-consistent: triangles_est == round(sampled_triangles / p^3)
    # recomputed by a consumer from this row's own values.
    return spark.createDataFrame(
        [(est, n_kept, float(p_real))],
        "triangles_est long, sampled_edges long, p double",
    )


def local_clustering(edges_raw: DataFrame) -> DataFrame:
    """(vertex, degree, tri_cnt, clustering) — per-vertex triangle counts and
    the local clustering coefficient 2T(v)/(d(v)(d(v)-1)); 0.0 for degree<2.
    SQL-expressible (3-way-join corners), so fully oracle-checkable."""
    canonical = prep.canonicalize_edges(edges_raw)
    deg = prep.degrees(canonical)
    oriented = prep.orient_by_degree(canonical, deg)
    tri = per_vertex_triangle_counts(oriented)
    d = F.col("degree")
    t = F.coalesce(F.col("tri_cnt"), F.lit(0))
    return deg.join(tri, "vertex", "left").select(
        "vertex",
        d.cast("long").alias("degree"),
        t.cast("long").alias("tri_cnt"),
        F.when(d >= 2, F.round(2.0 * t / (d * (d - 1)), 6)).otherwise(F.lit(0.0)).alias(
            "clustering"
        ),
    )


def per_vertex_triangle_counts(oriented: DataFrame) -> DataFrame:
    """(vertex, tri_cnt) — triangles incident to each vertex, via the same
    DAG join; every triangle (u,v,w) credits all three corners."""
    e1 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e2 = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    e3 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    tri = e1.join(e2, "v").join(e3, ["u", "w"])
    corners = tri.select(F.explode(F.array("u", "v", "w")).alias("vertex"))
    return corners.groupBy("vertex").agg(F.count(F.lit(1)).alias("tri_cnt"))
