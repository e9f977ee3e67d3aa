"""Streaming edge ingestion with INCREMENTAL triangle maintenance.

The reference is a pure batch engine (SURVEY.md §2.9), so this extends it:
a Structured Streaming front end that keeps an exact running triangle count
over an append-only edge stream without ever recounting the full graph.

Plan shape (per micro-batch, inside foreachBatch):
1. canonicalize the batch, anti-join against the parquet edge store ->
   Δ (strictly new edges; duplicates and re-deliveries drop out),
2. count the new triangles EXACTLY by Δ-degree decomposition — a triangle
   that appears when Δ lands has 1, 2, or 3 Δ edges, and each class is a
   join whose driving side is Δ (cost ∝ |Δ| × degree, never ∝ |E|):
     t1: Δ(u,v) with both other edges old   = Σ_Δ |N_old(u) ∩ N_old(v)|
     t2: two Δ edges sharing a vertex, third edge old (Δ-wedge ⋈ E_old)
     t3: triangles entirely inside Δ
3. append Δ to the store, add t1+t2+t3 to the running total.

Exactness: E_old ∩ Δ = ∅ (the anti-join), so the three classes partition
the new triangles; totals are pinned against full batch recounts in
tests/test_streaming.py. The store is the sandbox stand-in for a lakehouse
table; the foreachBatch pattern is unchanged on a real sink.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import prep, triangles
from ..sources import snapshots

EDGE_SCHEMA = "src long, dst long"


def read_edge_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source edge stream: each parquet file dropped into `path`
    becomes (part of) a micro-batch."""
    return (
        spark.readStream.schema(EDGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def _count_new_triangles(spark: SparkSession, old: DataFrame, delta: DataFrame) -> int:
    """Exact count of triangles having >= 1 edge in `delta`, given the
    disjoint canonical edge sets `old` and `delta`."""
    sym_old = prep.symmetrize(old)
    # Only Δ's endpoints ever probe the old adjacency: semi-join the store
    # down to those vertices BEFORE the groupBy, so the shuffled/aggregated
    # volume is ∝ edges touching Δ (|Δ| × degree), not 2|E|. The store scan
    # itself stays (columnar read; bucketed/pruned on a real lakehouse
    # table), but the per-batch shuffle no longer grows with the store.
    endpoints = (
        delta.select(F.col("src").alias("v"))
        .union(delta.select(F.col("dst").alias("v")))
        .distinct()
    )
    adj_old = (
        sym_old.join(endpoints.withColumnRenamed("v", "src"), "src", "left_semi")
        .groupBy("src")
        .agg(F.sort_array(F.collect_set("dst")).alias("nbrs"))
    )

    # t1: one Δ edge, two old edges — per Δ edge |N_old(u) ∩ N_old(v)|
    a_u = adj_old.withColumnRenamed("nbrs", "nbrs_u")
    a_v = adj_old.select(F.col("src").alias("dst"), F.col("nbrs").alias("nbrs_v"))
    t1 = (
        delta.join(a_u, "src", "left")
        .join(a_v, "dst", "left")
        .select(
            F.size(
                F.array_intersect(
                    F.coalesce("nbrs_u", F.array().cast("array<long>")),
                    F.coalesce("nbrs_v", F.array().cast("array<long>")),
                )
            ).alias("c")
        )
        .agg(F.coalesce(F.sum("c"), F.lit(0)))
        .first()[0]
    )

    # t2: two Δ edges sharing a vertex, closing edge old — enumerate Δ
    # wedges (center w, endpoints a < b) and join the canonical old edges
    sym_d = prep.symmetrize(delta)
    e1 = sym_d.select(F.col("src").alias("w"), F.col("dst").alias("a"))
    e2 = sym_d.select(F.col("src").alias("w"), F.col("dst").alias("b"))
    wedges = e1.join(e2, "w").where(F.col("a") < F.col("b")).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    t2 = wedges.join(old, ["src", "dst"], "left_semi").count()

    # t3: triangles entirely inside Δ
    t3 = triangles.triangle_count_join(prep.orient_by_degree(delta)).first()["triangles"]
    return int(t1) + int(t2) + int(t3)


class TriangleMaintainer:
    """foreachBatch sink: parquet edge store + exact running triangle count.

    State layout under `state_dir`:
      edges/        parquet canonical edge store (committed files only)
      pending/<id>/ staged delta for batch <id> (pre- or mid-commit)
      state.json    {"triangles", "edges", "batches", "last_batch_id"}

    Crash-safe commit protocol (state.json is the single commit point):
      1. stage Δ under pending/<batch_id> (NOT visible to the store),
      2. atomically write state.json including last_batch_id,
      3. move the staged files into edges/ and drop the pending dir.
    A crash before (2) leaves only stale staging — the replayed batch
    recomputes the identical Δ (anti-join against the committed store) and
    overwrites it. A crash between (2) and (3) is finished by `_recover`
    (file moves are idempotent: batch-prefixed names, already-moved files
    are gone from pending) and the replayed batch, carrying the committed
    last_batch_id, is skipped — counts are never applied twice OR lost.
    Row-level idempotency for re-deliveries under a fresh streaming
    checkpoint (ids restart at 0) still comes from the anti-join.
    """

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.state_dir = state_dir
        self.edges_path = os.path.join(state_dir, "edges")
        self.pending_path = os.path.join(state_dir, "pending")
        self.state_path = os.path.join(state_dir, "state.json")
        # staged-append mechanics live in the table-format seam; state.json
        # (this class) remains the single commit point
        self._append = snapshots.ParquetAppendStore(
            spark, self.edges_path, self.pending_path
        )
        os.makedirs(state_dir, exist_ok=True)
        self._recover()

    def _load_state(self) -> dict:
        if os.path.exists(self.state_path):
            with open(self.state_path) as fh:
                return json.load(fh)
        return {"triangles": 0, "edges": 0, "batches": 0, "last_batch_id": -1}

    def _pending_dir(self, batch_id: int) -> str:
        return self._append.stage_dir(batch_id)

    def _publish(self, batch_id: int) -> None:
        self._append.publish(batch_id)

    def _recover(self) -> None:
        """Finish any committed-but-unpublished batch; drop uncommitted
        staging (its batch will be re-delivered and recomputed)."""
        last = self._load_state().get("last_batch_id", -1)
        for bid in self._append.staged_ids():
            if bid <= last:
                self._append.publish(bid)
            else:
                self._append.drop_stage(bid)

    def _store(self) -> DataFrame | None:
        return self._append.read()

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self._recover()
        state = self._load_state()
        if batch_id == state.get("last_batch_id", -1):
            return  # exact replay of the committed batch (crash after commit)
        canonical = prep.canonicalize_edges(batch_df)
        old = self._store()
        if old is None:
            delta = canonical
            old = self.spark.createDataFrame([], EDGE_SCHEMA)
        else:
            delta = canonical.join(old, ["src", "dst"], "left_anti")
        delta = delta.localCheckpoint(eager=True)
        n_delta = delta.count()
        if n_delta == 0:
            return
        new_tri = _count_new_triangles(self.spark, old, delta)
        # (1) stage
        self._append.stage(delta, batch_id)
        # (2) commit — the atomic point
        state["triangles"] += new_tri
        state["edges"] += n_delta
        state["batches"] += 1
        state["last_batch_id"] = batch_id
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(state, fh)
        os.replace(tmp, self.state_path)
        # (3) publish
        self._publish(batch_id)

    def totals(self) -> dict:
        return self._load_state()


def run_incremental_triangles(
    spark: SparkSession,
    input_path: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Wire the stream: files in input_path -> TriangleMaintainer state.
    With available_now=True processes everything present and stops
    (deterministic for tests); otherwise runs continuously."""
    maintainer = TriangleMaintainer(spark, state_dir)
    stream = read_edge_stream(spark, input_path)
    writer = (
        stream.writeStream.foreachBatch(maintainer.process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        if available_now
        else stream.writeStream.foreachBatch(maintainer.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
    )
    query = writer.start()
    if available_now:
        query.awaitTermination()
    return maintainer, query


# ------------------------- watermarked event aggregation -------------------

def windowed_event_counts(
    events_stream: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts over a streaming `events` table
    (ts, event_type, value): late rows beyond the watermark are dropped,
    state is bounded — the canonical Structured Streaming aggregation shape
    for the driver's events schema."""
    # event-time columns must be TIMESTAMP (not NTZ) for watermarks; the
    # session timezone is pinned to UTC so the cast is value-stable
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
