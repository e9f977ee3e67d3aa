"""Incremental connected components over an append-only edge stream.

Batch CC recomputes O(log n) supersteps over the WHOLE graph; on a stream
that is wasted work — new edges can only MERGE components, never split
them (append-only ⇒ labels are monotone non-increasing). Per micro-batch:

1. map the Δ edges' endpoints to their current labels (join ∝ |Δ|;
   unseen vertices label themselves),
2. contract: Δ edges whose endpoints already share a label are no-ops;
   the rest form a SUPER-GRAPH over touched labels only,
3. run pointer-jumping CC on that super-graph (∝ touched components,
   never ∝ |V|),
4. fold the resulting label→label remap (broadcast-small) into the label
   store and append newly-seen vertices.

The store rewrite is the sandbox's parquet stand-in for an Iceberg
MERGE INTO (which would touch only changed partitions); the interesting
cost — steps 1-3 — is Δ-proportional, matching the incremental triangle
maintainer's posture (streaming/edges.py).

Idempotency falls out of monotonicity: re-delivered edges try to merge
already-merged components and change nothing, so no dedup store is
needed. Crash safety: the label table is the ONLY state and is committed
via a version pointer — each batch writes a fresh `labels.v<N>` directory
and then atomically `os.replace`s the single `CURRENT` pointer file (the
one commit point, same posture as TriangleMaintainer's state.json). A
crash at ANY instant leaves CURRENT referencing a complete older version;
stale version directories are garbage-collected on the next startup and
after each commit, and the replayed batch recomputes the identical merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import components, prep
from ..sources import snapshots

LABEL_SCHEMA = "vertex long, component long"


class ComponentMaintainer:
    """foreachBatch sink: versioned (vertex, component) snapshot store,
    exact labels (component = min vertex id in the component) after every
    batch. All durable-state mechanics live in the table-format seam
    (sources/snapshots.ParquetSnapshotStore) — the Iceberg swap replaces
    the store class, not this maintainer."""

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.state_dir = state_dir
        self.store = snapshots.ParquetSnapshotStore(
            spark, state_dir, prefix="labels.v", pointer_name="CURRENT"
        )
        # kept for tests/backcompat introspection
        self.pointer_path = self.store.pointer_path
        self.store.gc_stale()

    def _current_version(self) -> int | None:
        return self.store.current()

    def _version_dir(self, v: int) -> str:
        return self.store.version_dir(v)

    def labels(self) -> DataFrame:
        cur = self.store.read_current()
        if cur is not None:
            return cur
        return self.spark.createDataFrame([], LABEL_SCHEMA)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        delta = prep.canonicalize_edges(batch_df).localCheckpoint(eager=True)
        if delta.limit(1).count() == 0:
            return
        old = self.labels()

        # 1. endpoint labels (new vertices label themselves)
        la = old.select(F.col("vertex").alias("src"), F.col("component").alias("la"))
        lb = old.select(F.col("vertex").alias("dst"), F.col("component").alias("lb"))
        tagged = (
            delta.join(la, "src", "left")
            .join(lb, "dst", "left")
            .select(
                F.coalesce("la", F.col("src")).alias("la"),
                F.coalesce("lb", F.col("dst")).alias("lb"),
            )
        )
        # 2. contract to the super-graph of touched labels
        super_edges = tagged.where(F.col("la") != F.col("lb")).select(
            F.least("la", "lb").alias("src"), F.greatest("la", "lb").alias("dst")
        )
        remap = None
        if super_edges.limit(1).count() > 0:
            # 3. CC over the touched-label super-graph (small by construction)
            merged = components.connected_components(self.spark, super_edges)
            remap = merged.where(F.col("vertex") != F.col("component")).select(
                F.col("vertex").alias("old_label"), F.col("component").alias("new_label")
            )

        # 4. fold remap + append new vertices (their component follows the
        # same remap: a fresh vertex's self-label may itself be merged)
        new_verts = (
            delta.select(F.col("src").alias("vertex"))
            .union(delta.select(F.col("dst").alias("vertex")))
            .distinct()
            .join(old.select("vertex"), "vertex", "left_anti")
            .select("vertex", F.col("vertex").alias("component"))
        )
        full = old.unionByName(new_verts)
        if remap is not None:
            full = full.join(
                F.broadcast(remap.withColumnRenamed("old_label", "component")),
                "component",
                "left",
            ).select(
                "vertex", F.coalesce("new_label", "component").alias("component")
            )

        # Commit: write the new version dir, flip the pointer atomically
        # (the store's commit point), then GC the superseded version. A
        # crash anywhere leaves CURRENT on a complete table.
        cur = self.store.current()
        nxt = 0 if cur is None else cur + 1
        self.store.write_version(full, nxt)
        self.store.commit(nxt)


def run_incremental_components(
    spark: SparkSession,
    input_path: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Wire the stream: parquet edge files in input_path -> label store."""
    maintainer = ComponentMaintainer(spark, state_dir)
    stream = (
        spark.readStream.schema("src long, dst long")
        .option("maxFilesPerTrigger", 1)
        .parquet(input_path)
    )
    writer = stream.writeStream.foreachBatch(maintainer.process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if available_now:
        query.awaitTermination()
    return maintainer, query
