"""Edge-table readers/writers — the reference's format converters, Spark-first.

| Reference tool                         | Here                          |
|----------------------------------------|-------------------------------|
| list2bin (text -> binary structs)      | read_edge_text -> write_edges |
| bin2list (binary -> text)              | read_edges -> write_edge_text |
| serialize / adjust2tc (id compaction)  | operators.prep.compact_ids    |
| save_newid (id mapping)                | mapping DataFrame -> parquet  |

Parquet (or Iceberg on a real deployment) replaces the packed-uint64 binary
format: Spark's columnar scan IS the zero-copy mmap path (reference
tricore/include/read_file.h:13-57).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import snapshots

EDGE_SCHEMA = "src LONG, dst LONG"


def read_edge_text(spark: SparkSession, path: str, sep: str = " ") -> DataFrame:
    """SNAP-style text edge list: one 'src dst' pair per line; '#' comment
    lines skipped (reference tools/list2bin.cpp:8-24)."""
    df = spark.read.csv(path, sep=sep, schema=EDGE_SCHEMA, comment="#")
    return df.where(F.col("src").isNotNull() & F.col("dst").isNotNull())


def write_edge_text(edges: DataFrame, path: str, sep: str = " ") -> None:
    """Inverse converter (reference tools/bin2list.cpp:8-22)."""
    edges.select(
        F.concat_ws(sep, F.col("src").cast("string"), F.col("dst").cast("string")).alias("line")
    ).write.mode("overwrite").text(path)


def write_edges(edges: DataFrame, path: str, n_buckets: int | None = None) -> None:
    """Columnar edge table, sorted within range partitions on src — the
    bucketed external sort (reference buildCSR.cu:124-150) as a storage
    layout, so downstream scans get clustered adjacency."""
    out = edges
    if n_buckets:
        out = edges.repartitionByRange(n_buckets, "src").sortWithinPartitions("src", "dst")
    # durable-table write goes through the table-format seam (the Iceberg
    # swap point); the bucketed layout above is orthogonal to the format
    snapshots.write_table(out, path)


def read_edges(spark: SparkSession, path: str) -> DataFrame:
    return snapshots.read_table(spark, path).select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    )


def read_vertex_order(spark: SparkSession, path: str) -> DataFrame:
    """'org new' pairs -> (vertex, new_id) (reference util.cpp:71-99)."""
    return spark.read.csv(path, sep=" ", schema="vertex LONG, new_id LONG", comment="#")


def read_labels(spark: SparkSession, path: str) -> DataFrame:
    """'u l' vertex-label pairs (reference sm.cpp:45-58)."""
    return spark.read.csv(path, sep=" ", schema="vertex LONG, label INT", comment="#")


def write_edges_bucketed(
    edges: DataFrame, table_name: str, n_buckets: int = 32, path: str | None = None
) -> None:
    """Persist the edge table BUCKETED by src (+ sorted within buckets):
    the storage-level co-location contract. Any later join or aggregation
    keyed on src reads matching buckets with NO exchange on the bucketed
    side — for a saved graph queried repeatedly (the analytics-service
    shape), the per-query shuffle of the adjacency build disappears.
    Sandbox parquet stands in for Iceberg bucket transforms; the plan
    property is asserted in tests (zero Exchange in a bucketed
    self-join)."""
    w = (
        edges.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "src")
        .sortBy("src", "dst")
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed edge table with its bucket metadata (spark.table —
    a raw parquet read would drop the co-location contract)."""
    return spark.table(table_name)


def load_query_graphs(path: str) -> list[tuple[dict[int, int], list[tuple[int, int]]]]:
    """Parse the reference's .sm.queries text format (sm.cpp:15-43):
    whitespace-separated ints, repeated blocks of

        v_num e_num
        <v_num labels, one per query vertex 0..v_num-1>
        <e_num edge pairs u v>  (normalized u < v, like the reference)

    Returns [(query_labels {vertex: label}, query_edges [(u, v), ...]), ...]
    — exactly the inputs subgraph_match_count takes. Query files are tiny
    (a handful of ints), so this is a driver-side parse by design.
    """
    with open(path) as fh:
        toks = fh.read().split()
    vals = [int(t) for t in toks]
    out: list[tuple[dict[int, int], list[tuple[int, int]]]] = []
    i = 0
    while i < len(vals):
        v_num, e_num = vals[i], vals[i + 1]
        i += 2
        labels = {q: vals[i + q] for q in range(v_num)}
        i += v_num
        edges = []
        for _ in range(e_num):
            u, v = vals[i], vals[i + 1]
            if u > v:
                u, v = v, u
            edges.append((u, v))
            i += 2
        out.append((labels, edges))
    return out
