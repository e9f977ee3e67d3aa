"""Composed end-to-end web-graph pipeline — the north star's composition.

pages -> extract_links -> URL dense-ID compaction -> canonical edge table
-> blocked triangle count + PageRank + connected components, with the
pages->edges boundary committed through the table-format seam
(sources/snapshots) and the iterative stages checkpointed per superstep.
A crashed run resumes from the last completed stage: once the edge table
is committed, a rerun NEVER re-reads the page source (the corpus argument
is a thunk precisely so resume can prove it was never called).

Every piece is an existing oracle-green operator; this module is the glue
the north rule actually describes (edge extraction feeding the iterative
graph jobs over one committed Iceberg-style table), and the `pipeline_e2e`
contract row checks the whole chain against a single DuckDB CTE chain
re-deriving the same graph analytically.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import components, pagerank, prep, triangles
from ..sources import pages as pages_mod
from ..sources import snapshots

SUMMARY_COLUMNS = ("vertex", "rank", "component", "triangles", "n_edges")


def web_graph_pipeline(
    spark: SparkSession,
    corpus_fn: Callable[[], DataFrame],
    work_dir: str,
    pr_iterations: int = 10,
    cc_max_iterations: int = 100,
) -> DataFrame:
    """Run (or resume) the composed pipeline; returns the per-vertex summary
    (vertex, rank, component) + constant (triangles, n_edges) columns.

    Stage 1 (pages -> edges) commits the canonical dense-ID edge table and
    the url mapping under `work_dir` (completeness = the edge table's
    _SUCCESS marker, written last); `corpus_fn` is only invoked when that
    commit is absent. Stages 2-3 (PageRank / components) checkpoint each
    superstep under `work_dir` so a rerun resumes mid-iteration."""
    edges_path = os.path.join(work_dir, "edges")
    mapping_path = os.path.join(work_dir, "url_mapping")
    if not snapshots.is_complete(edges_path):
        edges, mapping = pages_mod.pages_to_edges(corpus_fn())
        # mapping first: the edge table's marker is the stage gate, so it
        # must be the LAST write of the stage
        snapshots.write_table(mapping, mapping_path)
        snapshots.write_table(edges, edges_path)

    canonical = prep.canonicalize_edges(snapshots.read_table(spark, edges_path))
    n_edges = canonical.count()
    tri = triangles.triangle_count_blocked(prep.orient_by_degree(canonical)).first()[
        "triangles"
    ]
    pr = pagerank.pagerank(
        spark,
        canonical,
        n_iterations=pr_iterations,
        checkpoint_dir=os.path.join(work_dir, "pr_ckpt"),
    )
    cc = components.connected_components(
        spark,
        canonical,
        max_iterations=cc_max_iterations,
        checkpoint_dir=os.path.join(work_dir, "cc_ckpt"),
    )
    return (
        pr.join(cc, "vertex")
        .select(
            "vertex",
            F.round("rank", 6).alias("rank"),
            "component",
            F.lit(int(tri)).cast("long").alias("triangles"),
            F.lit(int(n_edges)).cast("long").alias("n_edges"),
        )
    )
