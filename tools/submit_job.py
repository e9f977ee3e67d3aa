"""spark-submit driver script for the link-graph engine (north-rule run mode).

On a real cluster:

    python tools/make_pyfiles.py
    spark-submit --master <cluster-master> \\
        --py-files dist/accelerating_tc_spark.zip \\
        tools/submit_job.py --job tc --edges s3://.../edges --output s3://.../out

Locally the same script runs under spark-submit with a local master (the
smoke test in tests/test_submit_job.py does exactly that). The script
never sets `master` itself — spark-submit owns cluster topology; the
engine only applies master-agnostic configs (AQE, Arrow, UTC, shuffle
partitions sized to the cluster's default parallelism), so the identical
artifact runs at N and 4N executors for the scaling criterion.

Jobs: tc (blocked triangle count), pagerank, cc, lp, hits, kcore.
--edges accepts a parquet directory/file with (src, dst) long columns, or
a driver sf dir (containing lineitem.parquet) from which the deterministic
co-purchase graph is built. Results land in --output as parquet plus one
JSON metrics line on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # direct `python tools/submit_job.py` runs
    sys.path.insert(0, REPO)


def build_session(app_name: str):
    """Master-agnostic session: spark-submit supplies master/memory."""
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    spark = builder.getOrCreate()
    # size shuffle partitions to the actual cluster, not the 200 default,
    # unless the submitter pinned a value
    if spark.conf.get("spark.sql.shuffle.partitions") == "200":
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism)
        )
    return spark


def load_edges(spark, path: str):
    from accelerating_tc_spark.operators import prep
    from accelerating_tc_spark.sources import tpch_graph

    if os.path.isdir(path) and os.path.exists(os.path.join(path, "lineitem.parquet")):
        return prep.canonicalize_edges(tpch_graph.copurchase_edges(spark, path))
    return prep.canonicalize_edges(spark.read.parquet(path).select("src", "dst"))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--job", required=True, choices=["tc", "pagerank", "cc", "lp", "hits", "kcore"])
    ap.add_argument("--edges", required=True, help="edge parquet path or driver sf dir")
    ap.add_argument("--output", required=True, help="output parquet directory")
    ap.add_argument("--iterations", type=int, default=10)
    ap.add_argument("--checkpoint-dir", default=None,
                    help="shared-storage dir for resumable superstep snapshots")
    ap.add_argument("--n-blocks", type=int, default=None)
    args = ap.parse_args()

    spark = build_session(f"linkgraph_{args.job}")
    from accelerating_tc_spark.operators import (
        components,
        hits,
        kcore,
        labelprop,
        pagerank,
        prep,
        triangles,
    )

    edges = load_edges(spark, args.edges)
    t0 = time.time()
    if args.job == "tc":
        oriented = prep.orient_by_degree(edges)
        result = triangles.triangle_count_blocked(oriented, n_blocks=args.n_blocks)
    elif args.job == "pagerank":
        result = pagerank.pagerank(
            spark, edges, n_iterations=args.iterations, checkpoint_dir=args.checkpoint_dir
        )
    elif args.job == "cc":
        result = components.connected_components(
            spark, edges, checkpoint_dir=args.checkpoint_dir
        )
    elif args.job == "lp":
        result = labelprop.label_propagation(
            spark, edges, n_iterations=args.iterations, checkpoint_dir=args.checkpoint_dir
        )
    elif args.job == "hits":
        result = hits.hits(
            spark, edges, n_iterations=args.iterations, checkpoint_dir=args.checkpoint_dir
        )
    else:
        result = kcore.core_numbers(spark, edges)

    result.write.mode("overwrite").parquet(args.output)
    wall = round(time.time() - t0, 3)
    n_rows = spark.read.parquet(args.output).count()
    print(json.dumps({
        "job": args.job,
        "rows": n_rows,
        "sec": wall,
        "parallelism": spark.sparkContext.defaultParallelism,
        "output": args.output,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
