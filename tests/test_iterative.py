"""PageRank / CC / LP / k-core vs independent pure-python+numpy oracles,
plus checkpoint/resume of the superstep spine (north-rule requirements)."""

from __future__ import annotations

import numpy as np
import pytest

from accelerating_tc_spark.operators import (
    components,
    kcore,
    labelprop,
    pagerank,
    prep,
)
from accelerating_tc_spark.sources import synthetic


def _clean_pairs(pairs) -> list[tuple[int, int]]:
    seen = set()
    for a, b in pairs:
        if a == b:
            continue
        seen.add((min(a, b), max(a, b)))
    return sorted(seen)


def numpy_pagerank(pairs, n_iter=10, d=0.85) -> dict[int, float]:
    edges = _clean_pairs(pairs)
    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    deg = np.zeros(n)
    for a, b in edges:
        deg[idx[a]] += 1
        deg[idx[b]] += 1
    rank = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        contrib = np.zeros(n)
        for a, b in edges:
            contrib[idx[b]] += rank[idx[a]] / deg[idx[a]]
            contrib[idx[a]] += rank[idx[b]] / deg[idx[b]]
        rank = (1 - d) / n + d * contrib
    return {v: rank[idx[v]] for v in verts}


def python_components(pairs) -> dict[int, int]:
    edges = _clean_pairs(pairs)
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def python_label_prop(pairs, n_iter=5) -> dict[int, int]:
    edges = _clean_pairs(pairs)
    nbrs: dict[int, list[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    label = {v: v for v in nbrs}
    for _ in range(n_iter):
        new = {}
        for v in nbrs:
            counts: dict[int, int] = {}
            for u in nbrs[v]:
                counts[label[u]] = counts.get(label[u], 0) + 1
            best = min(counts, key=lambda l: (-counts[l], l))
            new[v] = best
        label = new
    return label


def python_core_numbers(pairs) -> dict[int, int]:
    edges = _clean_pairs(pairs)
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in nbrs.items()}
    core: dict[int, int] = {}
    remaining = set(nbrs)
    k = 0
    while remaining:
        v = min(remaining, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        core[v] = k
        remaining.remove(v)
        for u in nbrs[v]:
            if u in remaining:
                deg[u] -= 1
                nbrs[u].discard(v)
    return core


@pytest.fixture(scope="module")
def graph(spark):
    pairs = synthetic.powerlaw_edge_pairs(120, 500, seed=11).tolist()
    # add two extra disjoint blobs so CC has >1 component
    pairs += [(500, 501), (501, 502), (500, 502), (600, 601)]
    edges = synthetic.edges_df(spark, pairs)
    return pairs, prep.canonicalize_edges(edges)


def test_pagerank_matches_numpy(spark, graph):
    pairs, canonical = graph
    got = {r["vertex"]: r["rank"] for r in pagerank.pagerank(spark, canonical, n_iterations=10).collect()}
    expected = numpy_pagerank(pairs, n_iter=10)
    assert set(got) == set(expected)
    for v in expected:
        assert abs(got[v] - expected[v]) < 1e-9, v
    assert abs(sum(got.values()) - 1.0) < 1e-6


def numpy_personalized_pagerank(pairs, n_seeds=8, n_iter=10, d=0.85) -> dict[int, float]:
    edges = _clean_pairs(pairs)
    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    deg = np.zeros(n)
    for a, b in edges:
        deg[idx[a]] += 1
        deg[idx[b]] += 1
    seeds = verts[: min(n_seeds, n)]
    s = np.zeros(n)
    for v in seeds:
        s[idx[v]] = 1.0 / len(seeds)
    rank = s.copy()
    for _ in range(n_iter):
        contrib = np.zeros(n)
        for a, b in edges:
            contrib[idx[b]] += rank[idx[a]] / deg[idx[a]]
            contrib[idx[a]] += rank[idx[b]] / deg[idx[b]]
        rank = (1 - d) * s + d * contrib
    return {v: rank[idx[v]] for v in verts}


def test_personalized_pagerank_matches_numpy(spark, graph):
    pairs, canonical = graph
    got = {
        r["vertex"]: r["rank"]
        for r in pagerank.personalized_pagerank(
            spark, canonical, n_seeds=8, n_iterations=10
        ).collect()
    }
    expected = numpy_personalized_pagerank(pairs, n_seeds=8, n_iter=10)
    assert set(got) == set(expected)
    for v in expected:
        assert abs(got[v] - expected[v]) < 1e-9, v
    # mass conservation: init sums to 1 and the dangling-free update
    # preserves total mass
    assert abs(sum(got.values()) - 1.0) < 1e-6
    # locality: teleport concentrates mass on the seed set vs the uniform walk
    seeds = sorted(got)[:8]
    uni = {r["vertex"]: r["rank"] for r in pagerank.pagerank(spark, canonical, n_iterations=10).collect()}
    assert sum(got[v] for v in seeds) > sum(uni[v] for v in seeds)


def test_personalized_pagerank_explicit_seed_frame(spark, graph):
    pairs, canonical = graph
    from accelerating_tc_spark.sources import synthetic as syn
    from pyspark.sql import functions as F

    seeds = syn.edges_df(spark, [(600, 601)]).select(F.col("src").alias("vertex"))
    got = {
        r["vertex"]: r["rank"]
        for r in pagerank.personalized_pagerank(
            spark, canonical, seeds=seeds, n_iterations=10
        ).collect()
    }
    # all teleport mass stays inside the 2-vertex component {600, 601}
    assert abs(got[600] + got[601] - 1.0) < 1e-9
    assert all(abs(got[v]) < 1e-12 for v in got if v not in (600, 601))


def test_connected_components_exact(spark, graph):
    pairs, canonical = graph
    got = {
        r["vertex"]: r["component"]
        for r in components.connected_components(spark, canonical).collect()
    }
    assert got == python_components(pairs)


def test_cc_pointer_jumping_on_path_graph(spark):
    """High-diameter fixture: a 120-vertex path. Plain min-propagation needs
    O(diameter) rounds; pointer jumping must converge in O(log n) and give
    byte-identical labels."""
    pairs = [(i, i + 1) for i in range(119)]
    canonical = prep.canonicalize_edges(synthetic.edges_df(spark, pairs))
    jump = components.connected_components_run(spark, canonical, algorithm="jump")
    assert jump.converged and jump.iterations <= 12  # ~log2(120) + slack
    base = components.connected_components_run(
        spark, canonical, max_iterations=130, algorithm="minlabel"
    )
    assert base.converged and base.iterations > jump.iterations
    j = {r["vertex"]: r["component"] for r in jump.state.collect()}
    b = {r["vertex"]: r["component"] for r in base.state.collect()}
    assert j == b == {v: 0 for v in range(120)}


def test_iterate_nonconverged_raises(spark):
    """Exact-semantics operators must not silently return a non-fixpoint."""
    pairs = [(i, i + 1) for i in range(60)]
    canonical = prep.canonicalize_edges(synthetic.edges_df(spark, pairs))
    with pytest.raises(RuntimeError, match="NOT a fixpoint"):
        components.connected_components(
            spark, canonical, max_iterations=3, algorithm="minlabel"
        )


def test_label_propagation_matches_python(spark, graph):
    pairs, canonical = graph
    got = {
        r["vertex"]: r["label"]
        for r in labelprop.label_propagation(spark, canonical, n_iterations=5).collect()
    }
    assert got == python_label_prop(pairs, n_iter=5)


def test_label_propagation_big_ids_fallback(spark, graph):
    """Vertex ids beyond 2^31 must route the argmax through the generic
    max-count + min-label path (the r7 packed-long fast path is guarded by
    an id-bounds check). Shifting every id by a constant is a label-
    propagation homomorphism (counts unchanged, min-label tie-break order
    preserved), so the shifted run must equal the small-id run + offset."""
    from pyspark.sql import functions as F

    pairs, canonical = graph
    off = 1 << 33
    shifted = canonical.select(
        (F.col("src") + off).alias("src"), (F.col("dst") + off).alias("dst")
    )
    small = {
        r["vertex"]: r["label"]
        for r in labelprop.label_propagation(spark, canonical, n_iterations=3).collect()
    }
    big = {
        r["vertex"]: r["label"]
        for r in labelprop.label_propagation(spark, shifted, n_iterations=3).collect()
    }
    assert big == {v + off: lbl + off for v, lbl in small.items()}


def test_core_numbers_exact(spark, graph):
    pairs, canonical = graph
    got = {r["vertex"]: r["core"] for r in kcore.core_numbers(spark, canonical).collect()}
    expected = python_core_numbers(pairs)
    assert got == expected


def test_orient_by_core_preserves_edges_and_counts(spark, graph):
    from accelerating_tc_spark.operators import triangles

    pairs, canonical = graph
    cores = kcore.core_numbers(spark, canonical)
    oriented = kcore.orient_by_core(canonical, cores)
    assert oriented.count() == canonical.count()
    got = triangles.triangle_count_kernel(oriented).collect()[0]["triangles"]
    expected = synthetic.numpy_triangle_count(pairs)
    assert got == expected


def test_pagerank_checkpoint_resume(spark, graph, tmp_path):
    pairs, canonical = graph
    ckpt = str(tmp_path / "pr_ckpt")
    # interrupted run: only 4 iterations
    pagerank.pagerank(spark, canonical, n_iterations=4, checkpoint_dir=ckpt)
    from accelerating_tc_spark.operators.supersteps import latest_checkpoint

    assert latest_checkpoint(ckpt) == 3
    # resumed run continues from iter 3 to 10
    resumed = pagerank.pagerank(spark, canonical, n_iterations=10, checkpoint_dir=ckpt)
    fresh = pagerank.pagerank(spark, canonical, n_iterations=10)
    r = {x["vertex"]: x["rank"] for x in resumed.collect()}
    f = {x["vertex"]: x["rank"] for x in fresh.collect()}
    assert set(r) == set(f)
    for v in f:
        assert abs(r[v] - f[v]) < 1e-12
    # lineage metrics recorded per iteration
    lineage = (tmp_path / "pr_ckpt" / "lineage.jsonl").read_text().strip().splitlines()
    assert len(lineage) >= 10


def test_lineage_cutter_bounds_chains_and_survives_close(spark):
    """LineageCutter: every `every`-th cut is a parquet hard cut whose
    scratch slots are unique (lazy refs to earlier cut states stay valid),
    and close(final) re-anchors the result so it outlives the scratch dir."""
    import os

    from pyspark.sql import functions as F

    from accelerating_tc_spark.operators import supersteps

    cutter = supersteps.LineageCutter(spark, every=3, prefix="test-cutter-")
    state = spark.range(0, 100).select(F.col("id").alias("v"))
    kept = []
    for i in range(7):
        state = cutter.cut(state.select((F.col("v") + 1).alias("v")))
        kept.append(state)
    scratch = cutter.scratch
    assert scratch is not None and os.path.isdir(scratch)
    # unique slots: both hard cuts (i=2 and i=5) still readable
    assert len(os.listdir(scratch)) == 2
    assert kept[2].count() == 100 and kept[5].count() == 100
    final = cutter.close(state)
    assert not os.path.isdir(scratch)
    # final survives scratch removal and carries all 7 increments
    assert final.agg(F.min("v")).first()[0] == 7


def test_lineage_cutter_context_manager_cleans_on_exception(spark):
    """`with LineageCutter(...)` removes the scratch dir when the body
    raises (the r4 leak: a failed deep cascade left parquet scratch on
    disk), and stays a no-op after an explicit close()."""
    import os

    from pyspark.sql import functions as F

    from accelerating_tc_spark.operators import supersteps

    scratch_seen = None
    try:
        with supersteps.LineageCutter(spark, every=1, prefix="test-ctx-") as cutter:
            cutter.cut(spark.range(10).select(F.col("id").alias("v")))
            scratch_seen = cutter.scratch
            assert scratch_seen is not None and os.path.isdir(scratch_seen)
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert not os.path.isdir(scratch_seen)

    # success path: close(final) already cleaned; __exit__ must not break
    with supersteps.LineageCutter(spark, every=1, prefix="test-ctx2-") as cutter:
        st = cutter.cut(spark.range(5).select(F.col("id").alias("v")))
        final = cutter.close(st)
    assert final.count() == 5


def test_checkpoint_retention_keep_last_k(spark, tmp_path):
    """A 30-round checkpointed run with keep_checkpoints=3 retains at most
    3 iteration snapshots, and a resumed run continues from the newest
    surviving one (r5 verdict task 8)."""
    import os

    from accelerating_tc_spark.operators import supersteps
    from accelerating_tc_spark.sources import snapshots
    from pyspark.sql import functions as F

    ckpt = str(tmp_path / "ret_ckpt")
    initial = spark.range(5).select(F.col("id").alias("vertex"), F.lit(0).alias("val"))
    run = supersteps.iterate(
        spark,
        initial,
        step=lambda st, i: st.withColumn("val", F.col("val") + 1),
        max_iterations=30,
        checkpoint_dir=ckpt,
        keep_checkpoints=3,
    )
    assert run.iterations == 30
    iter_dirs = [n for n in os.listdir(ckpt) if n.startswith("iter=") and not n.endswith(".tmp")]
    assert len(iter_dirs) <= 3
    log = snapshots.ParquetIterationLog(spark, ckpt)
    assert log.latest() == 29
    assert log.completed() == [27, 28, 29]
    # resume continues from the newest surviving snapshot
    resumed = supersteps.iterate(
        spark,
        initial,
        step=lambda st, i: st.withColumn("val", F.col("val") + 1),
        max_iterations=32,
        checkpoint_dir=ckpt,
        keep_checkpoints=3,
    )
    vals = {r["vertex"]: r["val"] for r in resumed.state.collect()}
    assert vals == {v: 32 for v in range(5)}
    assert log.completed() == [29, 30, 31]


def test_prune_rejects_unsafe_keep(spark, tmp_path):
    from accelerating_tc_spark.sources import snapshots

    log = snapshots.ParquetIterationLog(spark, str(tmp_path / "p"))
    with pytest.raises(ValueError, match="keep_last"):
        log.prune(1)
