"""Streaming: incremental triangle maintenance + watermarked windows."""

from __future__ import annotations

import pandas as pd

from accelerating_tc_spark.operators import triangles
from accelerating_tc_spark.sources import synthetic
from accelerating_tc_spark.streaming import edges as stream_edges


def _write_batch(spark, path, pairs, name):
    df = synthetic.edges_df(spark, pairs)
    df.coalesce(1).write.mode("append").parquet(path)


def test_incremental_triangles_matches_batch(spark, tmp_path):
    input_path = str(tmp_path / "in")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    # three batches with growing overlap + dirt (dupes, self-loops)
    all_pairs = synthetic.powerlaw_edge_pairs(80, 400, seed=31).tolist()
    batches = [all_pairs[:130], all_pairs[130:260], all_pairs[260:] + all_pairs[:20]]
    for i, b in enumerate(batches):
        _write_batch(spark, input_path, b, f"b{i}")

    maintainer, _ = stream_edges.run_incremental_triangles(
        spark, input_path, state_dir, ckpt, available_now=True
    )
    totals = maintainer.totals()

    # oracle: full batch recount over everything delivered
    expected_tri = synthetic.numpy_triangle_count(all_pairs)
    clean = {(min(a, b), max(a, b)) for a, b in all_pairs if a != b}
    assert totals["triangles"] == expected_tri
    assert totals["edges"] == len(clean)

    # restart / re-delivery is idempotent: feed batch 0 again
    _write_batch(spark, input_path, batches[0], "replay")
    maintainer2, _ = stream_edges.run_incremental_triangles(
        spark, input_path, state_dir, ckpt, available_now=True
    )
    totals2 = maintainer2.totals()
    assert totals2["triangles"] == expected_tri
    assert totals2["edges"] == len(clean)


def test_incremental_class_decomposition(spark, tmp_path):
    """Hand-built case covering all three Δ-classes in one batch:
    old = {(0,1)}; Δ = {(1,2),(0,2), (3,4),(4,5),(3,5), (0,3)}.
    New triangles: (0,1,2) has 2 Δ edges (t2), (3,4,5) is all-Δ (t3)."""
    input_path = str(tmp_path / "in")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, input_path, [(0, 1)], "b0")
    maintainer, _ = stream_edges.run_incremental_triangles(
        spark, input_path, state_dir, ckpt
    )
    assert maintainer.totals()["triangles"] == 0
    _write_batch(
        spark, input_path, [(1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (0, 3)], "b1"
    )
    maintainer, _ = stream_edges.run_incremental_triangles(
        spark, input_path, state_dir, ckpt
    )
    assert maintainer.totals()["triangles"] == 2
    # t1 class: a single new edge closing two old edges
    _write_batch(spark, input_path, [(1, 3)], "b2")  # wedge 1-0-3 closes
    maintainer, _ = stream_edges.run_incremental_triangles(
        spark, input_path, state_dir, ckpt
    )
    assert maintainer.totals()["triangles"] == 3


def test_windowed_event_counts_plan(spark, tmp_path):
    """Streaming windowed agg: run via a file stream against the driver's
    events schema; results must equal the equivalent batch aggregation."""
    import os

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(500)
    src = str(tmp_path / "events_in")
    ev.coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .parquet(src)
        .select("ts", "event_type", "value")
    )
    out = stream_edges.windowed_event_counts(stream)
    # complete mode: append would finalize windows only once the watermark
    # passes them, which a single availableNow batch never does
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM win_counts").toPandas()
    # same function runs in batch mode (minus the watermark semantics,
    # irrelevant for complete replay of on-time data)
    expected = stream_edges.windowed_event_counts(
        ev.select("ts", "event_type", "value")
    ).toPandas()
    key = ["window_start", "event_type"]
    got_s = got.sort_values(key).reset_index(drop=True)
    exp_s = expected.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, exp_s, check_dtype=False)


def test_crash_between_commit_and_publish_recovers(spark, tmp_path):
    """state.json is the commit point: a crash AFTER the state write but
    BEFORE the staged delta is published must be healed by recovery (files
    published, replayed batch skipped) with no double count and no loss."""
    import json
    import os

    state_dir = str(tmp_path / "state")
    m = stream_edges.TriangleMaintainer(spark, state_dir)
    m.process_batch(synthetic.edges_df(spark, [(0, 1), (1, 2), (0, 2)]), 0)
    assert m.totals() == {"triangles": 1, "edges": 3, "batches": 1, "last_batch_id": 0}

    # simulate batch 1: stage + commit, then "crash" before publish
    delta = synthetic.edges_df(spark, [(2, 3), (0, 3)])
    delta.write.mode("overwrite").parquet(m._pending_dir(1))
    st = m.totals()
    st.update(triangles=2, edges=5, batches=2, last_batch_id=1)  # (0,2,3) closes
    with open(m.state_path, "w") as fh:
        json.dump(st, fh)

    m2 = stream_edges.TriangleMaintainer(spark, state_dir)  # recovery runs here
    assert not os.path.isdir(m2._pending_dir(1))
    assert m2._store().count() == 5  # staged files were published
    # replay of the committed batch is skipped — counts unchanged
    m2.process_batch(synthetic.edges_df(spark, [(2, 3), (0, 3)]), 1)
    assert m2.totals()["triangles"] == 2 and m2.totals()["edges"] == 5
    # the NEXT batch still processes normally on the healed store
    m2.process_batch(synthetic.edges_df(spark, [(1, 3)]), 2)
    assert m2.totals()["triangles"] == 4  # (0,1,3) and (1,2,?) -> 1-3 closes 0-1/0-3 and 1-2/2-3


def test_uncommitted_staging_discarded(spark, tmp_path):
    """Staging without a matching committed state (crash BEFORE the state
    write) is dropped on recovery; the re-delivered batch recomputes it."""
    import os

    state_dir = str(tmp_path / "state")
    m = stream_edges.TriangleMaintainer(spark, state_dir)
    m.process_batch(synthetic.edges_df(spark, [(0, 1)]), 0)
    synthetic.edges_df(spark, [(1, 2)]).write.mode("overwrite").parquet(m._pending_dir(5))
    m2 = stream_edges.TriangleMaintainer(spark, state_dir)
    assert not os.path.isdir(m2._pending_dir(5))
    m2.process_batch(synthetic.edges_df(spark, [(1, 2), (0, 2)]), 5)
    assert m2.totals()["triangles"] == 1 and m2.totals()["edges"] == 3


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Stateful sessionization (applyInPandasWithState): sessions emitted
    by the stream (gap-split + event-time timeout) must equal the batch
    lag/cumsum sessionizer over the same closed event log."""
    import os
    import time as _time

    import pandas as pd

    from accelerating_tc_spark.streaming import sessions as S

    in_dir = str(tmp_path / "ev_in")
    os.makedirs(in_dir, exist_ok=True)
    t0 = pd.Timestamp("2026-01-01 00:00:00")

    def write_file(rows, name):
        pdf = pd.DataFrame(rows, columns=["ts", "event_type", "user_id", "value"])
        df = spark.createDataFrame(
            pdf, schema="ts timestamp, event_type string, user_id long, value double"
        )
        df.coalesce(1).write.mode("append").parquet(in_dir)
        _time.sleep(1.1)  # distinct mtimes -> stable file-source batch order

    real = [
        (t0, "c", 1, 1.0),
        (t0 + pd.Timedelta(seconds=10), "c", 1, 2.0),
        (t0 + pd.Timedelta(seconds=2000), "c", 1, 4.0),  # > gap: new session
        (t0 + pd.Timedelta(seconds=5), "v", 2, 8.0),
    ]
    write_file(real, "b0")
    # two watermark-advancing sentinel batches so event-time timeouts fire
    write_file([(t0 + pd.Timedelta(days=10), "s", 999, 0.0)], "b1")
    write_file([(t0 + pd.Timedelta(days=20), "s", 999, 0.0)], "b2")

    stream = (
        spark.readStream.schema("ts timestamp, event_type string, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out = S.sessionize_stream(stream, gap_seconds=1800, watermark="10 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
        if r["user_id"] != 999
    }
    batch_df = spark.createDataFrame(
        pd.DataFrame(real, columns=["ts", "event_type", "user_id", "value"]),
        schema="ts timestamp, event_type string, user_id long, value double",
    )
    expected = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["sum_value"])
        for r in S.sessionize_batch(batch_df, gap_seconds=1800).collect()
    }
    assert got == expected
    assert len(expected) == 3  # u1 x2 sessions, u2 x1


def test_sessionize_stream_out_of_order(spark, tmp_path):
    """Out-of-order events ACROSS micro-batches (admitted by the watermark)
    must still yield batch-identical sessions: a late event earlier than
    the open session's start must lower session_start, and a late event
    bridging two runs must merge them — the buffered-state design emits a
    session only once the watermark seals it."""
    import os
    import time as _time

    import pandas as pd

    from accelerating_tc_spark.streaming import sessions as S

    in_dir = str(tmp_path / "ev_in")
    os.makedirs(in_dir, exist_ok=True)
    t0 = pd.Timestamp("2026-01-01 00:00:00")

    def write_file(rows):
        pdf = pd.DataFrame(rows, columns=["ts", "event_type", "user_id", "value"])
        df = spark.createDataFrame(
            pdf, schema="ts timestamp, event_type string, user_id long, value double"
        )
        df.coalesce(1).write.mode("append").parquet(in_dir)
        _time.sleep(1.1)

    real = [
        (t0 + pd.Timedelta(seconds=100), "c", 1, 1.0),
        (t0 + pd.Timedelta(seconds=120), "c", 1, 2.0),
        # late, EARLIER than the open session's start (old code kept start=100)
        (t0 + pd.Timedelta(seconds=40), "c", 1, 4.0),
        # two runs separated by > gap only until the bridge arrives
        (t0 + pd.Timedelta(seconds=5000), "c", 2, 1.0),
        (t0 + pd.Timedelta(seconds=8000), "c", 2, 2.0),
        # late bridge event: merges u2's two runs into ONE session
        (t0 + pd.Timedelta(seconds=6800), "c", 2, 8.0),
    ]
    write_file(real[:2])
    write_file([real[2], real[3]])
    write_file([real[4]])
    write_file([real[5]])
    # sentinel batches advance the watermark so everything finalizes
    write_file([(t0 + pd.Timedelta(days=10), "s", 999, 0.0)])
    write_file([(t0 + pd.Timedelta(days=20), "s", 999, 0.0)])

    stream = (
        spark.readStream.schema("ts timestamp, event_type string, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    # watermark must admit the late events: 3 hours covers the 2200s/2000s lags
    out = S.sessionize_stream(stream, gap_seconds=1800, watermark="3 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_ooo")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM sess_ooo").collect()
        if r["user_id"] != 999
    }
    batch_df = spark.createDataFrame(
        pd.DataFrame(real, columns=["ts", "event_type", "user_id", "value"]),
        schema="ts timestamp, event_type string, user_id long, value double",
    )
    expected = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["sum_value"])
        for r in S.sessionize_batch(batch_df, gap_seconds=1800).collect()
    }
    assert got == expected
    # u1: ONE session starting at the late t0+40; u2: ONE merged session
    assert len(expected) == 2
    starts = {r[0]: r[1] for r in expected}
    assert starts[1] == (t0 + pd.Timedelta(seconds=40)).to_pydatetime()


def test_incremental_components_matches_batch(spark, tmp_path):
    """Incremental CC: labels after each replayed prefix must equal batch
    CC of everything delivered so far — including cross-batch merges of
    previously separate components — and re-delivery is a no-op."""
    import time as _time

    from accelerating_tc_spark.operators import components as C
    from accelerating_tc_spark.operators import prep
    from accelerating_tc_spark.streaming import components as SC

    in_dir = str(tmp_path / "in")
    batches = [
        [(1, 2), (3, 4), (10, 11)],       # three components
        [(2, 3), (20, 21)],               # merges {1,2}+{3,4}; new comp
        [(4, 10), (21, 1)],               # chains everything except...
        [(1, 2)],                         # pure re-delivery: no-op
    ]
    delivered: list = []
    maintainer = None
    for i, b in enumerate(batches):
        synthetic.edges_df(spark, b).coalesce(1).write.mode("append").parquet(in_dir)
        _time.sleep(1.1)
        maintainer, _ = SC.run_incremental_components(
            spark, in_dir, str(tmp_path / "state"), str(tmp_path / "ckpt")
        )
        delivered += b
        got = {
            r["vertex"]: r["component"] for r in maintainer.labels().collect()
        }
        exact = {
            r["vertex"]: r["component"]
            for r in C.connected_components(
                spark, prep.canonicalize_edges(synthetic.edges_df(spark, delivered))
            ).collect()
        }
        assert got == exact, f"after batch {i}"
    # final shape: {1,2,3,4,10,11,20,21} one component
    labels = {r["component"] for r in maintainer.labels().collect()}
    assert labels == {1}


def test_component_store_crash_between_write_and_pointer_flip(spark, tmp_path):
    """A crash AFTER the new labels.vN parquet is written but BEFORE the
    CURRENT pointer flips must leave the previous committed table intact:
    the orphan version dir is GC'd on restart, labels() serves the old
    version, and the replayed batch recommits the identical merge."""
    import os

    from accelerating_tc_spark.streaming import components as SC

    state_dir = str(tmp_path / "state")
    m = SC.ComponentMaintainer(spark, state_dir)
    m.process_batch(synthetic.edges_df(spark, [(1, 2), (3, 4)]), 0)
    committed = {r["vertex"]: r["component"] for r in m.labels().collect()}
    assert committed == {1: 1, 2: 1, 3: 3, 4: 3}

    # simulate the crash: write an orphan next-version dir, don't flip
    orphan = m._version_dir(m._current_version() + 1)
    synthetic.edges_df(spark, [(7, 7)]).write.mode("overwrite").parquet(orphan)
    assert os.path.isdir(orphan)

    m2 = SC.ComponentMaintainer(spark, state_dir)
    assert not os.path.isdir(orphan)  # GC'd on startup
    assert {r["vertex"]: r["component"] for r in m2.labels().collect()} == committed

    # replayed batch (same edges) is a no-op merge; a real batch commits
    m2.process_batch(synthetic.edges_df(spark, [(1, 2), (3, 4)]), 0)
    m2.process_batch(synthetic.edges_df(spark, [(2, 3)]), 1)
    assert {r["component"] for r in m2.labels().collect()} == {1}


def test_component_store_crash_after_flip_before_gc(spark, tmp_path):
    """A crash AFTER the pointer flip but BEFORE the superseded version is
    removed must serve the NEW table and clean the leftover on restart."""
    import os

    from accelerating_tc_spark.streaming import components as SC

    state_dir = str(tmp_path / "state")
    m = SC.ComponentMaintainer(spark, state_dir)
    m.process_batch(synthetic.edges_df(spark, [(1, 2)]), 0)
    m.process_batch(synthetic.edges_df(spark, [(2, 3)]), 1)
    # simulate the leftover: recreate a stale older version dir
    stale = m._version_dir(m._current_version() - 1)
    synthetic.edges_df(spark, [(9, 9)]).write.mode("overwrite").parquet(stale)

    m2 = SC.ComponentMaintainer(spark, state_dir)
    assert not os.path.isdir(stale)
    assert {r["vertex"]: r["component"] for r in m2.labels().collect()} == {
        1: 1, 2: 1, 3: 1
    }
