"""Genuine Structured Streaming execution of the streaming module:
file-source readStream + watermark + AvailableNow trigger, asserted
equal to the batch formulation of the same transformation."""

from __future__ import annotations

import uuid

import pytest

from pyspark.sql import functions as F

from aws_etl_spark.queries.registry import load_table
from aws_etl_spark.streaming.sessions import streaming_session_window
from aws_etl_spark.streaming.windows import (
    tumbling_counts,
    watermark_dedup,
)


def _events_batch(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _stream_from(spark, batch_df, tmp_path):
    """Write the batch out as parquet and re-read it as a file stream
    (micros timestamps, so the stream schema is stream-compatible)."""
    path = f"{tmp_path}/events_stream_src"
    batch_df.write.mode("overwrite").parquet(path)
    return spark.readStream.schema(batch_df.schema).parquet(path)


def _run_to_memory(stream_df, mode="complete"):
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name


def test_streaming_tumbling_equals_batch(spark, sf_dir, tmp_path):
    batch_events = _events_batch(spark, sf_dir)
    expected = sorted(
        map(tuple, tumbling_counts(batch_events, window="1 hour").collect())
    )
    stream = _stream_from(spark, batch_events, tmp_path)
    agg = tumbling_counts(stream, window="1 hour", watermark="2 hours")
    name = _run_to_memory(agg, mode="complete")
    got = sorted(map(tuple, spark.sql(f"SELECT * FROM {name}").collect()))
    assert got == expected


def test_streaming_watermark_dedup(spark, sf_dir, tmp_path):
    batch_events = _events_batch(spark, sf_dir).limit(200)
    doubled = batch_events.unionByName(batch_events)  # inject duplicates
    stream = _stream_from(spark, doubled, tmp_path)
    deduped = watermark_dedup(stream, ["event_id"], watermark="10 minutes")
    name = _run_to_memory(deduped, mode="append")
    n = spark.sql(f"SELECT COUNT(DISTINCT event_id) AS n FROM {name}").first().n
    total = spark.sql(f"SELECT COUNT(*) AS n FROM {name}").first().n
    assert n == 200
    assert total == 200  # every duplicate dropped by state, not by luck


def test_streaming_session_window_runs(spark, sf_dir, tmp_path):
    batch_events = _events_batch(spark, sf_dir)
    stream = _stream_from(spark, batch_events, tmp_path)
    sess = streaming_session_window(stream, gap="30 minutes", watermark="1 hour")
    name = _run_to_memory(sess, mode="complete")
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert len(rows) > 0
    # session windows must respect the gap: end - start covers ≥1 event
    assert all(r.n_events >= 1 for r in rows)
    # batch sessionization at the same gap yields the same session count
    from aws_etl_spark.streaming.sessions import session_rollup

    batch_n = session_rollup(batch_events, gap_minutes=30).count()
    assert len(rows) == batch_n


def test_stateful_running_totals(spark, sf_dir, tmp_path):
    """applyInPandasWithState: per-user state folds across micro-batches
    (maxFilesPerTrigger=1 over multiple files forces >1 batch); the
    final emitted row per user must equal the batch aggregate."""
    from aws_etl_spark.streaming.stateful import running_user_totals

    batch_events = _events_batch(spark, sf_dir).filter(F.col("user_id") < 50)
    path = f"{tmp_path}/stateful_src"
    # several input files -> several micro-batches -> state is exercised
    batch_events.repartition(4).write.mode("overwrite").parquet(path)
    stream = (
        spark.readStream.schema(batch_events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = running_user_totals(stream)
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # memory sink in update mode appends each emitted update; the LAST
    # row per user is the final state
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
        for _ in [None]
    }
    # dict comprehension keeps the last occurrence per user (rows arrive
    # in emission order within each micro-batch group)
    expected = {
        r.user_id: (r.n, r.total)
        for r in batch_events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got.keys() == expected.keys()
    for uid, (n, total) in expected.items():
        assert got[uid][0] == n, uid
        assert abs(got[uid][1] - total) < 1e-6 * max(1.0, abs(total)), uid


def test_stream_static_join(spark, sf_dir, tmp_path):
    """Stream-static enrichment joins each micro-batch against a static
    dim; result equals the batch join."""
    from aws_etl_spark.streaming.windows import enrich_stream

    events = _events_batch(spark, sf_dir).limit(500)
    dim = (
        events.select("user_id").distinct()
        .withColumn("user_tier", (F.col("user_id") % 3).cast("int"))
    )
    expected = sorted(
        map(tuple, events.join(dim, "user_id", "left")
            .select("event_id", "user_tier").collect())
    )
    stream = _stream_from(spark, events, tmp_path)
    out = enrich_stream(stream, dim, "user_id").select("event_id", "user_tier")
    name = _run_to_memory(out, mode="append")
    got = sorted(map(tuple, spark.sql(f"SELECT * FROM {name}").collect()))
    assert got == expected


def test_streaming_checkpoint_recovery(spark, sf_dir, tmp_path):
    """Exactly-once across restarts: run with a checkpoint, stop, add
    NEW input files, restart with the same checkpoint — the second run
    processes only the new files (no reprocessing, no loss)."""
    events = _events_batch(spark, sf_dir).limit(400)
    first, second = events.filter(F.col("event_id") % 2 == 0), events.filter(
        F.col("event_id") % 2 == 1
    )
    src = f"{tmp_path}/ckpt_src"
    ckpt = f"{tmp_path}/ckpt"
    out = f"{tmp_path}/ckpt_out"
    first.write.mode("overwrite").parquet(src)

    def run_once():
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n_first = spark.read.parquet(out).count()
    assert n_first == first.count()
    second.write.mode("append").parquet(src)
    run_once()
    result = spark.read.parquet(out)
    assert result.count() == events.count()  # nothing lost
    assert result.select("event_id").distinct().count() == events.count()  # nothing duplicated


def test_cdc_apply_stream(spark, sf_dir, tmp_path):
    """foreachBatch CDC: a change stream (several micro-batches, several
    updates per key) merged into a parquet target equals the latest
    state per key."""
    from aws_etl_spark.streaming.cdc import cdc_writer

    events = _events_batch(spark, sf_dir).filter(F.col("user_id") < 30).select(
        "user_id", "ts", "event_type", "value"
    )
    src = f"{tmp_path}/cdc_src"
    events.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    target = f"{tmp_path}/cdc_target"
    q = (
        cdc_writer(stream, target, ["user_id"], "ts", f"{tmp_path}/cdc_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.user_id: (r.ts, r.event_type) for r in spark.read.parquet(target).collect()}
    from pyspark.sql import Window as W

    latest = (
        events.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id").orderBy(F.col("ts").desc())
            ),
        )
        .filter("rn = 1")
    )
    expected = {r.user_id: (r.ts, r.event_type) for r in latest.collect()}
    assert got.keys() == expected.keys()
    # every key's final state is SOME maximal-ts row (ties on ts may
    # pick either; compare timestamps which are the merge criterion)
    for k in expected:
        assert got[k][0] == expected[k][0], k


def test_closed_sessions_event_time_timeout(spark, sf_dir, tmp_path):
    """applyInPandasWithState with EventTimeTimeout: sessions are
    emitted exactly once, on close (in-batch gap or watermark passing
    last+gap). Cross-validated against the batch sessionizer: after a
    far-future sentinel advances the watermark, every real user
    session must have closed."""
    import os
    import time

    from aws_etl_spark.streaming.sessions import session_rollup
    from aws_etl_spark.streaming.stateful import closed_sessions

    batch_events = _events_batch(spark, sf_dir).select(
        "user_id", "event_id", "ts", "value"
    )
    expected = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in session_rollup(
            batch_events.withColumn("event_type", F.lit("x")), gap_minutes=30
        ).collect()
    }

    src = f"{tmp_path}/closed_sessions_src"
    os.makedirs(src, exist_ok=True)
    batch_events.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # file source orders batches by modification time
    sentinel = batch_events.limit(1).select(
        F.lit(-1).cast("long").alias("user_id"),
        F.lit(-1).cast("long").alias("event_id"),
        (F.col("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
        F.lit(0.0).alias("value"),
    )
    sentinel.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(batch_events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    name = _run_to_memory(closed_sessions(stream), mode="append")
    got_rows = spark.sql(
        f"SELECT * FROM {name} WHERE user_id >= 0"
    ).collect()
    got = {
        (
            r["user_id"],
            # state carries epoch micros; batch carries timestamps
            __import__("datetime").datetime.fromtimestamp(
                r["session_start"] / 1e6, tz=__import__("datetime").timezone.utc
            ).replace(tzinfo=None),
            __import__("datetime").datetime.fromtimestamp(
                r["session_end"] / 1e6, tz=__import__("datetime").timezone.utc
            ).replace(tzinfo=None),
            r["n_events"],
        )
        for r in got_rows
    }
    # every emitted session is a true batch session, emitted once
    assert len(got_rows) == len(got)
    assert got <= expected
    # the sentinel advanced the watermark past every real session's
    # last+gap, so ALL real sessions must have closed
    assert got == expected


def test_stream_stream_interval_join(spark, sf_dir, tmp_path):
    """Watermarked stream-stream join equals the batch interval join:
    'views' (even event ids) join 'actions' (odd event ids) of the
    same user within a 5-minute lookback."""
    from aws_etl_spark.streaming.windows import stream_stream_interval_join

    events = _events_batch(spark, sf_dir).select(
        "event_id", "user_id", "ts", "value"
    ).limit(2000)
    views = events.filter(F.col("event_id") % 2 == 0)
    actions = events.filter(F.col("event_id") % 2 == 1)

    batch = (
        views.alias("v")
        .join(
            actions.alias("a"),
            F.expr(
                "v.user_id = a.user_id AND "
                "v.ts BETWEEN a.ts - INTERVAL 5 minutes AND a.ts"
            ),
        )
        .select(
            F.col("v.event_id").alias("l_event"),
            F.col("a.event_id").alias("r_event"),
        )
    )
    expected = sorted(map(tuple, batch.collect()))

    vs = _stream_from(spark, views, tmp_path / "views")
    ast = _stream_from(spark, actions, tmp_path / "actions")
    joined = stream_stream_interval_join(
        vs, ast, key="user_id", watermark="1 hour", max_lag="5 minutes"
    ).select(
        F.col("event_id").alias("l_event"),
        F.col("r_event_id").alias("r_event"),
    )
    name = _run_to_memory(joined, mode="append")
    got = sorted(map(tuple, spark.sql(f"SELECT * FROM {name}").collect()))
    assert got == expected and len(got) > 0


def test_streaming_heavy_hitters_error_contract(spark, sf_dir):
    """Misra-Gries guarantees: per shard, counter ≤ true count and
    true − counter ≤ decrements ≤ shard_rows/(capacity+1); every value
    with true count above the decrement bound MUST appear."""
    from aws_etl_spark.queries.registry import REGISTRY, _ensure_loaded
    from aws_etl_spark.streaming.heavy_hitters import DEFAULT_CAPACITY

    _ensure_loaded()
    # run the live stream query (memory sink), then read its inputs
    merged = REGISTRY["events_stream_heavy_hitters"].fn(spark, sf_dir)
    top = {
        (r.event_type, r.user_id): r.est_count for r in merged.collect()
    }
    assert top, "stream produced no summaries"

    from pyspark.sql import functions as F

    from aws_etl_spark.queries.registry import load_table

    events = load_table(spark, sf_dir, "events")
    exact = {
        (r.event_type, r.user_id): r.n
        for r in events.groupBy("event_type", "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    shard_rows = {
        (r.event_type, r.shard): r.n
        for r in events.withColumn("shard", F.pmod("user_id", F.lit(8)))
        .groupBy("event_type", "shard")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for (etype, user), est in top.items():
        true = exact[(etype, user)]
        bound = shard_rows[(etype, user % 8)] // (DEFAULT_CAPACITY + 1)
        assert est <= true, (etype, user, est, true)
        assert true - est <= bound, (etype, user, est, true, bound)


def test_heavy_hitters_merge_dedupes_by_snapshot_seq(spark):
    """ADVICE r2: an update-mode memory sink appends EVERY batch's
    snapshot; the merge must keep only the latest snapshot per shard
    keyed by the strictly-increasing snapshot_seq — two snapshots with
    EQUAL shard_rows (as an empty-batch state-fn invocation under a
    timeout would produce) must not double est_count."""
    from aws_etl_spark.streaming.heavy_hitters import merge_shard_summaries

    rows = [
        # (event_type, shard, user_id, mg_count, shard_rows, seq)
        ("click", 0, 1, 10, 100, 1),   # older snapshot
        ("click", 0, 1, 12, 120, 2),   # newer snapshot, more rows
        ("click", 0, 1, 12, 120, 3),   # empty-batch re-emit: SAME rows
        ("click", 1, 2, 7, 50, 1),
    ]
    summaries = spark.createDataFrame(
        rows,
        "event_type string, shard long, user_id long, mg_count long, "
        "shard_rows long, snapshot_seq long",
    )
    got = {
        (r.event_type, r.user_id): r.est_count
        for r in merge_shard_summaries(summaries).collect()
    }
    # shard 0 must contribute 12 exactly once (not 24, not 10+12)
    assert got[("click", 1)] == 12, got
    assert got[("click", 2)] == 7, got


def test_foreachbatch_idempotent_sink(spark, sf_dir, tmp_path):
    """Exactly-once sink discipline: a foreachBatch writer keyed on
    batchId (overwrite-by-batch-partition) must be IDEMPOTENT — Spark
    re-runs a batch after failure, so applying the same (batchId,
    data) twice must leave the same table state."""
    import pyspark.sql.functions as F

    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    out_dir = str(tmp_path / "sink")

    def write_batch(df, batch_id):
        # dynamic partition overwrite on the batch column: replaying a
        # batch replaces its own partition, never duplicates rows
        (df.withColumn("__batch", F.lit(batch_id))
           .write.mode("overwrite")
           .option("partitionOverwriteMode", "dynamic")
           .partitionBy("__batch")
           .parquet(out_dir))

    from aws_etl_spark.queries.registry import normalize_timestamps

    stream = normalize_timestamps(
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    ).select("event_id", "event_type")

    for _ in range(2):  # second run replays the same source batch
        q = (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", str(tmp_path / f"ck_{_}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    n_src = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    got = spark.read.parquet(out_dir)
    assert got.count() == n_src, "replay duplicated rows"
    assert got.select("event_id").distinct().count() == n_src


def test_transform_with_state_running_totals(spark, sf_dir, tmp_path):
    """transformWithStateInPandas (Spark 4 StatefulProcessor): the
    running-totals processor must fold state across micro-batches and
    end at the same per-user totals as (a) the batch aggregate and
    (b) its applyInPandasWithState twin's contract."""
    from aws_etl_spark.streaming.tws import running_totals_tws, tws_available

    if not tws_available():
        import pytest

        pytest.skip(
            "transformWithState needs google.protobuf (absent in this "
            "env; no installs) — operator gated behind tws_available()"
        )
    batch_events = _events_batch(spark, sf_dir).filter(F.col("user_id") < 50)
    path = f"{tmp_path}/tws_src"
    batch_events.repartition(4).write.mode("overwrite").parquet(path)
    stream = (
        spark.readStream.schema(batch_events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
        .select("user_id", "value")
    )
    out = running_totals_tws(stream)
    name = f"tws_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode memory sinks append every micro-batch's snapshot and
    # collect() order is NOT guaranteed — reduce to the final snapshot
    # per key by max n_events (monotone per user across batches)
    # instead of trusting the last-collected row
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("n_events", "total_value"), F.col("n_events")
            ).alias("final")
        )
        .select("user_id", "final.n_events", "final.total_value")
        .collect()
    }
    expected = {
        r.user_id: (r.n, r.total)
        for r in batch_events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got.keys() == expected.keys()
    for uid, (n, total) in expected.items():
        assert got[uid][0] == n, uid
        assert abs(got[uid][1] - total) < 1e-6 * max(1.0, abs(total)), uid


def test_tws_gate_probe_both_branches(monkeypatch):
    """The transformWithState env-gate itself is tested, not just used
    to skip: tws_available() must (a) report the real environment's
    protobuf state, (b) return True when find_spec resolves the module,
    and (c) return False both when find_spec returns None and when the
    parent package is absent entirely (find_spec raising
    ModuleNotFoundError — the actual behavior in a no-google env)."""
    import importlib.util

    from aws_etl_spark.streaming import tws

    # (a) live probe agrees with an independent check of the env
    try:
        really_there = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        really_there = False
    assert tws.tws_available() is really_there

    # (b) present → True
    class _Spec:
        pass

    monkeypatch.setattr(
        importlib.util, "find_spec", lambda name: _Spec()
    )
    assert tws.tws_available() is True

    # (c1) resolvable parent, missing module → False
    monkeypatch.setattr(importlib.util, "find_spec", lambda name: None)
    assert tws.tws_available() is False

    # (c2) parent package absent → find_spec itself raises → False
    def _boom(name):
        raise ModuleNotFoundError("No module named 'google'")

    monkeypatch.setattr(importlib.util, "find_spec", _boom)
    assert tws.tws_available() is False


@pytest.mark.slow  # round-14 verify-budget split (r13 verdict item 1)
def test_closed_sessions_restart_mid_batch_equals_uninterrupted(
    spark, sf_dir, tmp_path
):
    """Restart EXACTNESS for the stateful sessionizer: a run killed
    mid-batch (injected sink failure after the batch is computed but
    before it commits) and resumed from its checkpoint must produce
    output identical to an uninterrupted run over the same file
    sequence. This is the property checkpointing claims: state-store
    versions commit atomically with the batch, so the failed batch
    replays against restored pre-batch state — no session lost, none
    emitted twice, none split differently."""
    import time

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from aws_etl_spark.streaming.stateful import closed_sessions

    base = (
        _events_batch(spark, sf_dir)
        .filter(F.col("user_id") < 40)
        .select("user_id", "event_id", "ts", "value")
    )
    first = base.filter(F.dayofmonth("ts") <= 15)
    second = base.filter(F.dayofmonth("ts") > 15)
    sentinel = base.limit(1).select(
        F.lit(-1).cast("long").alias("user_id"),
        F.lit(-1).cast("long").alias("event_id"),
        (F.col("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
        F.lit(0.0).alias("value"),
    )

    def make_src(tag):
        # identical 3-file arrival order for both runs (file source
        # batches by modification time; maxFilesPerTrigger=1 makes the
        # batch boundaries deterministic)
        src = f"{tmp_path}/restart_src_{tag}"
        for part in (first, second, sentinel):
            part.coalesce(1).write.mode("append").parquet(src)
            time.sleep(1.1)
        return src

    def run(tag, fail_batch=None):
        src = make_src(tag)
        out = f"{tmp_path}/restart_out_{tag}"
        ckpt = f"{tmp_path}/restart_ckpt_{tag}"
        flag = tmp_path / f"fail_once_{tag}"
        if fail_batch is not None:
            flag.touch()

        def sink(df, batch_id):
            if batch_id == fail_batch and flag.exists():
                flag.unlink()
                raise RuntimeError("injected mid-batch failure")
            df.write.mode("append").parquet(out)

        stream = (
            spark.readStream.schema(base.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            closed_sessions(stream)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        except StreamingQueryException:
            assert fail_batch is not None, "unexpected stream failure"
            # resume from the same checkpoint: the failed batch replays
            q2 = (
                closed_sessions(stream)
                .writeStream.foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q2.awaitTermination()
        return {
            (r["user_id"], r["session_start"], r["session_end"],
             r["n_events"])
            for r in spark.read.parquet(out).collect()
            if r["user_id"] >= 0
        }

    uninterrupted = run("plain")
    resumed = run("killed", fail_batch=1)
    assert len(uninterrupted) > 0
    assert resumed == uninterrupted
