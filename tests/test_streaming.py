"""Structured Streaming tests: stream-batch equivalence, watermark
late-data behavior, streaming dedup, and stateful processing."""

from __future__ import annotations

import uuid

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dfs_w_mapreduce_spark.catalog import table_path
from dfs_w_mapreduce_spark.streaming import windows as SW

def _stream_events(spark, sf_dir):
    # Physical-layout-agnostic reader (int64 nanos vs TIMESTAMP_NTZ).
    return SW.stream_events(spark, sf_dir)


def _run_to_memory(df, mode="complete"):
    name = "t_" + uuid.uuid4().hex[:12]
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()
    return name


def test_stream_batch_equivalence_tumbling(spark, sf_dir):
    """The same tumbling agg through readStream must equal batch."""
    stream_df = SW.tumbling_agg(_stream_events(spark, sf_dir).withWatermark("ts", "1 hour"))
    name = _run_to_memory(stream_df)
    got = {
        (r.window_start, r.event_type, r.n, r.total)
        for r in spark.table(name).collect()
    }
    want = {
        (r.window_start, r.event_type, r.n, r.total)
        for r in SW.q_stream_tumbling(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0


def test_stream_append_mode_watermark_closes_windows(spark, sf_dir):
    """Append mode only emits windows the watermark has passed: with
    a 1-hour watermark over a finite replay, every window except those
    within the final hour must be emitted — i.e. append-mode output is
    a prefix-closed subset of the complete batch result."""
    stream_df = SW.tumbling_agg(_stream_events(spark, sf_dir).withWatermark("ts", "1 hour"))
    name = _run_to_memory(stream_df, mode="append")
    appended = {
        (r.window_start, r.event_type, r.n, r.total)
        for r in spark.table(name).collect()
    }
    batch = {
        (r.window_start, r.event_type, r.n, r.total)
        for r in SW.q_stream_tumbling(spark, sf_dir).collect()
    }
    assert appended <= batch
    max_ts = max(r[0] for r in batch)
    closed = {r for r in batch if (max_ts - r[0]).total_seconds() > 3600 + 600}
    assert closed <= appended, "watermark failed to close old windows"


def test_stream_dropduplicates_with_watermark(spark, sf_dir):
    """Streaming exact-dedup on event_id with a watermark bounds state
    and must keep exactly the distinct ids."""
    ev = _stream_events(spark, sf_dir)
    dups = ev.union(ev)  # replay twice => every id duplicated
    deduped = dups.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
    name = _run_to_memory(deduped.groupBy().agg(F.count("*").alias("n")))
    n = spark.table(name).collect()[0].n
    batch_n = (
        spark.read.parquet(table_path(sf_dir, "events")).count()
    )
    assert n == batch_n


def test_apply_in_pandas_with_state(spark, sf_dir):
    """Custom stateful operator: running per-user event count via
    applyInPandasWithState (the arbitrary-stateful-reduce escape
    hatch, streaming analog of the reference's Reduce generality)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def count_fn(key, pdfs, state):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    ev = _stream_events(spark, sf_dir)
    counted = ev.groupBy("user_id").applyInPandasWithState(
        count_fn,
        outputStructType="user_id long, n long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = _run_to_memory(counted, mode="update")
    got = {(r.user_id, r.n) for r in spark.table(name).collect()}
    want = {
        (r.user_id, r.n)
        for r in spark.read.parquet(table_path(sf_dir, "events"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # update-mode emits one row per user per microbatch; final counts
    # (the max per user) must equal the batch counts.
    final = {}
    for u, n in got:
        final[u] = max(final.get(u, 0), n)
    assert set(final.items()) == want


def test_foreach_batch_exactly_once_sink(spark, sf_dir, tmp_path):
    """foreachBatch + checkpoint: the custom-sink pattern for
    exactly-once delivery. Each microbatch writes one parquet dir;
    restarting from the same checkpoint with no new data must not
    rewrite or duplicate anything."""
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(df, epoch_id):
        df.write.mode("overwrite").parquet(f"{out}/epoch={epoch_id}")

    def run():
        q = (
            _stream_events(spark, sf_dir)
            .writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()

    run()
    first = spark.read.parquet(out).count()
    batch_n = spark.read.parquet(table_path(sf_dir, "events")).count()
    assert first == batch_n
    run()  # replay from checkpoint: no new input => no new epochs
    assert spark.read.parquet(out).count() == batch_n


def test_live_query_matches_batch(spark, sf_dir):
    live = {
        (r.window_start, r.event_type, r.n, r.total)
        for r in SW.q_stream_tumbling_live(spark, sf_dir).collect()
    }
    batch = {
        (r.window_start, r.event_type, r.n, r.total)
        for r in SW.q_stream_tumbling(spark, sf_dir).collect()
    }
    assert live == batch


def test_stream_session_window_matches_batch(spark, sf_dir):
    """session_window in a real stream (stateful session merging) must
    produce the same sessions as the batch form."""
    from pyspark.sql import functions as F

    ev = _stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total",
        )
    )
    name = _run_to_memory(agg, mode="complete")
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.total)
        for r in spark.table(name).collect()
    }
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.total)
        for r in SW.q_stream_session(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """Stream-stream inner join with watermarks and a time-range
    condition: clicks joined to errors of the same user within the
    preceding 5 minutes. Both sides buffer state bounded by their
    watermark; result must equal the batch time-range join."""
    errors = (
        _stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select("user_id", F.col("ts").alias("err_ts"), F.col("event_id").alias("err_id"))
        .withWatermark("err_ts", "30 minutes")
    )
    clicks = (
        _stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"),
                F.col("event_id").alias("click_id"))
        .withWatermark("click_ts", "30 minutes")
    )
    joined = errors.join(
        clicks,
        F.expr(
            """
            user_id = c_user AND
            click_ts <= err_ts AND
            click_ts > err_ts - INTERVAL 5 MINUTES
            """
        ),
    ).select("err_id", "click_id")
    name = _run_to_memory(joined, mode="append")
    got = {(r.err_id, r.click_id) for r in spark.table(name).collect()}

    from dfs_w_mapreduce_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    e = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("err_ts"), F.col("event_id").alias("err_id")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    want = {
        (r.err_id, r.click_id)
        for r in e.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("click_ts") <= F.col("err_ts"))
            & (F.col("click_ts") > F.col("err_ts") - F.expr("INTERVAL 5 MINUTES")),
        ).select("err_id", "click_id").collect()
    }
    assert got == want and len(want) > 0


def test_drop_duplicates_within_watermark(spark, sf_dir):
    """dropDuplicatesWithinWatermark: dedup keyed on event_id where
    duplicates arrive within the watermark window (the bounded-state
    streaming dedup for at-least-once sources)."""
    ev = _stream_events(spark, sf_dir)
    dups = ev.union(ev)
    deduped = dups.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["event_id"])
    name = _run_to_memory(deduped.groupBy().agg(F.count("*").alias("n")), mode="complete")
    n = spark.table(name).collect()[0].n
    batch_n = spark.read.parquet(table_path(sf_dir, "events")).count()
    assert n == batch_n


def test_stream_join_live_state_cleanup_and_batch_equivalence(spark, sf_dir):
    """The live stream-stream join result must equal the batch
    interval join, and the memory-sink table must not leak (the query
    name is unique per run, so just check the catalog isn't growing
    unboundedly with t_* tables from this module's live queries)."""
    from pyspark.sql import functions as F

    from dfs_w_mapreduce_spark.catalog import load_table
    from dfs_w_mapreduce_spark.streaming.windows import (
        STREAM_JOIN_WINDOW_MIN,
        q_stream_join_live,
    )

    live = {
        (r.user_id, r.n_pairs, r.min_latency_us, r.max_latency_us)
        for r in q_stream_join_live(spark, sf_dir).collect()
    }

    ev = load_table(spark, sf_dir, "events")
    if dict(ev.dtypes)["ts"] == "timestamp_ntz":
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    lat = F.unix_micros("click_ts") - F.unix_micros("view_ts")
    batch = {
        (r.user_id, r.n_pairs, r.min_latency_us, r.max_latency_us)
        for r in (
            v.join(
                c,
                (F.col("v_user") == F.col("c_user"))
                & (F.col("click_ts") >= F.col("view_ts"))
                & (
                    F.col("click_ts")
                    <= F.col("view_ts")
                    + F.expr(f"INTERVAL {STREAM_JOIN_WINDOW_MIN} MINUTES")
                ),
            )
            .groupBy(F.col("v_user").alias("user_id"))
            .agg(
                F.count("*").alias("n_pairs"),
                F.min(lat).alias("min_latency_us"),
                F.max(lat).alias("max_latency_us"),
            )
            .collect()
        )
    }
    assert live == batch and live
