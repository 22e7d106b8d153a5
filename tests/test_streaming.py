"""Structured Streaming equivalence: draining the file-replay stream
through the SAME windowed transform must reproduce the batch result
(Spark's definition of streaming correctness)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from exceldatatransform_py_spark.sources.readers import read_table
from exceldatatransform_py_spark.streaming.windows import (
    stream_tumbling_counts,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark):
    """Stage the events table as a normal-timestamp parquet directory
    (the raw file's TIMESTAMP(NANOS) needs the read_table conversion,
    and readStream needs a directory source)."""
    d = tempfile.mkdtemp(prefix="events_stream_")
    ev = read_table(spark, SF, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    ev.write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_matches_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    expected = {
        (r["window_start"], r["window_end"], r["event_type"]):
            (r["n_events"], r["sum_value"])
        for r in tumbling_counts(batch, duration="5 minutes").collect()
    }

    stream = stream_tumbling_counts(
        spark, events_dir, schema=batch.schema, duration="5 minutes"
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName("t_stream")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["window_start"], r["window_end"], r["event_type"]):
                (r["n_events"], r["sum_value"])
            for r in spark.sql("SELECT * FROM t_stream").collect()
        }
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)

    assert got == expected


def test_stream_dedup_within_watermark(spark, events_dir):
    from exceldatatransform_py_spark.streaming.windows import (
        stream_dedup_within_watermark,
    )

    batch = spark.read.parquet(events_dir)
    expected_n = batch.dropDuplicates(["event_id"]).count()

    stream = stream_dedup_within_watermark(
        spark, events_dir, schema=batch.schema
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_dd_")
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName("t_dedup")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT count(*) FROM t_dedup").collect()[0][0]
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    assert got == expected_n


def test_stateful_user_totals_matches_batch(spark, events_dir):
    """Drain-equivalence for BOTH arbitrary-state APIs against one
    batch oracle: ``applyInPandasWithState`` always; the Spark 4
    ``transformWithStateInPandas`` twin additionally when
    ``google.protobuf`` is importable (its JVM↔Python state-server
    protocol needs it — absent in this container, so that branch is a
    conditional extra assertion, not a skipped test)."""
    import importlib.util

    from exceldatatransform_py_spark.streaming.windows import (
        stateful_user_totals,
        stateful_user_totals_tws,
    )

    batch = spark.read.parquet(events_dir)
    expected = {
        (r["user_id"]): (r["n"], round(r["s"], 6))
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("s"),
        )
        .collect()
    }

    def drain(totals, name):
        ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
        try:
            q = (
                totals.writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            # 'update' mode may emit a key several times across
            # batches; the LAST emission per key is the final state.
            rows = spark.sql(f"SELECT * FROM {name}").collect()
            got = {}
            for r in rows:
                got[r["user_id"]] = (r["n_events"], round(r["sum_value"], 6))
            return got
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)

    stream = (
        spark.readStream.schema(batch.schema).format("parquet").load(events_dir)
    )
    assert drain(stateful_user_totals(stream), "t_state") == expected

    try:
        has_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no parent 'google' package at all
        has_protobuf = False
    if has_protobuf:
        provider_key = "spark.sql.streaming.stateStore.providerClass"
        rocks = (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        )
        prev = spark.conf.get(provider_key, None)
        spark.conf.set(provider_key, rocks)
        try:
            assert (
                drain(stateful_user_totals_tws(stream), "t_tws") == expected
            )
        finally:
            if prev is None:
                spark.conf.unset(provider_key)
            else:
                spark.conf.set(provider_key, prev)


def test_stream_stream_join_matches_batch(spark, events_dir):
    from exceldatatransform_py_spark.streaming.windows import (
        purchase_attribution_join,
        stream_purchase_attribution,
    )

    batch = spark.read.parquet(events_dir)
    expected = {
        (r["click_id"], r["purchase_id"])
        for r in purchase_attribution_join(
            batch.filter(F.col("event_type") == "click"),
            batch.filter(F.col("event_type") == "purchase"),
        ).collect()
    }
    assert expected  # the fixture data must actually produce matches

    stream = stream_purchase_attribution(spark, events_dir, schema=batch.schema)
    ckpt = tempfile.mkdtemp(prefix="ckpt_ssj_")
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName("t_ssj")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r["click_id"], r["purchase_id"])
            for r in spark.sql("SELECT * FROM t_ssj").collect()
        }
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    assert got == expected


def test_stream_static_enrich_matches_batch(spark, events_dir):
    """Stream-static join: enrich the event stream with a static dim
    (user tier by id range). The static side is re-resolved per
    micro-batch in production; here the drained result must equal the
    batch join."""
    import tempfile
    import shutil

    tiers = spark.createDataFrame(
        [(lo, lo + 50, f"tier{n}") for n, lo in enumerate(range(0, 200, 50))],
        ["lo", "hi", "tier"],
    )
    batch = spark.read.parquet(events_dir)

    def enrich(df):
        return (
            df.join(
                F.broadcast(tiers),
                (df.user_id >= tiers.lo) & (df.user_id < tiers.hi),
                "left",
            )
            .groupBy("tier")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    expected = {(r["tier"], r["n"]) for r in enrich(batch).collect()}

    stream = spark.readStream.schema(batch.schema).parquet(events_dir)
    ckpt = tempfile.mkdtemp(prefix="ckpt_ss_")
    try:
        q = (
            enrich(stream)
            .writeStream.format("memory")
            .queryName("t_enrich")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["tier"], r["n"])
            for r in spark.sql("SELECT * FROM t_enrich").collect()
        }
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)

    assert got == expected


def test_stream_merge_into_matches_batch_merge(spark):
    """Draining an update stream through the foreachBatch merge sink
    must leave the target in the same state as one batch merge of all
    updates (updates are key-unique across batches, so sequential
    application is order-independent)."""
    import os

    from exceldatatransform_py_spark.operators.merge import merge_update
    from exceldatatransform_py_spark.streaming.sinks import stream_merge_into

    target_dir = tempfile.mkdtemp(prefix="merge_target_")
    updates_dir = tempfile.mkdtemp(prefix="merge_updates_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_merge_")
    try:
        orders = read_table(spark, SF, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        orders.write.mode("overwrite").parquet(target_dir)
        target0 = spark.read.parquet(target_dir)

        # Two disjoint-key update files → two micro-batches.
        upd = (
            target0.filter(F.col("o_orderkey") % 7 == 0)
            .select(
                "o_orderkey",
                F.lit("X").alias("o_orderstatus"),
                (F.col("o_totalprice") + 100.0).alias("o_totalprice"),
            )
            .localCheckpoint(eager=True)  # pin before the target is rewritten
        )
        upd.filter(F.col("o_orderkey") % 2 == 0).coalesce(1).write.parquet(
            os.path.join(updates_dir, "b0")
        )
        upd.filter(F.col("o_orderkey") % 2 == 1).coalesce(1).write.parquet(
            os.path.join(updates_dir, "b1")
        )

        expected = {
            r["o_orderkey"]: (r["o_orderstatus"], r["o_totalprice"])
            for r in merge_update(
                target0,
                upd,
                on=["o_orderkey"],
                update_cols=["o_orderstatus", "o_totalprice"],
            ).collect()
        }

        writer = stream_merge_into(
            spark,
            os.path.join(updates_dir, "*"),
            schema=upd.schema,
            target_path=target_dir,
            on=["o_orderkey"],
            update_cols=["o_orderstatus", "o_totalprice"],
            max_files_per_trigger=1,
        )
        q = (
            writer.option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        got = {
            r["o_orderkey"]: (r["o_orderstatus"], r["o_totalprice"])
            for r in spark.read.parquet(target_dir).collect()
        }
        assert got == expected
        # the status flip lands on exactly the matched keys
        n_flipped = sum(1 for v in got.values() if v[0] == "X")
        assert n_flipped == upd.count()
    finally:
        shutil.rmtree(target_dir, ignore_errors=True)
        shutil.rmtree(updates_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_restart_resumes_from_checkpoint(spark, events_dir):
    """Fault-tolerance contract: stop a file-source stream, add new
    input, restart with the SAME checkpoint — the sink must end up
    with every row exactly once (offsets recovered, first batch not
    reprocessed, file sink commit log deduplicates). This is the
    recovery semantics a 100 TB continuous ingest relies on."""
    import os

    batch = spark.read.parquet(events_dir)
    half1 = batch.filter(F.col("event_id") % 2 == 0)
    half2 = batch.filter(F.col("event_id") % 2 == 1)

    src = tempfile.mkdtemp(prefix="restart_src_")
    sink = tempfile.mkdtemp(prefix="restart_sink_")
    ckpt = tempfile.mkdtemp(prefix="restart_ckpt_")
    try:
        half1.write.mode("append").parquet(src)

        def run_once():
            q = (
                spark.readStream.schema(batch.schema)
                .parquet(src)
                .select("event_id", "user_id", "event_type")
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_once()
        n1 = spark.read.parquet(sink).count()
        assert n1 == half1.count()

        # new files arrive while the query is DOWN; restart resumes.
        half2.write.mode("append").parquet(src)
        run_once()

        out = spark.read.parquet(sink)
        assert out.count() == batch.count()  # exactly once, no dupes
        assert out.select("event_id").distinct().count() == batch.count()
    finally:
        for d in (src, sink, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_incremental_micro_batches_match_single_batch(spark, events_dir):
    """Rate-limited incremental processing: maxFilesPerTrigger=1
    forces the file source through one-file micro-batches; the final
    appended sink must equal the all-at-once drain exactly (state and
    commit log correctness across many small batches — the steady-
    state shape of a production continuous job)."""
    import os

    batch = spark.read.parquet(events_dir)
    src = tempfile.mkdtemp(prefix="inc_src_")
    sink = tempfile.mkdtemp(prefix="inc_sink_")
    ckpt = tempfile.mkdtemp(prefix="inc_ckpt_")
    try:
        # several input files so the trigger actually splits batches.
        batch.repartition(5).write.mode("overwrite").parquet(src)
        n_files = len([f for f in os.listdir(src) if f.endswith(".parquet")])
        assert n_files >= 5
        q = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .select("event_id", "user_id")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        # availableNow + maxFilesPerTrigger drains in n_files batches.
        out = spark.read.parquet(sink)
        assert out.count() == batch.count()
        assert out.select("event_id").distinct().count() == batch.count()
    finally:
        for d in (src, sink, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_stream_stream_left_outer_emits_expired_nulls(spark, tmp_path):
    """Stream-stream LEFT OUTER interval join: unmatched left rows must
    surface with NULL right columns once the watermark passes their
    join window — the semantics that make outer joins usable on
    unbounded streams (state is evicted, not held forever). Outer
    results only flush when a LATER batch advances the watermark, so
    the drain runs twice: sentinel rows far in the future push the
    watermark past every real row's window on the second pass."""
    import datetime as dt
    import os

    t0 = dt.datetime(2025, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    clicks_dir = os.path.join(str(tmp_path), "clicks")
    purch_dir = os.path.join(str(tmp_path), "purch")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    out_dir = os.path.join(str(tmp_path), "out")

    def write(rows, schema, d):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(d)

    write([(1, 1, t0), (2, 2, t0)], "click_id long, user_id long, ts timestamp",
          clicks_dir)
    write([(10, 1, t0 + 10 * m)], "purchase_id long, user_id long, ts timestamp",
          purch_dir)

    def drain():
        c = (
            spark.readStream.schema("click_id long, user_id long, ts timestamp")
            .parquet(clicks_dir)
            .withWatermark("ts", "1 minute")
            .alias("c")
        )
        p = (
            spark.readStream.schema(
                "purchase_id long, user_id long, ts timestamp"
            )
            .parquet(purch_dir)
            .withWatermark("ts", "1 minute")
            .alias("p")
        )
        joined = c.join(
            p,
            F.expr(
                "c.user_id = p.user_id AND "
                "p.ts BETWEEN c.ts AND c.ts + INTERVAL 30 MINUTES"
            ),
            "leftOuter",
        ).select("c.click_id", "p.purchase_id")
        q = (
            joined.writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drain()
    # sentinels two hours later advance BOTH watermarks past t0+30min.
    far = t0 + 120 * m
    write([(99, 99, far)], "click_id long, user_id long, ts timestamp",
          clicks_dir)
    write([(98, 98, far)], "purchase_id long, user_id long, ts timestamp",
          purch_dir)
    drain()

    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.read.parquet(out_dir).collect()
        if r["click_id"] != 99
    }
    assert got == {(1, 10), (2, None)}


def test_stream_value_histogram_matches_batch(spark, events_dir):
    """The drift monitor's aggregation: the streaming per-window value
    histogram must equal the batch histogram exactly (the same
    equivalence contract as the tumbling counts — scored downstream by
    windowed_drift_curve)."""
    from exceldatatransform_py_spark.streaming.windows import (
        stream_value_histogram,
        windowed_value_histogram,
    )

    batch = spark.read.parquet(events_dir)
    expected = {
        (r["window_start"], r["window_end"], r["bucket"]): r["n_events"]
        for r in windowed_value_histogram(
            batch.withColumn("ts", F.col("ts").cast("timestamp")),
            duration="6 hours",
        ).collect()
    }
    assert expected, "batch histogram must be non-empty"

    stream = stream_value_histogram(
        spark, events_dir, schema=batch.schema, duration="6 hours"
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName("t_vhist")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["window_start"], r["window_end"], r["bucket"]): r["n_events"]
            for r in spark.sql("SELECT * FROM t_vhist").collect()
        }
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)

    assert got == expected
