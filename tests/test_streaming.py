"""Structured Streaming tests (SURVEY §2.10): file-source stream over
the driver's events table, memory sinks, batch-equivalence checks."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_pipeline_playground_spark.tables import table


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    """events parquet → json-lines dir (3 files ⇒ 3 micro-batches),
    with duplicate event_ids injected to exercise streaming dedup."""
    d = tmp_path_factory.mktemp("events_stream")
    ev = table(spark, sf_dir, "events")
    dupes = ev.orderBy("event_id").limit(20)
    ev.unionByName(dupes).select(
        "event_id", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
        "user_id", "event_type", "value", "props",
    ).coalesce(3).write.mode("overwrite").json(str(d))
    return str(d)


def test_streaming_dedup_drops_duplicates(spark, sf_dir, events_stream_dir):
    from data_pipeline_playground_spark.streaming.events_stream import (
        read_events_stream,
        run_stream_to_memory,
        streaming_dedup,
    )

    stream = read_events_stream(spark, events_stream_dir, max_files_per_trigger=1)
    q = run_stream_to_memory(
        streaming_dedup(stream), "dedup_sink", output_mode="append"
    )
    try:
        got = spark.sql("SELECT count(DISTINCT event_id) c, count(*) n FROM dedup_sink").first()
        n_events = table(spark, sf_dir, "events").count()
        assert got.n == n_events  # the 20 injected dupes were dropped
        assert got.c == got.n
    finally:
        q.stop()


def test_streaming_tumbling_matches_batch(spark, sf_dir, events_stream_dir):
    from data_pipeline_playground_spark.registry import all_queries
    from data_pipeline_playground_spark.streaming.events_stream import (
        read_events_stream,
        run_stream_to_memory,
        streaming_tumbling_counts,
    )

    stream = read_events_stream(spark, events_stream_dir)
    # dedup first so the injected duplicates don't skew the counts
    from data_pipeline_playground_spark.streaming.events_stream import streaming_dedup

    q = run_stream_to_memory(
        streaming_tumbling_counts(streaming_dedup(stream), watermark=None),
        "tumbling_sink",
        output_mode="update",
    )
    try:
        stream_rows = {
            (r.window_start, r.event_type): (r.n_events, round(r.total_value, 6))
            for r in spark.sql(
                "SELECT * FROM tumbling_sink"
            ).collect()
        }
        batch_rows = {
            (r.window_start, r.event_type): (r.n_events, round(r.total_value, 6))
            for r in all_queries()["events_tumbling_hour"](spark, sf_dir).collect()
        }
        assert stream_rows == batch_rows  # streaming twin ≡ batch result
    finally:
        q.stop()


def test_streaming_session_window_matches_batch(spark, sf_dir, events_stream_dir):
    """F.session_window under readStream (watermark + append) produces
    the same closed sessions as the batch twin once the stream drains —
    R3/R4: identical expressions, streaming only adds the watermark."""
    from data_pipeline_playground_spark.registry import all_queries
    from data_pipeline_playground_spark.streaming.events_stream import (
        read_events_stream,
        run_stream_to_memory,
        streaming_dedup,
    )

    stream = streaming_dedup(read_events_stream(spark, events_stream_dir))
    sessions = (
        stream.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )
    q = run_stream_to_memory(sessions, "session_sink", output_mode="append")
    try:
        got = {
            (r.user_id, r.session_start): r.n_events
            for r in spark.sql("SELECT * FROM session_sink").collect()
        }
        batch = {
            (r.user_id, r.session_start): r.n_events
            for r in all_queries()["events_session_window"](spark, sf_dir).collect()
        }
        # append mode emits only watermark-closed sessions: every
        # emitted session must match the batch result exactly, and the
        # bulk of sessions must have closed (watermark advanced past them)
        assert len(got) > 0.5 * len(batch)
        for k, n in got.items():
            assert batch.get(k) == n
    finally:
        q.stop()


def test_streaming_enriched_counts_matches_batch(spark, sf_dir, events_stream_dir):
    """Stream-static broadcast join + windowed rollup drains to exactly
    the batch join-then-aggregate result (same expressions, same dim)."""
    from data_pipeline_playground_spark.streaming.events_stream import (
        read_events_stream,
        run_stream_to_memory,
        streaming_dedup,
        streaming_enriched_counts,
    )

    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"),
         ("purchase", "revenue"), ("signup", "growth")],
        "event_type string, category string",
    )
    stream = streaming_dedup(read_events_stream(spark, events_stream_dir))
    q = run_stream_to_memory(
        streaming_enriched_counts(stream, dim, watermark=None),
        "enriched_sink",
        output_mode="update",
    )
    try:
        got = {
            (r.window_start, r.category): (r.n_events, round(r.total_value, 6))
            for r in spark.sql("SELECT * FROM enriched_sink").collect()
        }
        ev = table(spark, sf_dir, "events")
        batch = {
            (r.window_start, r.category): (r.n_events, round(r.total_value, 6))
            for r in (
                ev.join(F.broadcast(dim), "event_type", "left")
                .fillna({"category": "unknown"})
                .groupBy(F.window("ts", "1 hour").alias("w"), "category")
                .agg(
                    F.count(F.lit(1)).alias("n_events"),
                    F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
                )
                .select(F.col("w.start").alias("window_start"), "category",
                        "n_events", "total_value")
                .collect()
            )
        }
        assert got == batch
    finally:
        q.stop()


def test_streaming_fuzzy_dedup_greedy_first_wins(spark, tmp_path):
    """Near-dup titles arriving across micro-batches: the earliest
    representative survives, later near-dups are dropped even when they
    arrive in a later batch (state persists across batches)."""
    import json

    from data_pipeline_playground_spark.functions.text import py_fuzz_ratio
    from data_pipeline_playground_spark.streaming.events_stream import (
        run_stream_to_memory,
        streaming_fuzzy_dedup,
    )

    batch1 = [
        {"block_key": "b", "doc_id": 1, "title": "breaking news market rally today"},
        {"block_key": "b", "doc_id": 2, "title": "completely different story"},
    ]
    batch2 = [
        {"block_key": "b", "doc_id": 3, "title": "breaking news market rally todays"},
        {"block_key": "b", "doc_id": 4, "title": "another unrelated headline item"},
    ]
    d = tmp_path / "titles"
    d.mkdir()
    import os

    for i, batch in enumerate([batch1, batch2]):
        p = d / f"part-{i}.json"
        p.write_text("\n".join(json.dumps(r) for r in batch))
        # distinct mtimes: the file source orders micro-batches by them
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    stream = (
        spark.readStream.schema("block_key string, doc_id bigint, title string")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    q = run_stream_to_memory(
        streaming_fuzzy_dedup(stream), "fuzzy_dedup_sink", output_mode="append"
    )
    try:
        kept = {r.doc_id for r in spark.sql("SELECT * FROM fuzzy_dedup_sink").collect()}
        assert py_fuzz_ratio(batch1[0]["title"], batch2[0]["title"]) > 80
        assert kept == {1, 2, 4}  # doc 3 deduped against doc 1 from batch 1
    finally:
        q.stop()


def test_streaming_stateful_user_totals(spark, sf_dir, events_stream_dir):
    from data_pipeline_playground_spark.streaming.events_stream import (
        read_events_stream,
        run_stream_to_memory,
        streaming_user_totals,
    )

    stream = read_events_stream(spark, events_stream_dir, max_files_per_trigger=3)
    q = run_stream_to_memory(
        streaming_user_totals(stream), "user_totals_sink", output_mode="update"
    )
    try:
        # last update per user must cover every event seen for that user
        got = spark.sql(
            """SELECT user_id, max(n_events) AS n FROM user_totals_sink
               GROUP BY user_id"""
        ).collect()
        assert len(got) > 0
        ev = table(spark, sf_dir, "events")
        # +20 injected dupes: totals count raw arrivals, so compare ≥
        batch = {r.user_id: r.n for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
        for r in got:
            assert r.n >= batch.get(r.user_id, 0)
    finally:
        q.stop()


def test_streaming_state_survives_restart(spark, tmp_path):
    """Kill a stateful stream mid-input, restart from the checkpoint:
    the keyed state (running totals) must resume, not reset — the
    recovery property an always-on deployment depends on."""
    import json
    import os

    from data_pipeline_playground_spark.streaming.events_stream import (
        streaming_user_totals,
    )

    d = tmp_path / "in"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write_batch(i, rows):
        p = d / f"part-{i}.json"
        p.write_text("\n".join(json.dumps(r) for r in rows))
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    write_batch(0, [
        {"event_id": 1, "ts": "2026-01-01T00:00:00", "user_id": 7,
         "event_type": "click", "value": 1.5, "props": "{}"},
        {"event_id": 2, "ts": "2026-01-01T00:01:00", "user_id": 7,
         "event_type": "click", "value": 2.5, "props": "{}"},
    ])

    def run_once():
        # foreachBatch sink: checkpoint-recoverable (the memory sink is
        # not); rows land in a driver-side list per micro-batch
        out: list[tuple] = []
        stream = (
            spark.readStream.schema(
                "event_id bigint, ts timestamp, user_id bigint, "
                "event_type string, value double, props string"
            )
            .option("maxFilesPerTrigger", 1)
            .json(str(d))
        )
        q = (
            streaming_user_totals(stream)
            .writeStream.foreachBatch(
                lambda bdf, _bid: out.extend(
                    (r.user_id, r.n_events, r.total_value) for r in bdf.collect()
                )
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
        return out

    first = run_once()  # batch 0 processed, state checkpointed
    assert (7, 2, 4.0) in set(first)

    write_batch(1, [
        {"event_id": 3, "ts": "2026-01-01T00:02:00", "user_id": 7,
         "event_type": "click", "value": 4.0, "props": "{}"},
    ])
    second = run_once()  # restarted query: must see state n=2 and add 1
    assert (7, 3, 8.0) in set(second)  # resumed from n=2/4.0, not zero
    assert (7, 2, 4.0) not in set(second)  # batch 0 NOT reprocessed


def test_streaming_user_totals_tws_matches_legacy(spark, sf_dir, events_stream_dir):
    """transformWithStateInPandas (RocksDB state store) produces the
    same final per-user totals as the applyInPandasWithState legacy
    twin on the same drained input."""
    # the TWS driver worker requires protobuf (not in this container)
    pytest.importorskip("google.protobuf.descriptor")
    from data_pipeline_playground_spark.streaming.events_stream import (
        read_events_stream,
        run_stream_to_memory,
        streaming_user_totals_tws,
    )

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_events_stream(spark, events_stream_dir, max_files_per_trigger=3)
        q = run_stream_to_memory(
            streaming_user_totals_tws(stream), "tws_sink", output_mode="update"
        )
        try:
            got = {
                r.user_id: r.n
                for r in spark.sql(
                    """SELECT user_id, max(n_events) AS n FROM tws_sink
                       GROUP BY user_id"""
                ).collect()
            }
        finally:
            q.stop()
        ev = table(spark, sf_dir, "events")
        dupes = ev.orderBy("event_id").limit(20)  # fixture injects these
        batch = {
            r.user_id: r.n
            for r in ev.unionByName(dupes)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == batch
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)


def test_streaming_stream_stream_interval_join(spark, sf_dir, events_stream_dir):
    """Stream-stream interval join (attribution: purchases to the same
    user's clicks within the preceding hour) drains to exactly the
    batch interval-join result."""
    from data_pipeline_playground_spark.streaming.events_stream import (
        read_events_stream,
        run_stream_to_memory,
        streaming_click_purchase_join,
    )

    # raw stream (no dedup upstream: the join defines its own per-side
    # watermarks and Spark disallows redefining one); the injected
    # duplicate events produce duplicate matches, which the set
    # comparison collapses
    stream = read_events_stream(spark, events_stream_dir)
    q = run_stream_to_memory(
        streaming_click_purchase_join(stream), "ss_join_sink", output_mode="append"
    )
    try:
        got = {
            (r.user_id, r.click_ts, r.purchase_ts, round(r.purchase_value, 6))
            for r in spark.sql("SELECT * FROM ss_join_sink").collect()
        }
        ev = table(spark, sf_dir, "events")
        clicks = ev.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("cu"), F.col("ts").alias("click_ts")
        )
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("pu"), F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        batch = {
            (r.cu, r.click_ts, r.purchase_ts, round(r.purchase_value, 6))
            for r in clicks.join(
                purchases,
                F.expr(
                    """cu = pu AND purchase_ts >= click_ts
                       AND purchase_ts <= click_ts + INTERVAL 1 HOUR"""
                ),
            ).collect()
        }
        assert len(batch) > 0
        assert got == batch
    finally:
        q.stop()


def test_streaming_cms_matches_batch(spark, sf_dir, events_stream_dir):
    """The streaming CMS counter table equals the batch sketch built
    over the same (deduplicated) events — and its row count is bounded
    by DEPTH×WIDTH regardless of stream length."""
    from data_pipeline_playground_spark.queries.sketches import (
        CMS_DEPTH,
        CMS_WIDTH,
        _buckets,
    )
    from data_pipeline_playground_spark.streaming.events_stream import (
        read_events_stream,
        run_stream_to_memory,
        streaming_cms_counters,
        streaming_dedup,
    )
    from pyspark.sql import functions as F

    stream = read_events_stream(spark, events_stream_dir)
    q = run_stream_to_memory(
        streaming_cms_counters(streaming_dedup(stream)),
        "cms_sink",
        output_mode="complete",
    )
    try:
        stream_rows = {
            (r.d, r.bucket): r.c for r in spark.sql("SELECT * FROM cms_sink").collect()
        }
        batch = (
            table(spark, sf_dir, "events")
            .select(F.explode(_buckets(F.col("event_type"))).alias("db"))
            .select("db.d", "db.bucket")
            .groupBy("d", "bucket")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        batch_rows = {(r.d, r.bucket): r.c for r in batch.collect()}
        assert stream_rows == batch_rows
        assert len(stream_rows) <= CMS_DEPTH * CMS_WIDTH
    finally:
        q.stop()


def test_streaming_incremental_dedup_matches_batch(spark, sf_dir, tmp_path):
    """Documents streamed in micro-batches and screened against the
    static base corpus yield exactly the batch exact-tier survivors:
    new docs whose md5(text) matches any base doc are dropped."""
    from data_pipeline_playground_spark.streaming.events_stream import (
        run_stream_to_memory,
        streaming_incremental_dedup,
    )

    docs = table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 4 == 3
    base = docs.filter(~is_new)
    new_docs = docs.filter(is_new).select("doc_id", "text")

    d = tmp_path / "incoming"
    d.mkdir()
    new_docs.coalesce(2).write.mode("overwrite").json(str(d))
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    q = run_stream_to_memory(
        streaming_incremental_dedup(stream, base),
        "incr_dedup_sink",
        output_mode="append",
    )
    try:
        got = {
            r.doc_id for r in spark.sql("SELECT doc_id FROM incr_dedup_sink").collect()
        }
        base_hashes = base.select(F.md5("text").alias("th")).distinct()
        expected = {
            r.doc_id
            for r in new_docs.withColumn("th", F.md5("text"))
            .join(base_hashes, "th", "left_anti")
            .collect()
        }
        assert got == expected
        assert len(got) > 0
    finally:
        q.stop()


def test_streaming_cdc_apply_matches_batch_upsert(spark, sf_dir, tmp_path):
    """Streaming the change batch through the foreachBatch CDC sink in
    3 micro-batches converges to exactly the batch upsert's final
    state (orders_upsert_latest)."""
    import os

    from data_pipeline_playground_spark.queries.maintenance import (
        DEL_MOD,
        UPD_MOD,
        UPDATED_STATUS,
    )
    from data_pipeline_playground_spark.registry import all_queries
    from data_pipeline_playground_spark.streaming.events_stream import (
        streaming_cdc_apply,
    )

    orders = table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey", "o_orderstatus",
        F.lit(0).alias("version"), F.lit("I").alias("op"),
    )
    is_del = F.col("o_orderkey") % DEL_MOD == 0
    changes = orders.filter(is_del | (F.col("o_orderkey") % UPD_MOD == 0)).select(
        "o_orderkey",
        F.when(is_del, F.col("o_orderstatus"))
        .otherwise(F.lit(UPDATED_STATUS))
        .alias("o_orderstatus"),
        F.lit(1).alias("version"),
        F.when(is_del, F.lit("D")).otherwise(F.lit("U")).alias("op"),
    )

    in_dir = tmp_path / "changes_in"
    in_dir.mkdir()
    changes.repartition(3).write.mode("overwrite").json(str(in_dir))

    stream = (
        spark.readStream.schema(
            "o_orderkey bigint, o_orderstatus string, version int, op string"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    state_dir = str(tmp_path / "state")
    streaming_cdc_apply(spark, stream, base, state_dir)

    versions = sorted(
        int(d[1:]) for d in os.listdir(state_dir)
        if d.startswith("v") and d[1:].isdigit()
    )
    assert len(versions) >= 2  # multiple micro-batches actually applied
    final = spark.read.parquet(os.path.join(state_dir, f"v{versions[-1]}"))

    expected = all_queries()["orders_upsert_latest"](spark, sf_dir)
    got = {
        (r.o_orderkey, r.o_orderstatus, r.version)
        for r in final.select("o_orderkey", "o_orderstatus", "version").collect()
    }
    want = {
        (r.o_orderkey, r.o_orderstatus, r.version) for r in expected.collect()
    }
    assert got == want


def test_streaming_throttle_matches_batch(spark, sf_dir, tmp_path):
    """The stateful rate limiter must reproduce the batch
    events_throttle_1h result exactly when events are replayed in
    event-time order across micro-batches (3 ts-sorted tercile files,
    one per trigger — state carries the last kept ts between them)."""
    import time

    from data_pipeline_playground_spark.registry import all_queries
    from data_pipeline_playground_spark.streaming.events_stream import (
        read_events_stream,
        run_stream_to_memory,
        streaming_throttle,
    )

    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    rows = ev.orderBy("ts", "event_id").collect()
    n = len(rows)
    d = tmp_path / "ordered"
    d.mkdir()
    cuts = [0, n // 3, 2 * n // 3, n]
    import json as _json

    for i in range(3):
        with open(d / f"part-{i:03d}.json", "w") as f:
            for r in rows[cuts[i]:cuts[i + 1]]:
                f.write(
                    _json.dumps(
                        {
                            "event_id": r.event_id,
                            "ts": r.ts.strftime("%Y-%m-%dT%H:%M:%S.%f"),
                            "user_id": r.user_id,
                            "event_type": r.event_type,
                            "value": r.value,
                            "props": r.props,
                        }
                    )
                    + "\n"
                )
        time.sleep(1.1)  # distinct mtimes → deterministic file order

    stream = read_events_stream(spark, str(d), max_files_per_trigger=1)
    run_stream_to_memory(
        streaming_throttle(stream), "throttle_sink", output_mode="append"
    )
    got = {
        (r.user_id, r.event_type, r.ts)
        for r in spark.sql("SELECT * FROM throttle_sink").collect()
    }
    want = {
        (r.user_id, r.event_type, r.ts)
        for r in all_queries()["events_throttle_1h"](spark, sf_dir).collect()
    }
    assert got == want


def test_streaming_dedup_within_watermark_matches_plain(spark, sf_dir, events_stream_dir):
    """The bounded-state dedup must drop the fixture's injected
    duplicates exactly like unbounded dropDuplicates (they arrive
    within the watermark), while keeping per-key state bounded."""
    from data_pipeline_playground_spark.streaming.events_stream import (
        read_events_stream,
        run_stream_to_memory,
        streaming_dedup_within_watermark,
    )

    stream = read_events_stream(spark, events_stream_dir, max_files_per_trigger=1)
    run_stream_to_memory(
        streaming_dedup_within_watermark(stream), "dedup_wm_sink",
        output_mode="append",
    )
    got = spark.sql("SELECT event_id FROM dedup_wm_sink").collect()
    ids = [r.event_id for r in got]
    n_distinct_src = table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert len(ids) == len(set(ids)) == n_distinct_src


def test_streaming_cusum_matches_batch(spark, sf_dir, tmp_path):
    """The keyed-state CUSUM (true sequential recurrence, one int64 per
    user) must reproduce the batch closed-form events_cusum_drift
    BIT-EXACTLY — including the double statistic — when events are
    replayed in event-time order across micro-batches against the same
    batch-computed baseline."""
    import json as _json
    import time

    from data_pipeline_playground_spark.registry import all_queries
    from data_pipeline_playground_spark.streaming.events_stream import (
        cusum_baseline,
        read_events_stream,
        run_stream_to_memory,
        streaming_cusum,
    )

    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    rows = ev.orderBy("ts", "event_id").collect()
    n = len(rows)
    d = tmp_path / "ordered_cusum"
    d.mkdir()
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        with open(d / f"part-{i:03d}.json", "w") as f:
            for r in rows[cuts[i]:cuts[i + 1]]:
                f.write(
                    _json.dumps(
                        {
                            "event_id": r.event_id,
                            "ts": r.ts.strftime("%Y-%m-%dT%H:%M:%S.%f"),
                            "user_id": r.user_id,
                            "event_type": r.event_type,
                            "value": r.value,
                            "props": r.props,
                        }
                    )
                    + "\n"
                )
        time.sleep(1.1)  # distinct mtimes → deterministic file order

    baseline = cusum_baseline(ev)
    stream = read_events_stream(spark, str(d), max_files_per_trigger=1)
    run_stream_to_memory(
        streaming_cusum(stream, baseline), "cusum_sink", output_mode="append"
    )
    got = {
        (r.user_id, r.event_id): (r.cusum, r.is_alarm)
        for r in spark.sql("SELECT * FROM cusum_sink").collect()
    }
    want = {
        (r.user_id, r.event_id): (r.cusum, r.is_alarm)
        for r in all_queries()["events_cusum_drift"](spark, sf_dir).collect()
    }
    assert got == want  # exact, including the float statistic
