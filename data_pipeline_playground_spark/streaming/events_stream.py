"""Structured Streaming surface (SURVEY §2.10 R3/R4).

The batch window queries in queries/windows.py are streaming-compatible
by construction; this module provides the actual readStream wiring plus
the stateful operators that only exist in streaming:

- R3 streaming dedup-as-you-go: dropDuplicates within a watermark (the
  exact tier of the reference's growing seen_titles set,
  realtimeapi.py:143-156);
- R4 watermarked tumbling/sliding aggregates over events;
- custom stateful op via applyInPandasWithState (running per-user
  session accumulator — the streaming twin of events_sessionize).

Tests drive these with a file-source stream over the driver's events
parquet and foreachBatch sinks (no always-on cluster needed).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def read_events_stream(spark: SparkSession, dir_path: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream of events (json-lines dir written by tests;
    at scale: Kafka/files — the downstream plan is identical)."""
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(dir_path)
    )


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """R3: drop duplicate event_ids as they arrive, bounded state via
    watermark (late duplicates beyond the watermark age out)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def streaming_dedup_within_watermark(events: DataFrame,
                                     watermark: str = "1 hour") -> DataFrame:
    """R3 bounded-state variant: ``dropDuplicatesWithinWatermark``
    keeps a key's state only for the watermark delay, where plain
    ``dropDuplicates`` remembers every key forever — the difference
    between O(duplicate-window) and O(stream-lifetime) state on an
    always-on 100 TB/day feed. Semantics: duplicates are dropped when
    they arrive within the watermark of the first-seen event (the
    at-least-once-transport dedup contract)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def streaming_tumbling_counts(events: DataFrame, watermark: str | None = "1 hour",
                              window: str = "1 hour") -> DataFrame:
    """R4: watermarked tumbling counts per event_type — the streaming
    twin of queries/windows.events_tumbling_hour (same expressions).

    Pass ``watermark=None`` when the upstream frame already carries a
    watermark (e.g. after streaming_dedup) — redefining one is an error.
    """
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    return (
        events
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def streaming_enriched_counts(events: DataFrame, dim: DataFrame,
                              watermark: str | None = "1 hour",
                              window: str = "1 hour") -> DataFrame:
    """Stream-static join enrichment + windowed rollup: each micro-batch
    joins against the (re-read, broadcast) static dimension — no
    streaming state for the join side, which is the scale-safe pattern
    for slowly-changing dims; only the windowed aggregate keeps state.

    ``dim`` must be a static frame keyed by event_type with a
    ``category`` column (a parser/registry dispatch table is the
    reference analog — J4, realtimeapi.py:72-75).
    """
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    enriched = events.join(F.broadcast(dim), "event_type", "left").fillna(
        {"category": "unknown"}
    )
    return (
        enriched.groupBy(F.window("ts", window).alias("w"), "category")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "category", "n_events", "total_value")
    )


def streaming_click_purchase_join(events: DataFrame,
                                  within: str = "1 hour",
                                  watermark: str = "2 hours") -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's clicks in the preceding ``within`` window — the attribution
    join. Both sides carry watermarks and the join condition bounds
    event time in BOTH directions, so Spark can expire join state:
    click state older than watermark+interval is dropped, purchase
    state likewise. Without the time bound the state store would grow
    forever — the bound is what makes a stream-stream join deployable.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("purchase_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        F.expr(
            f"""click_user = purchase_user
                AND purchase_ts >= click_ts
                AND purchase_ts <= click_ts + INTERVAL {within}"""
        ),
    ).select(
        F.col("click_user").alias("user_id"),
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
_SESSION_OUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double"
)


def streaming_user_totals(events: DataFrame, timeout_ms: int | None = None) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running
    per-user event count + value total (the applyInPandasWithState
    surface the driver contract names for custom stateful ops).

    ``timeout_ms`` opts into a processing-time state timeout for
    always-on deployments. Leave it None for availableNow/batch-drain
    runs — pending timeouts keep the query alive past the last input,
    so an awaitTermination() would never return.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        n, total = 0, 0.0
        if state.exists:
            n, total = state.get
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout_conf,
        )
    )


def streaming_user_totals_tws(events: DataFrame) -> DataFrame:
    """Spark 4-native twin of streaming_user_totals on the
    transformWithStateInPandas API (StatefulProcessor + typed
    ValueState): same running per-user totals, but state lives in the
    RocksDB state store — the API/stateful-backend pair new deployments
    should prefer (changelog checkpointing, TTL, multiple state
    variables per processor).

    Requires ``spark.sql.streaming.stateStore.providerClass`` =
    RocksDBStateStoreProvider on the session (the HDFS-backed default
    does not implement transformWithState), and the ``protobuf``
    package (the TWS driver worker speaks protobuf to the JVM — absent
    in this container, so the equivalence test import-skips; the legacy
    applyInPandasWithState twin above runs everywhere).
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n bigint, total double"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._totals.exists():
                n, total = self._totals.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotals(),
        outputStructType=_SESSION_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


_FUZZY_STATE_SCHEMA = T.StructType(
    [T.StructField("kept_titles", T.ArrayType(T.StringType()))]
)
_FUZZY_OUT_SCHEMA = "block_key string, doc_id bigint, title string"


THROTTLE_GAP_NS = 3600 * 1_000_000_000  # 1h, matches queries/temporal_joins


def streaming_throttle(events: DataFrame) -> DataFrame:
    """Streaming twin of queries/temporal_joins.events_throttle_1h:
    per (user, event_type), emit the first event, then suppress
    everything within 1 h of the last EMITTED one — the always-on
    rate-limiter / alert-dedup operator. State per key is a single
    long (last kept event-time, ns); which event is kept depends on
    which earlier ones were kept, so this is irreducibly stateful —
    exactly what applyInPandasWithState exists for.

    Event-time semantics assume per-key in-order arrival (rows are
    sorted within each micro-batch; cross-batch reordering would need
    a watermark buffer stage first, the standard caveat for any
    event-time rate limiter). Batch equivalence on ordered replays is
    pinned in tests/test_streaming.py.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        import numpy as np
        import pandas as pd

        last = state.get[0] if state.exists else None
        rows = pd.concat(list(pdf_iter)).sort_values("ts")
        arr = rows["ts"].to_numpy(dtype="datetime64[ns]").astype(np.int64)
        n = len(arr)
        # searchsorted jump per KEPT event (see queries/temporal_joins)
        i = 0 if last is None else int(
            np.searchsorted(arr, last + THROTTLE_GAP_NS, side="left")
        )
        kept_idx = []
        while i < n:
            kept_idx.append(i)
            last = int(arr[i])
            i = int(np.searchsorted(arr, arr[i] + THROTTLE_GAP_NS, side="left"))
        kept = list(rows["ts"].iloc[kept_idx])
        if last is not None:
            state.update((int(last),))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(kept),
                "event_type": [key[1]] * len(kept),
                "ts": kept,
            }
        )

    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        update,
        outputStructType=T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("ts", T.TimestampType()),
            ]
        ),
        stateStructType=T.StructType([T.StructField("last_ns", T.LongType())]),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_fuzzy_dedup(titles: DataFrame, threshold: int = 80) -> DataFrame:
    """R3 fuzzy tier as a custom stateful streaming operator: the
    reference's grow-forever ``seen_titles`` list (realtimeapi.py:143-156)
    becomes per-block keyed state in applyInPandasWithState.

    Input needs columns (block_key, doc_id, title). Blocking (e.g. a
    title-prefix or length-band key, as in operators/dedup.py) is what
    makes this scale: state and comparisons stay within a block's
    partition instead of one global O(n²) list. Within a micro-batch,
    rows are compared in (doc_id) order — first-wins greedy, matching
    the reference's arrival-order semantics.
    """
    import pandas as pd

    from data_pipeline_playground_spark.functions.text import py_fuzz_ratio

    def update(key, pdf_iter, state):
        kept: list[str] = list(state.get[0]) if state.exists else []
        out_ids, out_titles = [], []
        for pdf in pdf_iter:
            for _, row in pdf.sort_values("doc_id").iterrows():
                t = row["title"] or ""
                if all(py_fuzz_ratio(t, s) <= threshold for s in kept):
                    kept.append(t)
                    out_ids.append(int(row["doc_id"]))
                    out_titles.append(t)
        state.update((kept,))
        yield pd.DataFrame(
            {
                "block_key": [key[0]] * len(out_ids),
                "doc_id": out_ids,
                "title": out_titles,
            }
        )

    return titles.groupBy("block_key").applyInPandasWithState(
        update,
        outputStructType=_FUZZY_OUT_SCHEMA,
        stateStructType=_FUZZY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def run_stream_to_memory(stream_df: DataFrame, query_name: str,
                         output_mode: str = "update"):
    """Drive a streaming frame into an in-memory sink until idle; the
    test harness then reads `SELECT * FROM <query_name>`."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def streaming_incremental_dedup(new_docs: DataFrame,
                                base_docs: DataFrame) -> DataFrame:
    """Streaming twin of queries/dedup_advanced.dedup_incremental's
    exact tier: documents arriving on a stream are screened against the
    static base corpus by content hash (md5 of text) — a stream-static
    LEFT ANTI join, so only never-before-seen content flows through.

    No streaming state at all: the static side is re-read (and
    broadcast) per micro-batch, the stream side passes through row by
    row — the scale-safe ingest screen when the base fingerprint table
    fits the broadcast budget. At 100 TB the same plan swaps the
    broadcast for a bucketed shuffle join on the hash prefix.
    ``new_docs`` needs (doc_id, text); ``base_docs`` just text.
    """
    base_hashes = base_docs.select(F.md5("text").alias("th")).distinct()
    return (
        new_docs.withColumn("th", F.md5("text"))
        .join(F.broadcast(base_hashes), "th", "left_anti")
        .drop("th")
    )


def streaming_cdc_apply(spark: SparkSession, changes: DataFrame,
                        base: DataFrame, state_dir: str,
                        key: str = "o_orderkey",
                        version_col: str = "version") -> None:
    """Streaming CDC sink: apply change batches to a keyed table state
    via foreachBatch — the streaming twin of
    queries/maintenance.orders_upsert_latest, i.e. the MERGE INTO loop
    a Hudi/Delta table runs continuously.

    Each micro-batch merges latest-wins (version desc, then op 'D'
    beats others at equal version so a delete in the CURRENT batch
    wins over the state it deletes) and writes a NEW state version
    directory ``v{batch_id}`` — never overwriting the directory it
    just read, so a crash mid-write leaves the previous state intact
    and foreachBatch's batch-id-based replay keeps the sink
    effectively exactly-once (rewriting v{batch_id} is idempotent).
    At 100 TB the rewrite touches only the partitions the batch's
    keys live in (partition-pruned MERGE), not the whole table.

    ``changes`` is a streaming frame with (key, payload..., version,
    op) where op ∈ I/U/D; ``base`` is the initial table state.
    Blocks until the stream drains (availableNow trigger).
    """

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        versions = sorted(
            int(d[1:]) for d in os.listdir(state_dir)
            if d.startswith("v") and d[1:].isdigit()
        ) if os.path.isdir(state_dir) else []
        cur = (
            spark.read.parquet(os.path.join(state_dir, f"v{versions[-1]}"))
            if versions else base
        )
        w = Window.partitionBy(key).orderBy(
            F.desc(version_col), F.desc(F.col("op") == "D")
        )
        merged = (
            cur.unionByName(batch_df)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .filter(F.col("op") != "D")
        )
        merged.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{batch_id}")
        )

    q = (
        changes.writeStream.foreachBatch(merge)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(state_dir, "_ckpt"))
        .start()
    )
    q.awaitTermination()


def streaming_cms_counters(events: DataFrame) -> DataFrame:
    """Count–min sketch counters maintained continuously over the
    event stream (keys = event_type) — the streaming twin of
    queries/sketches.heavy_hitters_cms's counter build.

    The sketch IS the state bound: a complete-mode aggregation whose
    state is at most CMS_DEPTH × CMS_WIDTH rows no matter how long the
    stream runs — the canonical way to keep frequency estimates over
    an unbounded stream without per-key state. Batch equivalence is
    exact (same portable-hash buckets), tested in
    tests/test_streaming.py.
    """
    from data_pipeline_playground_spark.queries.sketches import _buckets

    return (
        events.select(F.explode(_buckets(F.col("event_type"))).alias("db"))
        .select("db.d", "db.bucket")
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cusum_baseline(events: DataFrame) -> DataFrame:
    """Per-user CUSUM baseline (n_u, Σv) as int64-scaled exacts — the
    batch-computed side input `streaming_cusum` monitors against (in
    production a nightly job refreshes this table; the stream-static
    join picks it up per micro-batch)."""
    v6 = F.col("value").cast("decimal(18,6)")
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_u"),
        (F.sum(v6) * F.lit(1_000_000)).cast("long").alias("s_u_scaled"),
    )


def streaming_cusum(events: DataFrame, baseline: DataFrame) -> DataFrame:
    """Streaming twin of queries/timeseries.events_cusum_drift: Page's
    one-sided CUSUM per user against a precomputed baseline, as keyed
    state S = max(0, S + d) — ONE int64 per user, the textbook
    minimal-state streaming monitor (vs the batch tier's closed-form
    cumsum − prefix-min over the same recurrence).

    Exactness: values are scaled to millionths ON THE JVM SIDE
    (decimal cast → ×1e6 → long), so Python state arithmetic is pure
    int64 — d' = n_u·v₆ − Σv₆ − n_u·κ·1e6 — and the final
    double statistic divides the SAME integers the batch tier's
    DECIMAL(18,6)→double path rounds, giving bit-identical output
    (pinned by the batch-equivalence test). Headroom: |cum| ≤
    n_u·max|d'| — int64-safe to ~1e5 events/user at 1e6-unit values;
    the batch tier holds the wide-decimal guarantees beyond that.

    Event-time semantics assume per-key in-order arrival across
    micro-batches (same caveat as streaming_throttle — a watermark
    reorder buffer is the standard front stage otherwise).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from data_pipeline_playground_spark.queries.timeseries import (
        CUSUM_ALARM,
        CUSUM_SLACK,
    )

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        s = state.get[0] if state.exists else 0
        rows = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
        n_u = int(rows["n_u"].iloc[0])
        s_u = int(rows["s_u_scaled"].iloc[0])
        out_stat, out_alarm = [], []
        alarm_at = n_u * CUSUM_ALARM * 1_000_000
        for v in rows["v_scaled"]:
            d = n_u * int(v) - s_u - n_u * CUSUM_SLACK * 1_000_000
            s = max(0, s + d)
            out_stat.append((s / 1e6) / n_u)
            out_alarm.append(s > alarm_at)
        state.update((int(s),))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out_stat),
                "event_id": rows["event_id"].to_list(),
                "cusum": out_stat,
                "is_alarm": out_alarm,
            }
        )

    joined = events.select(
        "user_id",
        "event_id",
        "ts",
        (F.col("value").cast("decimal(18,6)") * F.lit(1_000_000))
        .cast("long")
        .alias("v_scaled"),
    ).join(baseline, "user_id")
    return joined.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("event_id", T.LongType()),
                T.StructField("cusum", T.DoubleType()),
                T.StructField("is_alarm", T.BooleanType()),
            ]
        ),
        stateStructType=T.StructType([T.StructField("s_scaled", T.LongType())]),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
