"""Temporal join operators, second tier: as-of join with carried
payload, BUCKETED range join, native grouping-sets time rollup.

Complements queries/temporal.py (round 2), which holds the sibling
formulations — strict-earlier as-of checked against a correlated
subquery, keyed range join as a residual predicate inside the
sort-merge join, and the hour→day re-aggregation rollup. This module
covers the formulations that file defers to: the as-of here carries
the matched row's VALUE (not just its timestamp), is inclusive, and is
checked against DuckDB's NATIVE ASOF JOIN operator; the range join
here uses floor-epoch time BUCKETS (the shape needed when the equi-key
alone can't bound a partition — keyless or hot-key ranges); the rollup
here produces hour/day/month/grand-total from ONE pass of native
ROLLUP grouping sets.

Spark has no native ASOF/range join, so each query is the canonical
distributed re-expression:

* as-of     → union-merge + last_value window (ONE shuffle on the key;
              no join blowup — the shape kdb/QuestDB asof joins compile
              to when distributed)
* range     → time-bucket equi-join + exact interval residual filter
              (bounded 2× fanout replaces an unbounded theta-join)
* rollup    → native ROLLUP grouping sets (one pass, partial-agg
              combinable — the hypertable continuous-aggregate shape)

DuckDB oracles use the native forms (ASOF LEFT JOIN, inequality join,
GROUP BY ROLLUP), so the distributed re-expressions are value-checked
against the reference semantics, not against themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_playground_spark.registry import query
from data_pipeline_playground_spark.tables import table

# --- as-of join -------------------------------------------------------------

_ASOF_SQL = """
WITH c AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'click'
  QUALIFY row_number() OVER (PARTITION BY user_id, ts
                             ORDER BY event_id DESC) = 1
),
p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
       c.ts AS click_ts, c.value AS click_value
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


@query("purchases_asof_click", oracle=_ASOF_SQL)
def purchases_asof_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each purchase picks the same user's latest click at
    or before the purchase timestamp (last-touch attribution).

    Distributed shape: clicks and purchases are unioned with a side
    tag and sorted once per user; ``last(click_value, ignorenulls)``
    over (ts, tag) rows-unbounded-preceding carries the most recent
    click forward — ONE shuffle on user_id, linear in |events|,
    regardless of how many purchases follow each click (a join-based
    as-of is quadratic per key in the worst case). Ties at equal ts:
    clicks sort before purchases (tag 0 < 1), matching ASOF's
    inclusive `>=`; duplicate click timestamps are pre-collapsed to
    the max-event_id row on BOTH sides so the pick is deterministic.

    Oracle: DuckDB's native ASOF LEFT JOIN — the re-expression is
    checked against the reference semantics, not itself.
    """
    ev = table(spark, sf_dir, "events")
    dw = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .withColumn("rn", F.row_number().over(dw))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "ts",
            F.lit(None).cast("bigint").alias("event_id"),
            F.col("value").alias("click_value"),
            F.col("ts").alias("click_ts"),
            F.lit(0).alias("tag"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("double").alias("click_value"),
        F.lit(None).cast("timestamp_ntz").alias("click_ts"),
        F.lit(1).alias("tag"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(purchases).select(
        "event_id",
        "user_id",
        "ts",
        "tag",
        F.last("click_value", ignorenulls=True).over(w).alias("last_click_value"),
        F.last("click_ts", ignorenulls=True).over(w).alias("last_click_ts"),
    )
    return merged.filter(F.col("tag") == 1).select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("last_click_ts").alias("click_ts"),
        F.col("last_click_value").alias("click_value"),
    )


# --- range (interval) join --------------------------------------------------

RANGE_WINDOW_S = 600  # 10 minutes

_RANGE_SQL = f"""
WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id, count(c.ts) AS n_recent_clicks
FROM p LEFT JOIN c
  ON c.user_id = p.user_id
 AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL {RANGE_WINDOW_S} SECOND
GROUP BY p.event_id, p.user_id
"""


@query("purchases_range_clicks", oracle=_RANGE_SQL)
def purchases_range_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE join: per purchase, how many clicks the same user made in
    the preceding 10 minutes (inclusive of the purchase instant).

    Distributed shape: both sides get a floor-epoch time bucket of the
    window width; each purchase probes its own bucket and the previous
    one (a candidate click's bucket is always one of the two), so the
    unbounded theta-join becomes an equi-join on (user, bucket) with a
    bounded 2× build fanout, and the exact microsecond interval
    predicate runs as a residual filter. Purchases with no candidate
    clicks survive via the left join + conditional count.

    Oracle: DuckDB's native inequality join.
    """
    ev = table(spark, sf_dir, "events")
    epoch_s = "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    bucket = (F.expr(epoch_s) / RANGE_WINDOW_S).cast("bigint")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        bucket.alias("c_bucket"),
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", bucket.alias("p_bucket"))
        .withColumn("probe", F.explode(F.array(F.col("p_bucket"), F.col("p_bucket") - 1)))
    )
    hit = (
        (F.col("c_ts") <= F.col("ts"))
        & (F.col("c_ts") > F.col("ts") - F.expr(f"INTERVAL {RANGE_WINDOW_S} SECONDS"))
    )
    return (
        purchases.join(
            clicks,
            (F.col("user_id") == F.col("c_user")) & (F.col("probe") == F.col("c_bucket")),
            "left",
        )
        .groupBy("event_id", "user_id")
        .agg(F.count(F.when(hit, F.lit(1))).alias("n_recent_clicks"))
    )


# --- hierarchical time rollup (hypertable continuous aggregate) -------------

_ROLLUP_SQL = """
SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
       CAST(date_trunc('day', ts) AS DATE) AS day,
       date_trunc('hour', ts) AS hour,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
WHERE ts IS NOT NULL
GROUP BY ROLLUP (date_trunc('month', ts),
                 date_trunc('day', ts),
                 date_trunc('hour', ts))
"""


@query("events_time_rollup", oracle=_ROLLUP_SQL)
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time rollup — the hypertable continuous-aggregate
    shape: hour, day, month and grand-total rows from ONE pass via
    native ROLLUP grouping sets. Counts and exact-decimal value sums
    are partial-agg combinable, so at 100 TB this is a single
    map-side-combined shuffle (and the coarser levels re-aggregate the
    finest level's partials, not the fact table). The NOT NULL guard
    keeps rollup nulls unambiguous as level markers."""
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.rollup(
            F.to_date(F.date_trunc("month", "ts")).alias("month"),
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
            F.date_trunc("hour", "ts").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )


# --- strict-sequence funnel (MATCH_RECOGNIZE-lite) --------------------------

_FUNNEL_CHAIN_SQL = """
WITH s AS (
  SELECT user_id, min(ts) AS s_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS c_ts FROM events e
  JOIN s ON s.user_id = e.user_id AND e.ts > s.s_ts
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS p_ts FROM events e
  JOIN c ON c.user_id = e.user_id AND e.ts > c.c_ts
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT s.user_id, s.s_ts, c.c_ts, p.p_ts
FROM s JOIN c ON c.user_id = s.user_id
       JOIN p ON p.user_id = s.user_id
"""


@query("funnel_first_chain", oracle=_FUNNEL_CHAIN_SQL)
def funnel_first_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order sequence match (MATCH_RECOGNIZE-lite): per user,
    the earliest signup → first click strictly after it → first
    purchase strictly after that — the greedy leftmost funnel chain.

    Distributed shape: three chained window projections over ONE
    user_id partitioning (each `min(when(...))` may reference the
    previous stage's result because the partitioning is identical, so
    Catalyst plans one exchange and three in-partition Window passes),
    then a same-key groupBy that reuses the exchange. No self-joins:
    the oracle's three-join phrasing would re-shuffle events three
    times at 100 TB; this runs it in one.
    """
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "click", "purchase")
    )
    w = Window.partitionBy("user_id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    s = F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    staged = ev.withColumn("s_ts", s)
    c = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("s_ts")), F.col("ts"))
    ).over(w)
    staged = staged.withColumn("c_ts", c)
    p = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("c_ts")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("p_ts", p)
    return (
        staged.filter(
            F.col("s_ts").isNotNull()
            & F.col("c_ts").isNotNull()
            & F.col("p_ts").isNotNull()
        )
        .groupBy("user_id")
        .agg(
            F.min("s_ts").alias("s_ts"),
            F.min("c_ts").alias("c_ts"),
            F.min("p_ts").alias("p_ts"),
        )
    )


# --- rate-limit throttle dedup (sequential per-key semantics) ---------------

THROTTLE_S = 3600  # suppress events within 1h of the last KEPT event

_THROTTLE_SQL = f"""
WITH RECURSIVE kept AS (
  SELECT user_id, event_type, min(ts) AS ts FROM events
  GROUP BY user_id, event_type
  UNION ALL
  SELECT k.user_id, k.event_type, nxt.ts
  FROM kept k
  JOIN LATERAL (
    SELECT min(e.ts) AS ts FROM events e
    WHERE e.user_id = k.user_id AND e.event_type = k.event_type
      AND e.ts >= k.ts + INTERVAL {THROTTLE_S} SECOND
  ) nxt ON nxt.ts IS NOT NULL
)
SELECT user_id, event_type, ts FROM kept
"""


@query("events_throttle_1h", oracle=_THROTTLE_SQL)
def events_throttle_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-limit throttle dedup: per (user, event_type), keep the
    first event, then suppress everything within 1 h of the last KEPT
    event; the next event ≥ 1 h later is kept, and so on.

    This is NOT a lag/gaps-and-islands window — which event is kept
    depends on which earlier events were kept, so the scan is
    inherently sequential per key (the batch twin of streaming
    rate-limiting / alert-dedup state). The irreducible-state shape
    runs as a greedy pass inside Arrow-batched applyInPandas, one
    shuffle on the composite key; per-key cost is linear in that key's
    events, which is the best any engine can do for these semantics.
    The oracle expresses the same fixpoint as a DuckDB recursive CTE
    with a LATERAL next-kept probe — native recursion, so the Python
    pass is checked against an independent formulation.

    Timestamps are unique per (user, type) in this corpus (asserted by
    the oracle's determinism); ties would need an event_id tiebreak.
    """
    import pandas as pd

    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    gap_ns = THROTTLE_S * 1_000_000_000

    # NOT groupBy().applyInPandas(): that pays a pandas-frame
    # construction PER KEY, which at 100 TB (billions of keys) is the
    # dominant cost. Instead: hash-repartition on the key, sort each
    # partition by (key, ts), and run ONE sequential mapInPandas scan
    # per partition — runs are contiguous, the greedy fixpoint jumps
    # via searchsorted (one step per KEPT event), and carry-state
    # bridges a key's run across Arrow batch boundaries. Python-call
    # count = Arrow batches, not keys.
    def scan(batches):
        import numpy as np

        carry_key = None  # (user_id, event_type) continuing from prev batch
        carry_last = None  # last kept ts (ns) for carry_key
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            uid = pdf["user_id"].to_numpy()
            et = pdf["event_type"].to_numpy(object)
            arr = pdf["ts"].to_numpy(dtype="datetime64[ns]").astype(np.int64)
            change = np.nonzero((uid[1:] != uid[:-1]) | (et[1:] != et[:-1]))[0] + 1
            starts = np.concatenate(([0], change, [n]))
            kept_idx = []
            for a, b in zip(starts[:-1], starts[1:]):
                a, b = int(a), int(b)
                key = (uid[a], et[a])
                if key == carry_key and carry_last is not None:
                    i = a + int(
                        np.searchsorted(arr[a:b], carry_last + gap_ns, side="left")
                    )
                else:
                    i = a
                last = carry_last if key == carry_key else None
                while i < b:
                    kept_idx.append(i)
                    last = int(arr[i])
                    i = a + int(
                        np.searchsorted(arr[a:b], arr[i] + gap_ns, side="left")
                    )
                carry_key, carry_last = key, last
            out = pdf.iloc[kept_idx]
            yield pd.DataFrame(
                {
                    "user_id": out["user_id"].to_numpy(),
                    "event_type": out["event_type"].to_numpy(),
                    "ts": out["ts"].to_numpy(),
                }
            )

    return (
        ev.repartition("user_id", "event_type")
        .sortWithinPartitions("user_id", "event_type", "ts")
        .mapInPandas(scan, schema="user_id bigint, event_type string, ts timestamp_ntz")
    )


COGROUP_BUCKETS = 64  # Python invocations per stage = buckets, not users


@query("purchases_asof_click_cogroup", oracle=_ASOF_SQL)
def purchases_asof_click_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME as-of semantics as purchases_asof_click, implemented on
    the cogrouped-map Arrow surface — the two-sided Python escape
    hatch for per-key logic no window can express. Sharing the
    native-ASOF oracle certifies the cogroup path bit-for-bit against
    the window formulation's reference semantics.

    Scale shape (round 5, replacing the per-user cogroup): both sides
    cogroup on a HASH BUCKET of the key (user_id % 64), and pandas
    ``merge_asof(..., by="user_id")`` runs the per-user as-of
    VECTORIZED inside each block. Per-key pandas-frame construction
    was the dominant cost of the naive per-user cogroup (its own
    docstring conceded it breaks at billions of keys); bucketing makes
    Python-invocation count a CONSTANT (64 per stage) while the
    per-user logic stays in C inside merge_asof. Duplicate-timestamp
    collapse (max event_id per (user, ts)) runs in a JVM window BEFORE
    the cogroup, so each shipped right block is exactly the three
    columns the merge consumes.

    KNOWN OPTIMIZER HAZARD (observed on Spark 4.1, pinned in
    tests/test_plans.py): a REORDERING projection placed above
    FlatMapCoGroupsInPandas mis-prunes the right cogroup child (the
    plan showed the clicks side collapsing to [user_id, user_id,
    value], silently dropping columns before the Python worker). The
    output schema is therefore declared in ALPHABETICAL column order
    so a consumer's sort-columns-by-name projection is a no-op; the
    defensive empty-right guard below turns any residual mis-pruning
    into an immediately visible all-null tier rather than a crash.
    """
    import pandas as pd

    ev = table(spark, sf_dir, "events")
    bkt = (F.col("user_id") % COGROUP_BUCKETS).alias("bkt")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", bkt
    )
    dw = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .withColumn("rn", F.row_number().over(dw))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
            bkt,
        )
    )

    def merge(p_pdf: "pd.DataFrame", c_pdf: "pd.DataFrame") -> "pd.DataFrame":
        if not len(p_pdf):
            return pd.DataFrame(
                columns=["click_ts", "click_value", "event_id", "purchase_ts", "user_id"]
            )
        # merge_asof requires the `on` column globally sorted; `by`
        # handles the per-user partitioning internally (vectorized)
        p = p_pdf.sort_values("ts")
        # guard on the FULL required set: under aggressive column
        # pruning (a count() above the cogroup) the Spark 4.1
        # mis-pruning can ship a PARTIAL right block (click_ts without
        # user_id was observed); degrading to the empty frame keeps
        # row counts exact (the as-of preserves every left row) and
        # value-bearing fetches ship the full block
        if len(c_pdf) and {"user_id", "click_ts", "click_value"} <= set(
            c_pdf.columns
        ):
            c = c_pdf.sort_values("click_ts")[
                ["user_id", "click_ts", "click_value"]
            ]
        else:
            # a bucket with purchases but no clicks arrives as an EMPTY
            # (column-less) right block — synthesize the empty frame
            c = pd.DataFrame(
                {
                    "user_id": pd.Series(dtype=p["user_id"].dtype),
                    "click_ts": pd.Series(dtype=p["ts"].dtype),
                    "click_value": pd.Series(dtype="float64"),
                }
            )
        merged = pd.merge_asof(
            p, c, left_on="ts", right_on="click_ts", by="user_id",
            direction="backward",
        )
        return pd.DataFrame(
            {
                "click_ts": merged["click_ts"],
                # nullable Float64: merge_asof marks no-match as NaN,
                # which Arrow would ship as a NaN VALUE; the window twin
                # (and the oracle) emit genuine NULLs there
                "click_value": merged["click_value"].astype("Float64"),
                "event_id": merged["event_id"],
                "purchase_ts": merged["ts"],
                "user_id": merged["user_id"],
            }
        )

    return (
        purchases.groupBy("bkt")
        .cogroup(clicks.groupBy("bkt"))
        .applyInPandas(
            merge,
            schema="click_ts timestamp_ntz, click_value double, event_id bigint, "
            "purchase_ts timestamp_ntz, user_id bigint",
        )
    )
