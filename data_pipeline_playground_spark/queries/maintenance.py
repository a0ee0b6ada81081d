"""Table-maintenance operators: CDC upsert / merge-on-read compaction.

A long-lived corpus or warehouse table is maintained by merging change
batches (upserts + tombstone deletes) into the base — the Hudi/Delta
``MERGE INTO`` pattern. The engine-level primitive is latest-wins
keyed reconciliation: UNION the base with the change batch, rank by
version per key, keep the winner, drop tombstones.

The change batch here is *derived* from the orders table itself (keys
divisible by 10 get a status update, keys divisible by 17 a delete —
overlaps resolve to delete), so the operator is deterministic and
oracle-checkable without synthetic inputs.

At 100 TB: the union is shuffle-free (narrow concat of scans); the
only shuffle is the per-key window, and in a partitioned table layout
it runs only over the partitions the change batch touches (partition
pruning on the merge keys' partitions — see sources/parquet_sink.py).
Reference parity: the reference has no incremental maintenance; this
generalizes its batch-rebuild pipeline (pipeline.py:12-68) to the
incremental setting any standing 100 TB table needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_playground_spark.registry import query
from data_pipeline_playground_spark.tables import table

UPD_MOD = 10   # keys with o_orderkey % 10 == 0 receive a status update
DEL_MOD = 17   # keys with o_orderkey % 17 == 0 are deleted (tombstone)
UPDATED_STATUS = "X"

_MERGE_CTES = f"""
WITH base AS (
  SELECT o_orderkey, o_orderstatus, 0 AS version, 'I' AS op FROM orders
),
changes AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % {DEL_MOD} = 0 THEN o_orderstatus
              ELSE '{UPDATED_STATUS}' END AS o_orderstatus,
         1 AS version,
         CASE WHEN o_orderkey % {DEL_MOD} = 0 THEN 'D' ELSE 'U' END AS op
  FROM orders
  WHERE o_orderkey % {DEL_MOD} = 0 OR o_orderkey % {UPD_MOD} = 0
),
merged AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                               ORDER BY version DESC) AS rn
  FROM (SELECT * FROM base UNION ALL SELECT * FROM changes)
)
"""

_UPSERT_SQL = _MERGE_CTES + """
SELECT o_orderkey, o_orderstatus, version
FROM merged WHERE rn = 1 AND op <> 'D'
"""


@query("orders_upsert_latest", oracle=_UPSERT_SQL)
def orders_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins CDC merge: base ∪ change-batch → rank by version per
    key → keep winner → drop tombstones. The surviving row carries the
    version that won, so downstream can audit which rows were rewritten
    (version=1 ⇒ updated this batch).
    """
    orders = table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.lit(0).alias("version"),
        F.lit("I").alias("op"),
    )
    is_del = F.col("o_orderkey") % DEL_MOD == 0
    changes = (
        orders.filter(is_del | (F.col("o_orderkey") % UPD_MOD == 0))
        .select(
            "o_orderkey",
            F.when(is_del, F.col("o_orderstatus"))
            .otherwise(F.lit(UPDATED_STATUS))
            .alias("o_orderstatus"),
            F.lit(1).alias("version"),
            F.when(is_del, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        )
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("version"))
    return (
        base.unionByName(changes)
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("o_orderkey", "o_orderstatus", "version")
    )


# --- data-quality audit (Deequ-style constraint suite) ----------------------

_DQ_SQL = """
SELECT 'orders_fk_customer' AS check_name,
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) AS n_violations
UNION ALL
SELECT 'lineitem_fk_orders',
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'documents_text_nonempty',
       (SELECT count(*) FROM documents
        WHERE text IS NULL OR length(trim(text)) = 0)
UNION ALL
SELECT 'orders_totalprice_positive',
       (SELECT count(*) FROM orders WHERE o_totalprice <= 0)
UNION ALL
SELECT 'lineitem_qty_range',
       (SELECT count(*) FROM lineitem
        WHERE l_quantity < 1 OR l_quantity > 50)
UNION ALL
SELECT 'lineitem_discount_range',
       (SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1)
UNION ALL
SELECT 'events_ts_nonnull',
       (SELECT count(*) FROM events WHERE ts IS NULL)
"""


@query("dq_audit", oracle=_DQ_SQL)
def dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-suite audit (the Deequ/Great-Expectations shape): one
    row per declared check with its violation count — referential
    integrity, non-null/non-empty, value ranges, temporal ordering.
    The FK checks are LEFT ANTI joins (broadcast when the PK side is a
    dim, shuffle-hash when both sides are facts); every scalar check is
    a map-side-combinable conditional count over one scan. A pipeline
    gates ingest on `n_violations == 0` rows. At 100 TB each check
    prunes to the columns it reads (ReadSchema stays 1-2 columns per
    scan) and the union is a narrow concat of 1-row aggregates."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    lineitem = table(spark, sf_dir, "lineitem")
    documents = table(spark, sf_dir, "documents")
    events = table(spark, sf_dir, "events")

    def one(name: str, cnt: DataFrame) -> DataFrame:
        return cnt.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("long").alias("n_violations"),
        )

    checks = [
        one(
            "orders_fk_customer",
            orders.join(
                F.broadcast(customer.select("c_custkey")),
                orders.o_custkey == F.col("c_custkey"),
                "left_anti",
            ).agg(F.count(F.lit(1)).alias("n")),
        ),
        one(
            "lineitem_fk_orders",
            lineitem.join(
                orders.select("o_orderkey"),
                lineitem.l_orderkey == F.col("o_orderkey"),
                "left_anti",
            ).agg(F.count(F.lit(1)).alias("n")),
        ),
        one(
            "documents_text_nonempty",
            documents.agg(
                F.count_if(
                    F.col("text").isNull() | (F.length(F.trim("text")) == 0)
                ).alias("n")
            ),
        ),
        one(
            "orders_totalprice_positive",
            orders.agg(F.count_if(F.col("o_totalprice") <= 0).alias("n")),
        ),
        one(
            "lineitem_qty_range",
            lineitem.agg(
                F.count_if(
                    (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
                ).alias("n")
            ),
        ),
        one(
            "lineitem_discount_range",
            lineitem.agg(
                F.count_if(
                    (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
                ).alias("n")
            ),
        ),
        one(
            "events_ts_nonnull",
            events.agg(F.count_if(F.col("ts").isNull()).alias("n")),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


# --- snapshot diff (time-travel DIFF between table versions) ----------------

_DIFF_SQL = _MERGE_CTES + """,
final AS (
  SELECT o_orderkey, o_orderstatus
  FROM merged WHERE rn = 1 AND op <> 'D'
),
b AS (SELECT o_orderkey, o_orderstatus FROM orders)
SELECT coalesce(b.o_orderkey, f.o_orderkey) AS o_orderkey,
       CASE WHEN f.o_orderkey IS NULL THEN 'removed'
            WHEN b.o_orderkey IS NULL THEN 'added'
            ELSE 'changed' END AS change_type
FROM b FULL OUTER JOIN final f ON b.o_orderkey = f.o_orderkey
WHERE f.o_orderkey IS NULL OR b.o_orderkey IS NULL
   OR b.o_orderstatus <> f.o_orderstatus
"""


@query("orders_snapshot_diff", oracle=_DIFF_SQL)
def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between the base table and its post-merge version
    (the lakehouse time-travel DIFF): full outer join on the merge key,
    classify each divergent key added / removed / changed. Both
    snapshots shuffle once on the key (and in a key-partitioned layout
    the join is co-located — zero extra shuffle); unchanged rows are
    filtered pre-output so the result is change-sized, not
    table-sized."""
    orders = table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("bk"), F.col("o_orderstatus").alias("bs")
    )
    final = orders_upsert_latest(spark, sf_dir).select(
        F.col("o_orderkey").alias("fk"), F.col("o_orderstatus").alias("fs")
    )
    j = base.join(final, base.bk == final.fk, "full_outer")
    return j.filter(
        F.col("fk").isNull() | F.col("bk").isNull() | (F.col("bs") != F.col("fs"))
    ).select(
        F.coalesce("bk", "fk").alias("o_orderkey"),
        F.when(F.col("fk").isNull(), "removed")
        .when(F.col("bk").isNull(), "added")
        .otherwise("changed")
        .alias("change_type"),
    )


# --- SCD2 dimension history from a change log -------------------------------

_SCD2_SQL = """
WITH ev AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
),
chg AS (
  SELECT user_id, ts, event_id, event_type FROM ev
  WHERE prev IS NULL OR event_type <> prev
),
iv AS (
  SELECT user_id, event_type AS state, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS valid_to
  FROM chg
)
SELECT user_id, state, valid_from, valid_to,
       valid_to IS NULL AS is_current
FROM iv
"""


@query("user_state_scd2", oracle=_SCD2_SQL)
def user_state_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build from a change log: each
    user's event stream collapses consecutive identical states, then
    every surviving state change becomes a validity interval
    [valid_from, valid_to) with the open interval flagged is_current —
    the standard dimension-history table a warehouse derives from CDC.
    Both windows partition by user_id, so the lag-collapse and the
    lead-intervalization share ONE hash shuffle end-to-end."""
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        events.select(
            "user_id", "ts", "event_id", "event_type",
            F.lag("event_type").over(w).alias("prev"),
        )
        .filter(F.col("prev").isNull() | (F.col("event_type") != F.col("prev")))
    )
    iv = chg.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    return iv.select(
        "user_id", "state", "valid_from", "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


# --- point-in-time SCD2 dimension lookup ------------------------------------

_PIT_SQL = """
WITH ev AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
),
chg AS (
  SELECT user_id, ts, event_id, event_type FROM ev
  WHERE prev IS NULL OR event_type <> prev
),
iv AS (
  SELECT user_id, event_type AS state, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS valid_to
  FROM chg
),
p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts AS purchase_ts, iv.state
FROM p LEFT JOIN iv
  ON iv.user_id = p.user_id
 AND iv.valid_from <= p.ts
 AND (iv.valid_to IS NULL OR p.ts < iv.valid_to)
"""


@query("purchases_pit_state", oracle=_PIT_SQL)
def purchases_pit_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME dimension lookup against the SCD2 history that
    user_state_scd2 builds: each purchase resolves the user's state
    valid AT its timestamp — the canonical warehouse "fact joins the
    dimension as-of fact time" operation (and the ML-pipeline
    train-serve-skew guard: features must come from the version valid
    at label time, never the current one).

    Distributed shape: NO interval join at all. The state-change rows
    and the purchase probes union under ONE user_id shuffle and a
    running last_value window carries the in-effect state onto each
    probe — linear in |events|, immune to the per-key quadratic blowup
    of a naive [from, to) theta-join, and the same proven union+window
    shape as purchases_asof_click. Ties at one timestamp: changes sort
    before probes (tag 0 < 1) so a purchase sees a state beginning at
    its own instant (matching valid_from <= ts inclusive), and
    same-instant changes resolve by event_id like the SCD2 build.

    Oracle: DuckDB joins the materialized intervals natively, so the
    window re-expression is checked against the interval semantics."""
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        events.select(
            "user_id", "ts", "event_id", "event_type",
            F.lag("event_type").over(w).alias("prev"),
        )
        .filter(F.col("prev").isNull() | (F.col("event_type") != F.col("prev")))
        .select(
            "user_id", "ts", "event_id",
            F.col("event_type").alias("state"),
            F.lit(0).alias("tag"),
            F.lit(None).cast("bigint").alias("probe_id"),
        )
    )
    probes = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id",
        F.lit(None).cast("string").alias("state"),
        F.lit(1).alias("tag"),
        F.col("event_id").alias("probe_id"),
    )
    mw = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = chg.unionByName(probes).select(
        "user_id", "ts", "tag", "probe_id",
        F.last("state", ignorenulls=True).over(mw).alias("state"),
    )
    return merged.filter(F.col("tag") == 1).select(
        F.col("probe_id").alias("event_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "state",
    )


# --- incremental view maintenance: aggregate-state merge --------------------

IVM_CUTOFF = "1995-06-01"

_IVM_SQL = """
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
FROM orders
GROUP BY o_custkey
"""


@query("orders_ivm_merge", oracle=_IVM_SQL)
def orders_ivm_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the per-customer aggregate is
    computed as TWO independent partial states (orders before / since
    IVM_CUTOFF — standing state + change batch) merged by a full-outer
    coalesce-add join. The ORACLE aggregates the whole table directly,
    so value equality certifies the IVM merge law
    (merge(agg(old), agg(delta)) == agg(old ∪ delta)) — the property
    that lets a 100 TB standing aggregate absorb a daily batch without
    rescanning history. Counts and exact-decimal sums are the
    combinable-state pattern every agg in this repo follows; the merge
    join keys both sides on o_custkey, so at scale it co-partitions
    with the stored state's bucketing and the delta side is the only
    new scan."""
    orders = table(spark, sf_dir, "orders")
    cutoff = F.to_date(F.lit(IVM_CUTOFF))

    def state(side: DataFrame) -> DataFrame:
        return side.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"),
        )

    old = state(orders.filter(F.col("o_orderdate") < cutoff))
    delta = state(orders.filter(F.col("o_orderdate") >= cutoff)).select(
        F.col("o_custkey").alias("d_custkey"),
        F.col("n").alias("dn"),
        F.col("s").alias("ds"),
    )
    merged = old.join(
        delta, old["o_custkey"] == delta["d_custkey"], "full_outer"
    )
    zero = F.lit("0").cast("decimal(18,2)")
    return merged.select(
        F.coalesce("o_custkey", "d_custkey").alias("o_custkey"),
        (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n_orders"),
        (F.coalesce("s", zero) + F.coalesce("ds", zero))
        .cast("double")
        .alias("total_spent"),
    )


# --- join-key skew profiler -------------------------------------------------

SKEW_TOP_N = 10

# float discipline: every arithmetic step is an explicit DOUBLE op on
# exact integers (DuckDB float literals are DECIMAL, which would route
# the math through a different rounding path than Spark's doubles)
_SKEW_SQL = f"""
WITH k AS (
  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY l_suppkey
),
tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS n_keys
  FROM k
)
SELECT k.l_suppkey, k.cnt,
       round(CAST(k.cnt AS DOUBLE) * CAST(1000000 AS DOUBLE)
             / CAST(tot.total AS DOUBLE), 6) AS ppm_share,
       round(CAST(k.cnt AS DOUBLE)
             / (CAST(tot.total AS DOUBLE) / CAST(tot.n_keys AS DOUBLE)), 6)
         AS skew_ratio
FROM k, tot
QUALIFY row_number() OVER (ORDER BY k.cnt DESC, k.l_suppkey) <= {SKEW_TOP_N}
"""


@query("lineitem_supplier_skew", oracle=_SKEW_SQL)
def lineitem_supplier_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key SKEW profiler — the diagnostic that decides between a
    plain shuffle join, AQE skew-join splitting, and key salting
    (SCALE.md's skew playbook needs this measurement first): per-key
    row counts for a prospective join key, the top-N heavy hitters
    with parts-per-million share, and each hitter's ratio to the mean
    key load. One map-side-combined count shuffle; the totals are a
    2-value broadcast; top-N is a TakeOrdered, never a global sort.
    ppm/ratio are single shared double divisions of exact integers —
    IEEE-identical in both engines, round(6) pins the display."""
    li = table(spark, sf_dir, "lineitem")
    k = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("cnt"))
    tot = k.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    prof = k.crossJoin(F.broadcast(tot)).select(
        "l_suppkey",
        "cnt",
        F.round(
            F.col("cnt").cast("double")
            * F.lit(1000000).cast("double")
            / F.col("total").cast("double"),
            6,
        ).alias("ppm_share"),
        F.round(
            F.col("cnt").cast("double")
            / (F.col("total").cast("double") / F.col("n_keys").cast("double")),
            6,
        ).alias("skew_ratio"),
    )
    # orderBy+limit compiles to TakeOrderedAndProject — per-partition
    # top-N then a driver-side merge of N·P rows, never a global sort
    return prof.orderBy(F.desc("cnt"), F.asc("l_suppkey")).limit(SKEW_TOP_N)


# --- Benford first-digit audit ----------------------------------------------

# log10(1 + 1/d) to 6 dp; the nine values sum to exactly 1.000000.
_BENFORD_P6 = {
    1: "0.301030", 2: "0.176091", 3: "0.124939", 4: "0.096910",
    5: "0.079181", 6: "0.066947", 7: "0.057992", 8: "0.051153",
    9: "0.045757",
}

_BENFORD_CASE = "CASE s.digit " + " ".join(
    f"WHEN {d} THEN CAST({p} AS DECIMAL(7,6))" for d, p in _BENFORD_P6.items()
) + " END"

_BENFORD_SQL = f"""
WITH obs AS (
  SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
              AS BIGINT) AS digit,
         CAST(count(*) AS BIGINT) AS n_obs
  FROM orders GROUP BY 1
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
spine AS (SELECT unnest(generate_series(1, 9)) AS digit)
SELECT s.digit,
       COALESCE(o.n_obs, 0) AS n_obs,
       CAST(COALESCE(o.n_obs, 0) AS DOUBLE) / CAST(t.n AS DOUBLE)
         AS observed_share,
       CAST({_BENFORD_CASE} AS DOUBLE) AS benford_share,
       (CAST(COALESCE(o.n_obs, 0) AS DOUBLE) / CAST(t.n AS DOUBLE)
        - CAST({_BENFORD_CASE} AS DOUBLE)) * 100.0 AS excess_pp
FROM spine s LEFT JOIN obs o ON o.digit = s.digit CROSS JOIN tot t
"""


@query("benford_audit", oracle=_BENFORD_SQL)
def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the classic
    fraud / data-quality screen: organically-grown money amounts
    follow P(d) = log10(1 + 1/d); synthetic or truncated data does
    not. Output: per digit 1..9, observed count, observed share,
    Benford share, and the excess in percentage points.

    Transcendental-free (memory rule): the nine log10 constants are
    hard-coded 6-dp DECIMAL literals (they sum to exactly 1.000000),
    and every double is derived from exact integers / decimals in one
    shared expression tree — no log10() call, no engine ulp drift.
    First digit comes from the decimal's string form, not
    floor(x/10^floor(log10 x)).

    Scale: one hash agg on a 9-value key + a broadcast scalar total;
    the digit spine is a 9-row literal frame.
    """
    orders = table(spark, sf_dir, "orders")
    digit = F.substring(
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
    ).cast("bigint")
    obs = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").alias("n_obs")
    )
    tot = orders.agg(F.count("*").alias("n"))
    spine = spark.range(1, 10).select(F.col("id").alias("digit"))
    benford = F.element_at(
        F.create_map(
            *[
                c
                for d, p in _BENFORD_P6.items()
                for c in (F.lit(d).cast("bigint"),
                          F.lit(p).cast("decimal(7,6)"))
            ]
        ),
        F.col("digit"),
    )
    n_obs = F.coalesce(F.col("n_obs"), F.lit(0).cast("bigint"))
    observed = n_obs.cast("double") / F.col("n").cast("double")
    return (
        spine.join(obs, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            n_obs.alias("n_obs"),
            observed.alias("observed_share"),
            benford.cast("double").alias("benford_share"),
            ((observed - benford.cast("double")) * F.lit(100.0)).alias(
                "excess_pp"
            ),
        )
    )


# --- schema-wide join-key skew audit ------------------------------------------

# (table, key column) pairs every big join in the schema shuffles on.
_SKEW_KEYS = (
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("lineitem", "l_orderkey"),
    ("orders", "o_custkey"),
)

_SKEW_TOP = 8


def _skew_col_sql(tbl: str, col: str) -> str:
    return f"""
SELECT '{tbl}' AS table_name, '{col}' AS key_column,
       CAST((SELECT count(*) FROM {tbl}) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(max(n) AS BIGINT) AS max_key_rows,
       CAST(max(n) AS DOUBLE)
         / CAST((SELECT count(*) FROM {tbl}) AS DOUBLE) AS max_key_share,
       CAST((SELECT CAST(SUM(n) AS BIGINT) FROM
              (SELECT n FROM (SELECT {col}, count(*) AS n FROM {tbl} GROUP BY 1)
               ORDER BY n DESC LIMIT {_SKEW_TOP})) AS DOUBLE)
         / CAST((SELECT count(*) FROM {tbl}) AS DOUBLE) AS top{_SKEW_TOP}_share,
       (CAST(max(n) AS DOUBLE) * CAST(count(*) AS DOUBLE))
         / CAST((SELECT count(*) FROM {tbl}) AS DOUBLE) AS max_over_avg
FROM (SELECT {col}, count(*) AS n FROM {tbl} GROUP BY 1)
"""


_SKEW_AUDIT_SQL = "\nUNION ALL\n".join(
    _skew_col_sql(t, c) for t, c in _SKEW_KEYS
)


@query("join_key_skew_audit", oracle=_SKEW_AUDIT_SQL)
def join_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per join key the schema shuffles on: cardinality, the
    heaviest key's row count and share, the top-8 concentration, and
    max/avg (straggler factor — how much slower the hottest shuffle
    partition runs than the average). The planning audit that decides
    where salting or AQE skew-join handling is needed BEFORE a 100 TB
    run — the whole-schema generalization of `lineitem_supplier_skew`.

    Per key: one combinable count aggregate (the exchange carries
    distinct keys), a one-row moment aggregate, and a TakeOrdered-8 —
    the top-8 SUM is tie-order independent (the multiset of counts
    determines it), so no tie-break is needed for determinism.
    """
    out: DataFrame | None = None
    for tbl, col in _SKEW_KEYS:
        df = table(spark, sf_dir, tbl)
        counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("n"))
        top = (
            counts.orderBy(F.desc("n"), F.asc(col))
            .limit(_SKEW_TOP)
            .agg(F.sum("n").alias("top_n"))
        )
        stats = counts.agg(
            F.count(F.lit(1)).alias("n_keys"), F.max("n").alias("max_key_rows")
        )
        total = df.agg(F.count(F.lit(1)).alias("n_rows"))
        row = (
            stats.crossJoin(total)
            .crossJoin(top)
            .select(
                F.lit(tbl).alias("table_name"),
                F.lit(col).alias("key_column"),
                "n_rows",
                "n_keys",
                "max_key_rows",
                (
                    F.col("max_key_rows").cast("double")
                    / F.col("n_rows").cast("double")
                ).alias("max_key_share"),
                (F.col("top_n").cast("double") / F.col("n_rows").cast("double")).alias(
                    f"top{_SKEW_TOP}_share"
                ),
                (
                    F.col("max_key_rows").cast("double")
                    * F.col("n_keys").cast("double")
                    / F.col("n_rows").cast("double")
                ).alias("max_over_avg"),
            )
        )
        out = row if out is None else out.unionByName(row)
    assert out is not None
    return out


# --- incremental view maintenance: JOIN delta rule -----------------------------

JOIN_IVM_CUTOFF = "1995-06-01"

_JOIN_IVM_SQL = """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


@query("join_ivm_certificate", oracle=_JOIN_IVM_SQL)
def join_ivm_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN delta-rule certificate: the priority revenue view computed
    by the INCREMENTAL decomposition
    (A∪ΔA)⋈(B∪ΔB) = A⋈B ∪ A⋈ΔB ∪ ΔA⋈B ∪ ΔA⋈ΔB
    (orders split at JOIN_IVM_CUTOFF by order date, lineitem by ship
    date — disjoint splits make the four quadrants a partition of the
    join), with the four quadrant aggregates merged additively. The
    oracle is the DIRECT join — matching hashes certify the delta
    rule an incremental pipeline relies on, the join analogue of
    `orders_ivm_merge`'s aggregate merge law.

    Plan: ONE co-partitioned fact⋈fact join carrying base/delta tags,
    a 4-quadrant partial aggregate (map-side combinable), then the
    |priority|×4 → |priority| merge — the same exchange profile as
    the direct query, plus nothing.
    """
    cutoff = F.lit(JOIN_IVM_CUTOFF).cast("timestamp_ntz")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("o_orderdate") < cutoff).alias("a_base"),
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
        (F.col("l_shipdate") < cutoff).alias("b_base"),
    )
    quad = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority", "a_base", "b_base")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("price").alias("rev"),
        )
    )
    return quad.groupBy("o_orderpriority").agg(
        F.sum("n").cast("bigint").alias("n_lines"),
        F.sum("rev").cast("decimal(18,2)").cast("double").alias("revenue"),
    )


# --- portable table checksum ---------------------------------------------------

CK_P = 2_147_483_647  # Mersenne prime 2^31 - 1
CK_B = 1_000_003      # polynomial base
CK_BUCKETS = 1024

# canonical integer projections per table: every column is reduced to
# an exact int64 before hashing (cents / epoch-seconds / raw keys), so
# both engines hash identical integers.
_CK_TABLES = {
    "orders": (
        "o_orderkey",
        "o_custkey",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)",
    ),
    "lineitem": (
        "l_orderkey",
        "l_partkey * 10 + l_linenumber",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)",
    ),
    "customer": ("c_custkey", "c_nationkey", 
                 "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"),
}


def _ck_sig(cols) -> str:
    """Horner-chain polynomial signature mod CK_P — pure int64 at every
    step (each projection is cast to BIGINT first: 32-bit columns would
    otherwise overflow in ANSI mode): value < P, value*B + next <
    P*B + 2^33 « 2^63."""
    def _c(c):
        return f"(CAST({c} AS BIGINT) % {CK_P} + {CK_P}) % {CK_P}"

    sig = _c(cols[0])
    for c in cols[1:]:
        sig = f"((({sig}) * {CK_B} + {_c(c)}) % {CK_P})"
    return sig


def _ck_table_sql(tbl: str, cols) -> str:
    sig = _ck_sig(cols)
    return f"""
SELECT '{tbl}' AS table_name,
       CAST(SUM(bn) AS BIGINT) AS n_rows,
       CAST(SUM(bsum % {CK_P}) % {CK_P} AS BIGINT) AS checksum
FROM (
  SELECT count(*) AS bn, SUM(sig) AS bsum
  FROM (SELECT ({cols[0]}) % {CK_BUCKETS} AS bucket, {sig} AS sig FROM {tbl})
  GROUP BY bucket
)
"""


_CHECKSUM_SQL = "\nUNION ALL\n".join(
    _ck_table_sql(t, c) for t, c in sorted(_CK_TABLES.items())
)


@query("table_checksum", oracle=_CHECKSUM_SQL)
def table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-free polynomial checksum per table (mod 2³¹−1 Horner
    chain over canonical integer projections) — the replication /
    migration verification primitive: two copies of a table match iff
    (n_rows, checksum) match, regardless of row order, partitioning,
    or engine. Every step is exact int64; the row-signature SUM uses a
    TWO-LEVEL mod (per-bucket sums bounded by bucket_rows·P < 2⁶³ for
    ~4×10⁹ rows per bucket; the outer sum is ≤ buckets·P) so no
    intermediate ever needs int128 — portable to any SQL engine.

    Plan per table: one map-side-combinable bucket aggregate (1024
    groups) + a one-row fold; the three tables union. doubles enter
    only through lossless cents decimals.
    """
    out: DataFrame | None = None
    for tbl, cols in sorted(_CK_TABLES.items()):
        df = table(spark, sf_dir, tbl)
        sig = F.expr(_ck_sig(cols))
        bucket = F.expr(f"({cols[0]}) % {CK_BUCKETS}")
        b = (
            df.select(bucket.alias("bucket"), sig.alias("sig"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("bn"), F.sum("sig").alias("bsum"))
        )
        row = b.agg(
            F.lit(tbl).alias("table_name"),
            F.sum("bn").cast("bigint").alias("n_rows"),
            (F.sum(F.col("bsum") % CK_P) % CK_P).cast("bigint").alias("checksum"),
        )
        out = row if out is None else out.unionByName(row)
    assert out is not None
    return out
