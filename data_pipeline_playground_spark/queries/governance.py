"""Data-governance audits: referential integrity, k-anonymity /
l-diversity, and multi-touch revenue attribution.

The reference pipeline trusts its joins implicitly (`pipeline.py`
joins articles to clusters by id with no orphan handling); a warehouse
serving 100 TB needs the audit queries that PROVE those invariants
before anything downstream consumes the tables. None of these exist in
the reference — they generalize its id-join surface (SURVEY §2 J1/J4)
into the checks a production pipeline runs on every load.

Scale notes (SCALE.md §Governance):
- fk_integrity_audit: each edge is one partial-agg shuffle on the FK
  (map-side combine collapses lineitem to its distinct keys before the
  exchange) + one key-join against the parent's primary keys —
  broadcast for dimension parents, co-partitioned shuffle join for
  fact-fact edges (lineitem→orders). The union is 7 one-row frames.
- k_anonymity_audit: two hash aggregations (QI grouping, then the
  group-size histogram); the final single-partition window runs over
  the bounded distinct-k histogram, never the raw table.
- attribution_linear: the preceding-hour touch lookup is the bucketed
  range-join shape (equi-join on (user, floor-epoch bucket) with a 2×
  probe fanout and a residual interval filter — never a theta join);
  per-purchase fan-in is a window on event_id. Credit is split in
  integer micro-units (value → DECIMAL(18,6) → micros DIV n_touches),
  so sums are order-free and bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_playground_spark.registry import query
from data_pipeline_playground_spark.tables import table

# --- referential-integrity audit ---------------------------------------------

# (child table, fk column, parent table, pk column); parents marked
# dim are broadcast-sized at any scale factor.
_FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey", False),
    ("lineitem", "l_partkey", "part", "p_partkey", True),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey", True),
    ("orders", "o_custkey", "customer", "c_custkey", True),
    ("customer", "c_nationkey", "nation", "n_nationkey", True),
    ("supplier", "s_nationkey", "nation", "n_nationkey", True),
    ("nation", "n_regionkey", "region", "r_regionkey", True),
)


def _fk_edge_sql(child: str, fk: str, parent: str, pk: str) -> str:
    return f"""
SELECT '{child}' AS child_table, '{fk}' AS fk_column,
       '{parent}' AS parent_table,
       CAST(SUM(k.n) AS BIGINT) AS n_child_rows,
       CAST(SUM(CASE WHEN k.{fk} IS NULL THEN k.n ELSE 0 END) AS BIGINT)
         AS n_null_fk,
       CAST(SUM(CASE WHEN k.{fk} IS NOT NULL AND p.pk IS NULL
                     THEN k.n ELSE 0 END) AS BIGINT) AS n_orphan_rows,
       CAST(COUNT(k.{fk}) AS BIGINT) AS n_distinct_keys,
       CAST(SUM(CASE WHEN k.{fk} IS NOT NULL AND p.pk IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_keys
FROM (SELECT {fk}, count(*) AS n FROM {child} GROUP BY 1) k
LEFT JOIN (SELECT DISTINCT {pk} AS pk FROM {parent}) p ON k.{fk} = p.pk
"""


_FK_SQL = "\nUNION ALL\n".join(
    _fk_edge_sql(c, f, p, k) for c, f, p, k, _ in _FK_EDGES
)


@query("fk_integrity_audit", oracle=_FK_SQL)
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per foreign-key edge of the star schema: child rows,
    null FKs, orphan rows (FK present, parent missing), distinct keys,
    orphan keys. The load-gate audit a pipeline runs before exposing a
    snapshot — the reference assumes clean ids (pipeline.py id joins);
    this query is the check that assumption rests on.

    Each edge pre-aggregates the child to (fk, n) — map-side combine
    makes the exchange carry distinct keys, not rows — then left-joins
    the parent's keys (broadcast for dimensions; the lineitem→orders
    edge stays a co-partitioned key join).
    """
    out: DataFrame | None = None
    for child, fk, parent, pk, is_dim in _FK_EDGES:
        keys = table(spark, sf_dir, child).groupBy(fk).agg(F.count(F.lit(1)).alias("n"))
        par = table(spark, sf_dir, parent).select(F.col(pk).alias("pk")).distinct()
        if is_dim:
            par = F.broadcast(par)
        joined = keys.join(par, F.col(fk) == F.col("pk"), "left")
        orphan = F.col(fk).isNotNull() & F.col("pk").isNull()
        row = joined.agg(
            F.lit(child).alias("child_table"),
            F.lit(fk).alias("fk_column"),
            F.lit(parent).alias("parent_table"),
            F.sum("n").alias("n_child_rows"),
            F.sum(F.when(F.col(fk).isNull(), F.col("n")).otherwise(F.lit(0))).alias(
                "n_null_fk"
            ),
            F.sum(F.when(orphan, F.col("n")).otherwise(F.lit(0))).alias(
                "n_orphan_rows"
            ),
            F.count(F.col(fk)).alias("n_distinct_keys"),
            F.sum(F.when(orphan, F.lit(1)).otherwise(F.lit(0))).alias(
                "n_orphan_keys"
            ),
        )
        out = row if out is None else out.unionByName(row)
    assert out is not None
    return out


# --- k-anonymity / l-diversity audit -----------------------------------------

_KANON_SQL = """
WITH qi AS (
  SELECT c_nationkey,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS acctbal_band,
         count(*) AS k,
         count(DISTINCT c_mktsegment) AS l
  FROM customer
  GROUP BY 1, 2
),
hist AS (
  SELECT k AS group_k,
         CAST(count(*) AS BIGINT) AS n_groups,
         CAST(SUM(k) AS BIGINT) AS n_rows,
         CAST(MIN(l) AS BIGINT) AS min_l_diversity
  FROM qi GROUP BY 1
)
SELECT group_k, n_groups, n_rows, min_l_diversity,
       CAST(n_rows AS DOUBLE) / CAST(SUM(n_rows) OVER () AS DOUBLE)
         AS row_share,
       group_k < 5 AS reidentifiable
FROM hist
"""


@query("k_anonymity_audit", oracle=_KANON_SQL)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-size histogram of the quasi-identifier (nation,
    account-balance band): for each anonymity level k, how many QI
    groups and rows sit at it, the minimum l-diversity of the
    sensitive attribute (market segment) among those groups, and the
    share of the table re-identifiable under k < 5 — the release gate
    for sharing per-customer aggregates (Sweeney 2002, k-anonymity).

    Two hash aggregations; the share denominator is an unpartitioned
    window over the bounded distinct-k histogram (tens of rows at any
    scale), never the customer table. floor(x/1000) is a single IEEE
    division + floor — deterministic and identical across engines; the
    share is int64-exact counts combined in one shared double division.
    """
    cust = table(spark, sf_dir, "customer")
    qi = cust.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / F.lit(1000)).alias("acctbal_band"),
    ).agg(
        F.count(F.lit(1)).alias("k"),
        F.countDistinct("c_mktsegment").alias("l"),
    )
    hist = qi.groupBy(F.col("k").alias("group_k")).agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("k").alias("n_rows"),
        F.min("l").alias("min_l_diversity"),
    )
    w = Window.partitionBy()
    return hist.select(
        "group_k",
        "n_groups",
        "n_rows",
        "min_l_diversity",
        (
            F.col("n_rows").cast("double") / F.sum("n_rows").over(w).cast("double")
        ).alias("row_share"),
        (F.col("group_k") < 5).alias("reidentifiable"),
    )


# --- multi-touch attribution --------------------------------------------------

_ATTR_WINDOW_S = 3600


def _touch_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(purchase event_id, micros, c_ts, c_eid) — one row per click the
    same user made in the hour before the purchase, plus one NULL-touch
    row per touchless purchase. Shared by every attribution model.

    The preceding-hour lookup is the bucketed range join: equi-join on
    (user, floor-epoch hour bucket) with purchases probing their own +
    previous bucket and the exact interval as a residual filter. The
    inner match needs no dedup (each click's bucket equals exactly one
    probe), and duplicate-timestamp clicks stay distinct rows — the
    same multiset a LEFT JOIN theta formulation produces; touchless
    purchases come back via an anti join.
    """
    ev = table(spark, sf_dir, "events")
    epoch_s = "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    bucket = (F.expr(epoch_s) / _ATTR_WINDOW_S).cast("bigint")
    micros = (F.col("value").cast("decimal(18,6)") * 1000000).cast("bigint")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_eid"),
        bucket.alias("c_bucket"),
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", micros.alias("micros"), bucket.alias("p_bucket"))
        .withColumn("probe", F.explode(F.array(F.col("p_bucket"), F.col("p_bucket") - 1)))
    )
    hit = (F.col("c_ts") <= F.col("ts")) & (
        F.col("c_ts") > F.col("ts") - F.expr(f"INTERVAL {_ATTR_WINDOW_S} SECONDS")
    )
    matched = (
        purchases.join(
            clicks,
            (F.col("user_id") == F.col("c_user")) & (F.col("probe") == F.col("c_bucket")),
            "inner",
        )
        .filter(hit)
        .select("event_id", "micros", "c_ts", "c_eid")
    )
    base = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", micros.alias("micros")
    )
    touchless = (
        base.join(matched.select("event_id"), "event_id", "left_anti")
        .withColumn("c_ts", F.lit(None).cast("timestamp_ntz"))
        .withColumn("c_eid", F.lit(None).cast("bigint"))
    )
    return matched.unionByName(touchless)

_ATTR_SQL = f"""
WITH purchases AS (
  SELECT event_id, user_id, ts,
         CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS micros
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id AS c_user, ts AS c_ts FROM events
  WHERE event_type = 'click'
),
pairs AS (
  SELECT p.event_id, p.micros,
         c.c_ts,
         COUNT(c.c_ts) OVER (PARTITION BY p.event_id) AS n_touches
  FROM purchases p
  LEFT JOIN clicks c
    ON c.c_user = p.user_id
   AND c.c_ts <= p.ts
   AND c.c_ts > p.ts - INTERVAL {_ATTR_WINDOW_S} SECONDS
)
SELECT CASE WHEN c_ts IS NULL THEN -1
            ELSE CAST(extract(hour FROM c_ts) AS INTEGER) END AS touch_hour,
       CAST(count(*) AS BIGINT) AS n_touches,
       CAST(SUM(CASE WHEN c_ts IS NULL THEN micros
                     ELSE micros // n_touches END) AS BIGINT)
         AS attributed_micros,
       CAST(CAST(SUM(CASE WHEN c_ts IS NULL THEN micros
                          ELSE micros // n_touches END) AS BIGINT) AS DOUBLE)
         / 1000000.0 AS attributed_value
FROM pairs
GROUP BY 1
"""


@query("attribution_linear", oracle=_ATTR_SQL)
def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's value is split
    equally across the user's clicks in the preceding hour, and the
    credit is rolled up by the click's hour-of-day (touch_hour = -1
    collects purchases with no preceding touch at full value) — the
    channel-credit report behind `asof_last_click`'s last-touch
    counterpart.

    Distributed shape: the preceding-hour lookup is the bucketed range
    join (equi-join on (user, floor-epoch hour bucket), purchases probe
    their own + previous bucket, exact interval as residual filter);
    the per-purchase fan-in count is a window on event_id. Credit is
    integer micro-units floor-divided by the touch count (both engines
    truncate non-negative integer division identically), so every sum
    is int64-exact; the only double is the final shared /1e6.
    """
    pairs = _touch_pairs(spark, sf_dir)
    n_touches = F.count("c_ts").over(Window.partitionBy("event_id"))
    credited = pairs.select(
        "micros",
        "c_ts",
        n_touches.alias("n_touches"),
    )
    credit = F.when(F.col("c_ts").isNull(), F.col("micros")).otherwise(
        F.expr("micros div n_touches")
    )
    return (
        credited.select(
            F.when(F.col("c_ts").isNull(), F.lit(-1))
            .otherwise(F.hour("c_ts"))
            .cast("int")
            .alias("touch_hour"),
            credit.alias("credit_micros"),
        )
        .groupBy("touch_hour")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum("credit_micros").alias("attributed_micros"),
            (F.sum("credit_micros").cast("double") / F.lit(1000000.0)).alias(
                "attributed_value"
            ),
        )
    )


# --- position-based (U-shaped) attribution ------------------------------------

_USHAPE_SQL = f"""
WITH purchases AS (
  SELECT event_id, user_id, ts,
         CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS micros
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id AS c_user, ts AS c_ts, event_id AS c_eid FROM events
  WHERE event_type = 'click'
),
pairs AS (
  SELECT p.event_id, p.micros, c.c_ts, c.c_eid,
         COUNT(c.c_ts) OVER (PARTITION BY p.event_id) AS n,
         CASE WHEN c.c_ts IS NULL THEN NULL ELSE
           row_number() OVER (PARTITION BY p.event_id
                              ORDER BY c.c_ts, c.c_eid) END AS rk
  FROM purchases p
  LEFT JOIN clicks c
    ON c.c_user = p.user_id
   AND c.c_ts <= p.ts
   AND c.c_ts > p.ts - INTERVAL {_ATTR_WINDOW_S} SECONDS
),
credited AS (
  SELECT
    CASE WHEN c_ts IS NULL THEN 'unattributed'
         WHEN n = 1 THEN 'only'
         WHEN rk = 1 THEN 'first'
         WHEN rk = n THEN 'last'
         ELSE 'middle' END AS position_class,
    CASE WHEN c_ts IS NULL THEN micros
         WHEN n = 1 THEN micros
         WHEN n = 2 AND rk = 1 THEN micros // 2
         WHEN n = 2 THEN micros - micros // 2
         WHEN rk = 1 THEN (micros * 2) // 5
         WHEN rk = n THEN micros - (micros * 2) // 5
                           - (n - 2) * ((micros // 5) // (n - 2))
         ELSE (micros // 5) // (n - 2) END AS credit
  FROM pairs
)
SELECT position_class,
       CAST(count(*) AS BIGINT) AS n_touches,
       CAST(SUM(credit) AS BIGINT) AS attributed_micros,
       CAST(CAST(SUM(credit) AS BIGINT) AS DOUBLE) / 1000000.0
         AS attributed_value
FROM credited
GROUP BY position_class
"""


@query("attribution_ushape", oracle=_USHAPE_SQL)
def attribution_ushape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) attribution: 40% of each purchase's
    value to the first click in the preceding hour, 40% to the last,
    20% split across the middles (1 touch → 100%, 2 → 50/50,
    untouched → 'unattributed' at full value), rolled up per position
    class — the industry-standard contrast to `attribution_linear`
    and `asof_last_click`.

    Credit is integer micro-units with the LAST touch absorbing every
    floor-division remainder, so the model conserves revenue EXACTLY:
    Σ attributed_micros == Σ purchase micros (pinned by test). Same
    bucketed range-join shape as the other attribution models; touch
    ranks are a per-purchase window ordered by (ts, click id) — a
    total order, so both engines rank identically.
    """
    pairs = _touch_pairs(spark, sf_dir)
    w = Window.partitionBy("event_id")
    w_rk = w.orderBy("c_ts", "c_eid")
    ranked = pairs.select(
        "micros",
        "c_ts",
        F.count("c_ts").over(w).alias("n"),
        F.when(
            F.col("c_ts").isNull(), F.lit(None).cast("int")
        ).otherwise(F.row_number().over(w_rk)).alias("rk"),
    )
    position = (
        F.when(F.col("c_ts").isNull(), F.lit("unattributed"))
        .when(F.col("n") == 1, F.lit("only"))
        .when(F.col("rk") == 1, F.lit("first"))
        .when(F.col("rk") == F.col("n"), F.lit("last"))
        .otherwise(F.lit("middle"))
    )
    credit = F.expr(
        "CASE WHEN c_ts IS NULL THEN micros"
        " WHEN n = 1 THEN micros"
        " WHEN n = 2 AND rk = 1 THEN micros div 2"
        " WHEN n = 2 THEN micros - micros div 2"
        " WHEN rk = 1 THEN (micros * 2) div 5"
        " WHEN rk = n THEN micros - (micros * 2) div 5"
        "                   - (n - 2) * ((micros div 5) div (n - 2))"
        " ELSE (micros div 5) div (n - 2) END"
    )
    return (
        ranked.select(position.alias("position_class"), credit.alias("credit"))
        .groupBy("position_class")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum("credit").alias("attributed_micros"),
            (F.sum("credit").cast("double") / F.lit(1000000.0)).alias(
                "attributed_value"
            ),
        )
    )


# --- cascade-delete (right-to-erasure) audit ----------------------------------

ERASE_MOD = 97  # deterministic ~1% customer selection

_CASCADE_SQL = f"""
WITH sel AS (SELECT c_custkey FROM customer WHERE c_custkey % {ERASE_MOD} = 0),
o AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM sel))
SELECT 'customer' AS table_name,
       CAST((SELECT count(*) FROM sel) AS BIGINT) AS n_rows_affected,
       CAST((SELECT count(*) FROM customer) AS BIGINT) AS n_rows_total,
       CAST((SELECT count(*) FROM sel) AS DOUBLE)
         / CAST((SELECT count(*) FROM customer) AS DOUBLE) AS affected_share
UNION ALL
SELECT 'orders',
       CAST((SELECT count(*) FROM o) AS BIGINT),
       CAST((SELECT count(*) FROM orders) AS BIGINT),
       CAST((SELECT count(*) FROM o) AS DOUBLE)
         / CAST((SELECT count(*) FROM orders) AS DOUBLE)
UNION ALL
SELECT 'lineitem',
       CAST((SELECT count(*) FROM lineitem
             WHERE l_orderkey IN (SELECT o_orderkey FROM o)) AS BIGINT),
       CAST((SELECT count(*) FROM lineitem) AS BIGINT),
       CAST((SELECT count(*) FROM lineitem
             WHERE l_orderkey IN (SELECT o_orderkey FROM o)) AS DOUBLE)
         / CAST((SELECT count(*) FROM lineitem) AS DOUBLE)
"""


@query("cascade_delete_audit", oracle=_CASCADE_SQL)
def cascade_delete_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure impact estimate: for a deterministic ~1%
    customer selection (custkey % {ERASE_MOD} = 0), how many rows each
    level of the FK cascade would delete (customer → orders →
    lineitem) and what share of each table that is — the dry-run a
    governance pipeline prints before executing a deletion batch.

    Scale shape: the selection is dimension-sized and broadcast into
    orders (semi join); the affected order-key set flows into lineitem
    as a co-partitioned semi join on the natural key (at 1% of orders
    it may still exceed broadcast thresholds — the shuffle semi join
    is the safe default, AQE upgrades it when small). Each level is
    one conditional-count aggregate; shares are int64 counts in shared
    double divisions.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    sel = cust.filter(F.col("c_custkey") % ERASE_MOD == 0).select("c_custkey")
    o_aff = orders.join(
        F.broadcast(sel), orders.o_custkey == sel.c_custkey, "left_semi"
    ).select("o_orderkey")
    li_aff = li.join(o_aff, li.l_orderkey == o_aff.o_orderkey, "left_semi")

    def level(name: str, affected: DataFrame, total: DataFrame) -> DataFrame:
        a = affected.agg(F.count(F.lit(1)).alias("n_rows_affected"))
        t = total.agg(F.count(F.lit(1)).alias("n_rows_total"))
        return a.crossJoin(t).select(
            F.lit(name).alias("table_name"),
            "n_rows_affected",
            "n_rows_total",
            (
                F.col("n_rows_affected").cast("double")
                / F.col("n_rows_total").cast("double")
            ).alias("affected_share"),
        )

    return (
        level("customer", sel, cust)
        .unionByName(level("orders", o_aff, orders))
        .unionByName(level("lineitem", li_aff, li))
    )


# --- declarative data-contract audit --------------------------------------------

# (table, column, check name, SQL predicate that must hold per row)
_CONTRACT_CHECKS = (
    ("orders", "o_totalprice", "positive", "o_totalprice > 0"),
    ("orders", "o_orderstatus", "enum_OFP", "o_orderstatus IN ('O','F','P')"),
    ("orders", "o_orderdate", "date_range",
     "o_orderdate >= TIMESTAMP '1990-01-01 00:00:00'"
     " AND o_orderdate < TIMESTAMP '2005-01-01 00:00:00'"),
    ("lineitem", "l_discount", "unit_interval",
     "l_discount >= 0 AND l_discount <= 1"),
    ("lineitem", "l_quantity", "positive", "l_quantity > 0"),
    ("lineitem", "l_returnflag", "enum_RAN", "l_returnflag IN ('R','A','N')"),
    ("customer", "c_acctbal", "bounded",
     "c_acctbal >= -1000 AND c_acctbal <= 10000"),
)


def _contract_sql(tbl: str, col: str, name: str, pred: str) -> str:
    return f"""
SELECT '{tbl}' AS table_name, '{col}' AS column_name, '{name}' AS check_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {pred} THEN 0 ELSE 1 END) AS BIGINT)
         AS n_violations,
       SUM(CASE WHEN {pred} THEN 0 ELSE 1 END) = 0 AS passed
FROM {tbl}
"""


_CONTRACT_AUDIT_SQL = "\nUNION ALL\n".join(
    _contract_sql(*c) for c in _CONTRACT_CHECKS
)


@query("data_contract_audit", oracle=_CONTRACT_AUDIT_SQL)
def data_contract_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-contract checks (range / enum / sign bounds per
    column) evaluated as conditional counts — the producer-consumer
    contract gate (dbt-style accepted_values / bounds tests) beside
    `dq_audit`'s structural checks. One conditional aggregate per
    check, NULL-safe by construction (a NULL predicate counts as a
    violation — contracts are CLOSED-world).

    Each table's checks share its scan at execution (grouped unions of
    one-row aggregates); nothing shuffles more than partial counts.
    """
    out: DataFrame | None = None
    for tbl, col, name, pred in _CONTRACT_CHECKS:
        df = table(spark, sf_dir, tbl)
        viol = F.sum(
            F.when(F.expr(pred), F.lit(0)).otherwise(F.lit(1))
        ).cast("bigint")
        row = df.agg(
            F.lit(tbl).alias("table_name"),
            F.lit(col).alias("column_name"),
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).alias("n_rows"),
            viol.alias("n_violations"),
            (viol == 0).alias("passed"),
        )
        out = row if out is None else out.unionByName(row)
    assert out is not None
    return out


# --- checksum bucket diff (anti-entropy repair plan) -----------------------------

DIFF_SIM_MOD = 997  # simulated replica loss: drop orderkey % MOD == 0

_CK_DIFF_SQL = f"""
WITH a AS (
  SELECT o_orderkey % 1024 AS bucket,
         count(*) AS bn,
         SUM(((CAST(o_orderkey AS BIGINT) % 2147483647 + 2147483647)
              % 2147483647 * 1000003
              + (CAST(o_custkey AS BIGINT) % 2147483647 + 2147483647)
                % 2147483647) % 2147483647) AS bsum
  FROM orders GROUP BY 1
),
b AS (
  SELECT o_orderkey % 1024 AS bucket,
         count(*) AS bn,
         SUM(((CAST(o_orderkey AS BIGINT) % 2147483647 + 2147483647)
              % 2147483647 * 1000003
              + (CAST(o_custkey AS BIGINT) % 2147483647 + 2147483647)
                % 2147483647) % 2147483647) AS bsum
  FROM orders WHERE o_orderkey % {DIFF_SIM_MOD} <> 0 GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(SUM(CASE WHEN b.bucket IS NULL
                      OR a.bn <> b.bn
                      OR a.bsum % 2147483647 <> b.bsum % 2147483647
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_buckets_differing,
       CAST(SUM(a.bn) - CAST(SUM(COALESCE(b.bn, 0)) AS BIGINT) AS BIGINT)
         AS n_rows_to_repair
FROM a LEFT JOIN b ON b.bucket = a.bucket
"""


@query("checksum_diff_buckets", oracle=_CK_DIFF_SQL)
def checksum_diff_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy repair plan: per-bucket (key % 1024) polynomial
    checksums of a table vs a simulated replica missing 1/{997} of its
    rows — how many buckets disagree, hence how much data a Merkle-
    style repair must actually move (buckets, not tables). The
    operational companion to `table_checksum`: the checksum detects,
    the bucket diff LOCALIZES.

    Both sides are 1024-group combinable aggregates; the diff is a
    1024-row join. At scale the replica side reads the actual second
    copy — the plan shape is identical.
    """
    orders = table(spark, sf_dir, "orders")
    sig = F.expr(
        "((CAST(o_orderkey AS BIGINT) % 2147483647 + 2147483647)"
        " % 2147483647 * 1000003"
        " + (CAST(o_custkey AS BIGINT) % 2147483647 + 2147483647)"
        " % 2147483647) % 2147483647"
    )

    def side(df: DataFrame) -> DataFrame:
        return (
            df.select((F.col("o_orderkey") % 1024).alias("bucket"), sig.alias("sig"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("bn"), F.sum("sig").alias("bsum"))
        )

    a = side(orders)
    b = side(orders.filter(F.col("o_orderkey") % DIFF_SIM_MOD != 0)).select(
        F.col("bucket").alias("b_bucket"),
        F.col("bn").alias("b_bn"),
        F.col("bsum").alias("b_bsum"),
    )
    differs = (
        F.col("b_bucket").isNull()
        | (F.col("bn") != F.col("b_bn"))
        | (F.col("bsum") % 2147483647 != F.col("b_bsum") % 2147483647)
    )
    return (
        a.join(b, F.col("b_bucket") == F.col("bucket"), "left")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(F.when(differs, 1).otherwise(0)).cast("bigint").alias(
                "n_buckets_differing"
            ),
            (F.sum("bn") - F.sum(F.coalesce("b_bn", F.lit(0))).cast("bigint"))
            .cast("bigint")
            .alias("n_rows_to_repair"),
        )
    )
