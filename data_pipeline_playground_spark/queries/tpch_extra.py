"""Extra TPC-H-shaped relational queries (SURVEY §2 J/A/T widening).

The reference's relational surface (join-enrich → aggregate → rank,
reference newsapi.py:55-79 / cluster.py:61-65) maps onto the classic
TPC-H decision-support shapes; this module adds the shapes round 2 did
not yet cover: conditional-share aggregates (Q8/Q14), counts-of-counts
(Q13), correlated-average filters (Q17), group-HAVING semi-joins back
to the fact (Q18), equals-scalar-max selection (Q15), anti-join with a
scalar broadcast threshold (Q22), and argmax-per-group over a fact
join (Q2-ish). Round 6 completes the classic 22: Q21 (sole-late
blame), Q6 (pure-pushdown global sum), Q12 (late-priority split),
Q16 (distinct-supplier variety) and Q20 (dominant-supplier
correlated-agg chain). The driver schema has no
partsupp/shipmode/commitdate, so Q9/Q12/Q16/Q20/Q21 are adapted where
noted (cost proxy = discounted retail price, lineitem pairs for
partsupp, lateness = shipdate − orderdate); each docstring records
the deviation.

Scale notes (SCALE.md §Relational): every query keeps `lineitem` as
the probe side with dims broadcast, so the only wide shuffles are the
declared groupBys on fact keys; scalar thresholds travel as one-row
broadcast joins, never `.collect()` round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_playground_spark.registry import query
from data_pipeline_playground_spark.tables import table


def _dec(col, prec: int = 18, scale: int = 2):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def _revenue():
    """Exact-decimal l_extendedprice * (1 - l_discount)."""
    return _dec("l_extendedprice") * (1 - _dec("l_discount", 4, 2))


# --- Q14: conditional-share aggregate ---------------------------------------

_PROMO_REVENUE_SQL = """
SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
       CAST(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))
                 ELSE 0 END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS promo_pct,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY 1
"""


@query("promo_revenue_monthly", oracle=_PROMO_REVENUE_SQL)
def promo_revenue_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share per ship month of 1996.

    Plan: part is broadcast (dim ≪ fact at every SF), the date filter
    is pushed to the lineitem scan, and the conditional share is one
    map-side-combinable aggregate — a single shuffle on ship_month.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    rev = _revenue()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,2)"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .join(F.broadcast(part.select("p_partkey", "p_type")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.to_date(F.date_trunc("month", "l_shipdate")).alias("ship_month"))
        .agg(
            (
                # multiply in DECIMAL (as the oracle's literal 100.0 does)
                # and only then go to double, so both engines round once
                (F.sum(promo) * F.lit("100.0").cast("decimal(4,1)")).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- Q13: counts-of-counts distribution -------------------------------------

_CUSTOMER_DISTRIBUTION_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""


@query("customer_distribution", oracle=_CUSTOMER_DISTRIBUTION_SQL)
def customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of non-urgent order counts per
    customer, including zero-order customers via the left join.

    Plan: one shuffle on c_custkey (join + first groupBy share the
    key, so Catalyst reuses the exchange), then a near-trivial second
    aggregate over at most a few hundred distinct counts.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        cust.select("c_custkey")
        .join(orders.select("o_custkey", "o_orderkey"), F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# --- Q17: correlated per-group average filter -------------------------------

_SMALL_QTY_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       count(*) AS n_lines
FROM lineitem l
JOIN (SELECT l_partkey AS a_partkey,
             SUM(l_quantity) AS qty_sum, count(*) AS qty_cnt
      FROM lineitem GROUP BY l_partkey) a
  ON l.l_partkey = a.a_partkey
WHERE 2 * l.l_quantity * a.qty_cnt < a.qty_sum
"""


@query("small_qty_part_revenue", oracle=_SMALL_QTY_SQL)
def small_qty_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lines whose quantity is below
    half the part's average quantity (correlated-average filter).

    Plan: the per-part average is a partial-aggregated groupBy on
    l_partkey; the self-join re-shuffles lineitem on the same key, so
    the exchange is reused. No decorrelation UDF — the correlated
    subquery is expressed as aggregate + equi-join, which is exactly
    how Catalyst decorrelates it anyway; at 100 TB the per-part
    aggregate is tiny relative to the fact and could be broadcast.
    """
    li = table(spark, sf_dir, "lineitem")
    # threshold as the shared multiply tree 2·qty·cnt < Σqty, NOT
    # qty < 0.5·avg: quantities are whole numbers, so both sides of
    # the product compare are exact in double on both engines at ANY
    # group size — avg's divide would re-introduce a rounding whose
    # boundary behavior depends on the engine's summation order once
    # sums stop being exactly representable (ADVICE r3)
    avg_qty = (
        li.groupBy(F.col("l_partkey").alias("a_partkey"))
        .agg(F.sum("l_quantity").alias("qty_sum"),
             F.count(F.lit(1)).alias("qty_cnt"))
    )
    return (
        li.join(avg_qty, F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.lit(2) * F.col("l_quantity") * F.col("qty_cnt") < F.col("qty_sum"))
        .agg(
            F.sum(_dec("l_extendedprice")).cast("double").alias("total_price"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- Q18: group-HAVING semi-join back to the fact ---------------------------

_LARGE_VOLUME_SQL = """
SELECT c.c_name, o.o_orderkey,
       CAST(o.o_orderdate AS DATE) AS order_day,
       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
       t.total_qty
FROM orders o
JOIN (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300) t
  ON o.o_orderkey = t.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""


@query("large_volume_orders", oracle=_LARGE_VOLUME_SQL)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds 300,
    enriched with the ordering customer.

    Plan: HAVING runs map-side-combined on l_orderkey before any join,
    so the survivors joined to orders are a tiny filtered set; customer
    is broadcast. The qty aggregate output is orders-sized at worst but
    post-HAVING it is a sliver — AQE converts the orders join to
    broadcast at runtime when it fits.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("_qty"))
        .filter(F.col("_qty") > 300)
        .select("l_orderkey", F.col("_qty").cast("double").alias("total_qty"))
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_name")), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_day"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
    )


# --- Q8: market-share conditional aggregate over a dim chain ----------------

_MARKET_SHARE_SQL = """
SELECT CAST(date_trunc('year', o.o_orderdate) AS DATE) AS order_year,
       CAST(SUM(CASE WHEN sn.n_name = 'NATION_0'
                 THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(4,2))) ELSE 0 END) AS DOUBLE)
       / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS mkt_share
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
JOIN region r   ON cn.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
GROUP BY 1
"""


@query("market_share", oracle=_MARKET_SHARE_SQL)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_0 suppliers' share of revenue sold into
    the ASIA customer region, per order year.

    Plan: the entire dim chain (customer→nation→region, supplier→
    nation) broadcasts, so lineitem⋈orders is the only wide shuffle;
    the region filter prunes customers before broadcast. The share is
    a single conditional aggregate — no second pass.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    supp = table(spark, sf_dir, "supplier")

    asia_cust = (
        cust.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp_nation = supp.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")

    rev = _revenue()
    nat0 = F.when(F.col("supp_nation") == "NATION_0", rev).otherwise(F.lit(0).cast("decimal(18,2)"))
    return (
        li.join(orders.select("o_orderkey", "o_custkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(asia_cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.to_date(F.date_trunc("year", "o_orderdate")).alias("order_year"))
        .agg((F.sum(nat0).cast("double") / F.sum(rev).cast("double")).alias("mkt_share"))
    )


# --- Q9 adapted: profit by supplier nation × year ---------------------------

_NATION_PROFIT_SQL = """
SELECT sn.n_name AS supp_nation,
       CAST(date_trunc('year', o.o_orderdate) AS DATE) AS order_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                - CAST(p.p_retailprice AS DECIMAL(18,2))
                  * CAST(l.l_quantity AS DECIMAL(18,2))
                  * CAST(0.6 AS DECIMAL(4,2))) AS DOUBLE) AS profit
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
GROUP BY 1, 2
"""


@query("nation_profit", oracle=_NATION_PROFIT_SQL)
def nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape, adapted: profit per supplier nation × order
    year. The driver schema has no partsupp, so unit cost is proxied
    as 0.6 × p_retailprice (documented deviation; the join/agg shape —
    fact × 4 dims → two-level group — is what the query exercises).

    Plan: part/supplier/nation broadcast; lineitem⋈orders is the one
    wide shuffle; decimal-exact arithmetic end-to-end.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    part = table(spark, sf_dir, "part")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    profit = _revenue() - _dec("p_retailprice") * _dec("l_quantity") * _dec(F.lit(0.6), 4, 2)
    return (
        li.join(orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part.select("p_partkey", "p_retailprice")), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.to_date(F.date_trunc("year", "o_orderdate")).alias("order_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


# --- Q22 adapted: anti-join with a broadcast scalar threshold ---------------

_IDLE_CUSTOMERS_SQL = """
WITH thresh AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS bal_sum, count(*) AS bal_cnt
  FROM customer WHERE c_acctbal > 0
), recent AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= (SELECT max(o_orderdate) FROM orders) - INTERVAL 180 DAY
)
SELECT c.c_mktsegment,
       count(*) AS n_custs,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer c, thresh
WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * thresh.bal_cnt > thresh.bal_sum
  AND c.c_custkey NOT IN (SELECT o_custkey FROM recent)
GROUP BY c.c_mktsegment
"""


@query("idle_customers", oracle=_IDLE_CUSTOMERS_SQL)
def idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape, adapted to the schema (no phone codes):
    above-average-balance customers with no order in the last 180
    days, rolled up by market segment.

    Plan: the scalar average travels as a one-row broadcast cross
    join (never a driver collect); the NOT-IN is a left_anti join
    against the distinct recent-order keys, which AQE broadcasts.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    # above-average filter in EXACT decimal (bal·cnt > Σbal): acctbal
    # doubles are not all exact cents, so avg(double) depends on each
    # engine's summation order; the cents-snapped decimal sum is exact
    # and order-free, making the threshold compare bit-identical by
    # construction (ADVICE r3, the user_value_trend discipline)
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal")).alias("bal_sum"),
        F.count(F.lit(1)).alias("bal_cnt"),
    )
    mx = orders.agg(F.max("o_orderdate").alias("_mx"))
    recent = (
        orders.join(F.broadcast(mx))
        .filter(F.col("o_orderdate") >= F.col("_mx") - F.expr("INTERVAL 180 DAYS"))
        .select("o_custkey")
        .distinct()
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(_dec("c_acctbal") * F.col("bal_cnt") > F.col("bal_sum"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_bal"),
        )
    )


# --- Q15: equals-scalar-max selection ---------------------------------------

_TOP_SUPPLIER_SQL = """
WITH srev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, srev.total_revenue
FROM supplier s JOIN srev ON s.s_suppkey = srev.l_suppkey
WHERE srev.total_revenue = (SELECT max(total_revenue) FROM srev)
"""


@query("top_supplier_quarter", oracle=_TOP_SUPPLIER_SQL)
def top_supplier_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) whose Q1-1996 revenue equals the
    maximum — ties kept, unlike a LIMIT 1 top-k.

    Plan: one groupBy on l_suppkey with the date filter pushed to the
    scan; the max travels back as a one-row broadcast join (the
    classic equals-max decorrelation), supplier dim broadcast.
    """
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    srev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_revenue()).cast("double").alias("total_revenue"))
    )
    mx = srev.agg(F.max("total_revenue").alias("_mx"))
    return (
        srev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --- Q10: returned-item revenue report --------------------------------------

_RETURNED_ITEM_SQL = """
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@query("returned_item_report", oracle=_RETURNED_ITEM_SQL)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by lost revenue on returned
    items in 1996-Q4, with nation enrichment.

    Plan: returnflag + date filters push to the scans; customer and
    nation broadcast; one shuffle for the groupBy; the top-20 is a
    TakeOrderedAndProject (no global sort materialization), tie-broken
    by c_custkey for determinism.
    """
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_name", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --- Q2-ish: argmax supplier per part over the fact -------------------------

_PART_TOP_SUPPLIER_SQL = """
SELECT p_partkey, s_suppkey, s_name, total_qty
FROM (
  SELECT l.l_partkey AS p_partkey, s.s_suppkey, s.s_name,
         CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
         row_number() OVER (PARTITION BY l.l_partkey
                            ORDER BY SUM(CAST(l.l_quantity AS DECIMAL(18,2))) DESC,
                                     s.s_suppkey) AS rn
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY l.l_partkey, s.s_suppkey, s.s_name
)
WHERE rn = 1
"""


@query("part_top_supplier", oracle=_PART_TOP_SUPPLIER_SQL)
def part_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (argmin/argmax per group): for every part, the
    supplier that shipped the largest total quantity, suppkey
    tie-break. The inverse grouping of `top_part_per_supplier` —
    partition count is parts-sized, so the rank window runs on the
    already-aggregated (part, supplier) rollup, never on raw lines.
    """
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    per = (
        li.join(F.broadcast(supp.select("s_suppkey", "s_name")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"), "s_suppkey", "s_name")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
    )
    w = Window.partitionBy("p_partkey").orderBy(F.desc("total_qty"), F.asc("s_suppkey"))
    return (
        per.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "s_suppkey", "s_name", "total_qty")
    )


# --- Q4-ish: EXISTS semi-join on priority classes ---------------------------

_PRIORITY_EXISTS_SQL = """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
  AND o.o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o.o_orderpriority
"""


@query("priority_order_count", oracle=_PRIORITY_EXISTS_SQL)
def priority_order_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in 1996-Q3 with at least one returned
    line, counted per priority — EXISTS as a left_semi join.

    Plan: date filter prunes orders before the semi-join; the
    returnflag filter prunes lineitem at the scan; semi-join keeps
    one shuffle on orderkey and never widens rows.
    """
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(li.select("l_orderkey"), F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --- Q19-ish: disjunctive bracket predicate ---------------------------------

_BRACKET_REVENUE_SQL = """
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 10 AND 35)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity BETWEEN 25 AND 50)
"""


@query("bracket_revenue", oracle=_BRACKET_REVENUE_SQL)
def bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of brand/size/quantity brackets —
    the predicate Catalyst must split into join-side pushdowns.

    Plan: the p_brand IN (...) and l_quantity range hulls push below
    the join; part broadcasts; the OR-of-ANDs evaluates post-join in
    one codegen stage. (Brand names follow the generator's Brand#n vocabulary.)
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
                     F.col("l_partkey") == F.col("p_partkey"))
    q = F.col("l_quantity")
    sz = F.col("p_size")
    pred = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & sz.between(10, 30) & q.between(10, 35))
        | ((F.col("p_brand") == "Brand#3") & sz.between(20, 50) & q.between(25, 50))
    )
    return joined.filter(pred).agg(
        F.sum(_revenue()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --- per-group exact correlation ---------------------------------------------

_DISCOUNT_CORR_SQL = """
WITH s AS (
  SELECT p.p_brand,
         count(*) AS n_lines,
         CAST(SUM(CAST(l.l_discount AS DECIMAL(8,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l.l_discount AS DECIMAL(8,2))
                  * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l.l_discount AS DECIMAL(8,2))
                  * CAST(l.l_discount AS DECIMAL(8,2))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))
                  * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS syy
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand
)
SELECT p_brand, n_lines,
       ((n_lines * sxy) - (sx * sy))
         / (sqrt((n_lines * sxx) - (sx * sx))
            * sqrt((n_lines * syy) - (sy * sy))) AS discount_qty_corr
FROM s
"""


@query("discount_quantity_corr", oracle=_DISCOUNT_CORR_SQL)
def discount_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pearson correlation between discount and quantity —
    does discounting move volume? The pricing-elasticity screen.

    Same determinism-by-construction discipline as user_value_trend:
    the five sufficient statistics are exact decimal sums (order-free,
    map-side combinable), combined in one shared double expression
    tree. sqrt is an IEEE 754 correctly-rounded required operation, so
    unlike ln/exp it is safe across engines — no rounding anywhere.
    Part broadcasts; one shuffle on p_brand.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    xd = F.col("l_discount").cast("decimal(8,2)")
    yd = F.col("l_quantity").cast("decimal(18,2)")
    s = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(xd).cast("double").alias("sx"),
            F.sum(yd).cast("double").alias("sy"),
            F.sum(xd * yd).cast("double").alias("sxy"),
            F.sum(xd * xd).cast("double").alias("sxx"),
            F.sum(yd * yd).cast("double").alias("syy"),
        )
    )
    n, sx, sy = F.col("n_lines"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    corr = ((n * sxy) - (sx * sy)) / (
        F.sqrt((n * sxx) - (sx * sx)) * F.sqrt((n * syy) - (sy * sy))
    )
    return s.select("p_brand", "n_lines", corr.alias("discount_qty_corr"))


# --- Q21 (adapted): sole-late-supplier blame --------------------------------

LATE_DAYS = 60  # no commitdate/receiptdate in this schema — a line is
# "late" iff it shipped more than LATE_DAYS after its order was placed

_SOLE_LATE_SQL = f"""
SELECT s_name, count(DISTINCT l1.l_orderkey) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY)
GROUP BY s_name
"""


@query("supplier_sole_late", oracle=_SOLE_LATE_SQL)
def supplier_sole_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting), adapted:
    lateness = shipped > LATE_DAYS after order date (schema has no
    commit/receipt dates), orders restricted to status 'F'; numwait =
    distinct orders where the supplier was the ONLY late one in a
    multi-supplier order.

    Spark-first reformulation: the textbook EXISTS + NOT-EXISTS pair
    is two extra self-joins of the fact table; since BOTH predicates
    are functions of the line's own order group, they collapse into
    aggregation over the already-joined rows — n_supp >= 2 replaces
    EXISTS, n_late_supp == 1 replaces NOT EXISTS, and max(late
    supplier) is well-defined exactly on the surviving rows. The
    distinct-supplier counts are a MANUAL two-level aggregate
    (per-(order, supplier) then per-order) rather than mixed
    countDistincts, which would plan as a gid-Expand — 3× the row
    stream and an extra exchange; both manual levels shuffle only
    combined rows (~one per order-supplier pair). The supplier dim
    broadcasts. The oracle keeps the classic correlated-subquery
    form, so both sides derive the answer independently.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    flagged = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).withColumn(
        "is_late",
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS"),
    )
    per_supp = flagged.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("supp_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.col("supp_late").cast("int")).alias("n_late_supp"),
        F.max(
            F.when(F.col("supp_late"), F.col("l_suppkey"))
        ).alias("late_supp"),
    )
    blame = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    )
    return (
        blame.groupBy("late_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(sup), F.col("late_supp") == F.col("s_suppkey"))
        .select("s_name", "numwait")
    )


# --- Q6: single-scan forecast-revenue aggregate ------------------------------

_FORECAST_REVENUE_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue_delta,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("forecast_revenue_change", oracle=_FORECAST_REVENUE_SQL)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue that would vanish if small low-discount
    orders were dropped — a pure scan→filter→global-sum plan, the
    simplest shape in the suite (here so all 22 Q-shapes are covered).

    Plan: every predicate (date range, discount band, quantity) is
    parquet-pushable; the sum is an exact decimal with map-side
    partials collapsing to ONE row per partition before the single
    final-agg exchange. The double literals 0.05/0.07/24 parse to the
    same IEEE values in both engines, so the band edges agree bitwise.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount", 4, 2))
            .cast("double")
            .alias("revenue_delta"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- Q12 adapted: late-shipment priority split -------------------------------

# The driver schema has no l_shipmode/l_commitdate/l_receiptdate, so the
# Q12 analog groups by l_returnflag (the per-line categorical that exists)
# and defines "late" as shipping more than LATE_DAYS after the order date
# (same lateness proxy as the Q21 adaptation above).

_LATE_PRIORITY_SQL = f"""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAYS
GROUP BY l_returnflag
"""


@query("late_priority_lines", oracle=_LATE_PRIORITY_SQL)
def late_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: did late shipping hit high-priority orders? —
    the two-way conditional count over a fact⋈fact key join.

    Adaptation (recorded per the module header): no shipmode/commit/
    receipt dates in the driver schema, so the category is
    l_returnflag and "late" is shipdate > orderdate + 60 days.

    Plan: the 1996 ship-date filter is pushed to the lineitem scan
    BEFORE the join (Catalyst pushes it below); the orderkey join is
    the one unavoidable fact⋈fact shuffle of the Q12 shape (AQE picks
    the strategy at runtime), and the priority split is a map-side-
    combinable CASE count collapsing to |returnflag| rows.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(high.cast("bigint")).alias("high_line_count"),
            F.sum((~high).cast("bigint")).alias("low_line_count"),
        )
    )


# --- Q16 adapted: supplier variety per part attribute ------------------------

# No partsupp table: the (part, supplier) relation observed in lineitem
# stands in for it. The Q16 "complaint suppliers" exclusion maps to
# suppliers with negative account balance (the only supplier-side
# disqualifier in the schema).

_SUPPLIER_VARIETY_SQL = """
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
"""


@query("part_supplier_variety", oracle=_SUPPLIER_VARIETY_SQL)
def part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many qualified suppliers can deliver each
    (brand, size) bucket — distinct-pair dedup, a NOT-IN exclusion
    list, and a COUNT(DISTINCT) rollup.

    Adaptation (module header): lineitem's observed (partkey, suppkey)
    pairs stand in for partsupp; "complaint" suppliers are those with
    negative s_acctbal.

    Plan: the pair-dedup is ONE combinable distinct on (partkey,
    suppkey) — the fact collapses before anything joins; part and the
    exclusion list are broadcast (dim-sized), the NOT-IN is a
    left_anti (no nulls in s_suppkey, so NOT IN = anti), and the final
    COUNT(DISTINCT suppkey) re-shuffles only the deduped pair table.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    sup = table(spark, sf_dir, "supplier")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    bad = sup.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        pairs.join(F.broadcast(bad), pairs["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(
            F.broadcast(
                part.filter(
                    (F.col("p_type") != "PROMO")
                    & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
                ).select("p_partkey", "p_brand", "p_size")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# --- Q20 adapted: dominant suppliers of a part family ------------------------

# No partsupp.ps_availqty: Q20's "available quantity exceeds half the
# shipped quantity" becomes "this supplier shipped more than half of the
# part's total 1996 volume" — the same correlated-aggregate semi-join
# chain, expressed over what the schema records.

_DOMINANT_SUPPLIER_SQL = """
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS supp_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_partkey, l_suppkey
),
dominant AS (
  SELECT l_partkey, l_suppkey
  FROM (SELECT l_partkey, l_suppkey, supp_qty,
               SUM(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
        FROM shipped)
  WHERE supp_qty * 2 > part_qty
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
)
SELECT s_suppkey, s_name, count(*) AS n_dominated_parts
FROM dominant JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
"""


@query("dominant_part_suppliers", oracle=_DOMINANT_SUPPLIER_SQL)
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who dominate supply of a part family
    — the correlated-aggregate semi-join chain (inner agg per
    (part, supplier), compared against a per-part total, semi-joined
    up to supplier).

    Adaptation (module header): no ps_availqty, so dominance =
    "shipped more than half the part's total 1996 volume"; the part
    family filter is a name prefix.

    Plan: ONE shuffle on (partkey, suppkey) builds the inner
    aggregate; the per-part total comes from a window over that
    already-aggregated (small) frame — it re-shuffles only aggregate
    rows, never the fact. The `small%` prefix filter broadcasts as a
    dim semi-join, and supp_qty*2 > part_qty stays exact decimal
    (never a 0.5 double). Supplier is broadcast for the final name
    join.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("supp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        shipped.withColumn("part_qty", F.sum("supp_qty").over(w))
        .filter(F.col("supp_qty") * 2 > F.col("part_qty"))
        .join(
            F.broadcast(
                part.filter(F.col("p_name").like("small%")).select("p_partkey")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
    )
    return (
        dominant.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_dominated_parts"))
    )


# --- SPC p-chart on late shipments ------------------------------------------

PCHART_LATE_DAYS = 100  # a line is 'late' if shipped > N days after order


def _pchart_sql() -> str:
    return f"""
WITH j AS (
  SELECT date_trunc('month', o.o_orderdate) AS month,
         CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                             CAST(l.l_shipdate AS DATE))
                   > {PCHART_LATE_DAYS} THEN 1 ELSE 0 END AS late
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
m AS (
  SELECT CAST(month AS DATE) AS month,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(late) AS BIGINT) AS n_late
  FROM j GROUP BY month
),
pool AS (
  SELECT CAST(sum(n_late) AS BIGINT) AS tl, CAST(sum(n_lines) AS BIGINT) AS tn
  FROM m
)
SELECT m.month, m.n_lines, m.n_late,
       CAST(m.n_late AS DOUBLE) / CAST(m.n_lines AS DOUBLE) AS p,
       CAST(pool.tl AS DOUBLE) / CAST(pool.tn AS DOUBLE) AS p_bar,
       CAST(pool.tl AS DOUBLE) / CAST(pool.tn AS DOUBLE)
         + 3.0 * sqrt((CAST(pool.tl AS DOUBLE) / CAST(pool.tn AS DOUBLE))
                      * (1.0 - CAST(pool.tl AS DOUBLE)
                         / CAST(pool.tn AS DOUBLE))
                      / CAST(m.n_lines AS DOUBLE)) AS ucl,
       CAST(m.n_late AS DOUBLE) / CAST(m.n_lines AS DOUBLE)
         > CAST(pool.tl AS DOUBLE) / CAST(pool.tn AS DOUBLE)
           + 3.0 * sqrt((CAST(pool.tl AS DOUBLE) / CAST(pool.tn AS DOUBLE))
                        * (1.0 - CAST(pool.tl AS DOUBLE)
                           / CAST(pool.tn AS DOUBLE))
                        / CAST(m.n_lines AS DOUBLE)) AS out_of_control
FROM m CROSS JOIN pool
"""


@query("late_shipment_pchart", oracle=_pchart_sql())
def late_shipment_pchart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart p-chart (statistical process control) on the monthly
    late-shipment proportion: per month, the fraction of lineitems
    shipped more than PCHART_LATE_DAYS after the order, the pooled
    center line p̄, the 3σ upper control limit p̄+3√(p̄(1−p̄)/n), and
    the out-of-control flag — the ops-monitoring primitive behind
    'did this month's lateness exceed common-cause variation'.

    Determinism: counts are exact ints; every proportion / limit /
    flag is one shared double expression (sqrt correctly rounded).

    Plan: lineitem joins orders on the order key (both fact-sized:
    a co-partitioned shuffle join, column-pruned to 2 columns each —
    never a broadcast), one month-keyed aggregate, one broadcast
    1-row pooled scalar — two combinable aggregates after the join.
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = (
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        > PCHART_LATE_DAYS
    ).cast("int")
    m = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.to_date(F.date_trunc("month", "o_orderdate")).alias("month"),
            late.alias("late"),
        )
        .groupBy("month")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum("late").cast("bigint").alias("n_late"),
        )
    )
    pool = m.agg(
        F.sum("n_late").cast("bigint").alias("tl"),
        F.sum("n_lines").cast("bigint").alias("tn"),
    )
    D = lambda c: F.col(c).cast("double")  # noqa: E731
    p = D("n_late") / D("n_lines")
    pbar = D("tl") / D("tn")
    ucl = pbar + F.lit(3.0) * F.sqrt(
        pbar * (F.lit(1.0) - pbar) / D("n_lines")
    )
    return m.crossJoin(F.broadcast(pool)).select(
        "month",
        "n_lines",
        "n_late",
        p.alias("p"),
        pbar.alias("p_bar"),
        ucl.alias("ucl"),
        (p > ucl).alias("out_of_control"),
    )
