"""Multi-dimensional data-skipping layout: z-order (Morton) keys.

Partitioning and bucketing (sources/parquet_sink.py) skip data on ONE
dimension; a z-order sort makes parquet row-group min/max stats
selective on TWO (or more) dimensions at once — the layout trick
behind Delta/Iceberg OPTIMIZE ZORDER. The z-value interleaves the bits
of the two key columns, so records close in (date, customer) space
land in the same row groups and a 2-D range predicate prunes most of
the file.

The bit interleave is exact integer math (32 shift-and-mask terms,
whole-stage codegen, no UDF) and the DuckDB oracle evaluates the same
expression — so the layout key itself is value-checked, and the
pruning payoff is demonstrated against real parquet footer stats in
tests/test_parquet_layouts.py.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_playground_spark.registry import query
from data_pipeline_playground_spark.tables import table

Z_BITS = 16
Z_EPOCH = "1992-01-01"  # day-number origin for the date dimension


def zorder_key(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of the low `bits` of x (even positions) and
    y (odd positions) — a static sum of disjoint-bit terms, so Catalyst
    codegens it as straight-line shifts/masks."""
    x = x.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    y = y.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    terms = [
        F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        for i in range(bits)
    ] + [
        F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a + b, terms).cast("long")


def normalize_dim(col: Column, mn: Column, mx: Column,
                  bits: int = Z_BITS) -> Column:
    """Scale a dimension to the full [0, 2^bits) range over its actual
    min/max (Delta's OPTIMIZE ZORDER does the same via range-partition
    ids) — without this, a narrow dimension wastes its high bits and
    the interleave degenerates to a single-column sort."""
    top = (1 << bits) - 1
    span = F.greatest(mx - mn, F.lit(1))
    return F.floor(((col - mn).cast("long") * top) / span).cast("long")


def _sql_zorder() -> str:
    top = (1 << Z_BITS) - 1
    tx = " + ".join(f"(((x >> {i}) & 1) << {2 * i})" for i in range(Z_BITS))
    ty = " + ".join(f"(((y >> {i}) & 1) << {2 * i + 1})" for i in range(Z_BITS))
    return f"""
WITH d AS (
  SELECT o_orderkey,
         CAST(datediff('day', DATE '{Z_EPOCH}', o_orderdate) AS BIGINT) AS day,
         CAST(o_custkey AS BIGINT) AS ck
  FROM orders
),
m AS (SELECT min(day) AS mnd, max(day) AS mxd,
             min(ck) AS mnc, max(ck) AS mxc FROM d),
b AS (
  SELECT o_orderkey,
         CAST(floor((day - mnd) * {top} / GREATEST(mxd - mnd, 1)) AS BIGINT) AS x,
         CAST(floor((ck - mnc) * {top} / GREATEST(mxc - mnc, 1)) AS BIGINT) AS y
  FROM d CROSS JOIN m
)
SELECT o_orderkey, CAST({tx} + {ty} AS BIGINT) AS zval FROM b
"""


@query("orders_zorder_keys", oracle=_sql_zorder())
def orders_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order key per order over (order date, customer): the sort key
    an OPTIMIZE ZORDER-style rewrite would cluster the table by. Both
    dimensions are range-normalized to the full bit width first (the
    1-row min/max aggregate broadcasts), then bit-interleaved — a
    narrow map plus one broadcast join; sorting by the key at write
    time is the layout side, demonstrated with real footer stats in
    tests/test_parquet_layouts.py."""
    orders = table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit(Z_EPOCH).cast("date")).cast("long")
    d = orders.select("o_orderkey", day.alias("day"),
                      F.col("o_custkey").cast("long").alias("ck"))
    m = d.agg(
        F.min("day").alias("mnd"), F.max("day").alias("mxd"),
        F.min("ck").alias("mnc"), F.max("ck").alias("mxc"),
    )
    b = d.crossJoin(F.broadcast(m))
    x = normalize_dim(F.col("day"), F.col("mnd"), F.col("mxd"))
    y = normalize_dim(F.col("ck"), F.col("mnc"), F.col("mxc"))
    return b.select("o_orderkey", zorder_key(x, y).alias("zval"))


def write_zordered(df: DataFrame, path: str, dim_x: Column,
                   dim_y: Column) -> None:
    """Write `df` clustered by z-order: range-normalize both
    dimensions over their observed min/max (1-row aggregate,
    broadcast), interleave, global-sort on the key, write. At 100 TB
    this is a per-partition (or OPTIMIZE-style background) rewrite;
    the range partitioner spreads the sort across executors and the
    min/max come from table stats instead of a scan.
    """
    d = df.withColumn("_dx", dim_x.cast("long")).withColumn(
        "_dy", dim_y.cast("long")
    )
    m = d.agg(
        F.min("_dx").alias("mnx"), F.max("_dx").alias("mxx"),
        F.min("_dy").alias("mny"), F.max("_dy").alias("mxy"),
    )
    z = zorder_key(
        normalize_dim(F.col("_dx"), F.col("mnx"), F.col("mxx")),
        normalize_dim(F.col("_dy"), F.col("mny"), F.col("mxy")),
    )
    (
        d.crossJoin(F.broadcast(m))
        .withColumn("_z", z)
        .orderBy("_z")
        .drop("_z", "_dx", "_dy", "mnx", "mxx", "mny", "mxy")
        .write.mode("overwrite")
        .parquet(path)
    )
