"""Partitioned & bucketed parquet layout tests: assert the PLANS
(partition pruning, shuffle-free bucket join), not just the rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_playground_spark.sources.parquet_sink import (
    read_pruned,
    write_bucketed_table,
    write_partitioned,
)
from data_pipeline_playground_spark.tables import table


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_pruning_on_event_day(spark, sf_dir, tmp_path):
    ev = table(spark, sf_dir, "events").withColumn(
        "event_day", F.to_date("ts")
    )
    path = str(tmp_path / "events_by_day")
    write_partitioned(ev, path, "event_day")

    back = read_pruned(spark, path)
    one_day = back.filter(F.col("event_day") == "2024-01-02")

    # correctness: partitioned round-trip preserves the day's rows
    expected = ev.filter(F.to_date("ts") == "2024-01-02").count()
    assert one_day.count() == expected > 0

    # plan: the day filter must land in PartitionFilters on the scan,
    # not as a post-scan Filter over all partitions
    plan = _physical_plan(one_day)
    assert "PartitionFilters" in plan
    start = plan.index("PartitionFilters")
    assert "event_day" in plan[start : start + 200]


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    # warehouse dir is a static conf, set in session.py (tmp location)
    emb = table(spark, sf_dir, "embeddings")
    left = emb.select("vec_id", "label")
    right = emb.select(F.col("vec_id").alias("rid"), F.col("label").alias("rlabel"))
    write_bucketed_table(left, "emb_left", 8, "vec_id")
    write_bucketed_table(right, "emb_right", 8, "rid")

    l = spark.table("emb_left")
    r = spark.table("emb_right")
    # defeat broadcast so the join must use the bucketed layout
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = l.join(r, l.vec_id == r.rid)
        assert joined.count() == emb.count()
        plan = _physical_plan(joined)
        # co-bucketed sides: SortMergeJoin with NO Exchange on either side
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS emb_left")
        spark.sql("DROP TABLE IF EXISTS emb_right")


def test_zorder_layout_prunes_2d_predicates(spark, sf_dir, tmp_path):
    """Footer-stats data skipping: for a 2-D (date window × customer
    range) predicate, the z-ordered layout must leave strictly fewer
    surviving files than the single-dimension date-sorted layout —
    that locality is the entire point of the interleaved key."""
    import pyarrow.parquet as pq

    from data_pipeline_playground_spark.queries.layout import (
        Z_EPOCH,
        write_zordered,
    )

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("o_orderdate")
    )
    day = F.datediff(F.col("o_orderdate"), F.lit(Z_EPOCH).cast("date"))

    # ~30 files for sf0.001's 1500 orders so per-file stats are fine-grained
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "25")
    try:
        date_path = str(tmp_path / "orders_by_date")
        (
            orders.orderBy("o_orderdate")
            .write.mode("overwrite")
            .parquet(date_path)
        )
        z_path = str(tmp_path / "orders_zorder")
        write_zordered(orders, z_path, day, F.col("o_custkey"))
        # write_zordered range-normalizes both dimensions internally
    finally:
        spark.conf.unset("spark.sql.files.maxRecordsPerFile")

    # 2-D box: ~10% of the date span × ~10% of the customer range
    import datetime as dt

    lo_d, hi_d = dt.date(1996, 1, 1), dt.date(1996, 12, 31)
    lo_c, hi_c = 30, 44  # ~10% of sf0.001's 150 customers

    def surviving_files(path: str) -> tuple[int, int]:
        import glob
        import os

        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        assert len(files) >= 10, "need fine-grained files for the demo"
        alive = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            stats = {}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    s = col.statistics
                    if s is None:
                        continue
                    mn, mx = stats.get(name, (s.min, s.max))
                    stats[name] = (min(mn, s.min), max(mx, s.max))
            d_mn, d_mx = stats["o_orderdate"]
            c_mn, c_mx = stats["o_custkey"]
            if d_mx >= lo_d and d_mn <= hi_d and c_mx >= lo_c and c_mn <= hi_c:
                alive += 1
        return alive, len(files)

    date_alive, date_total = surviving_files(date_path)
    z_alive, z_total = surviving_files(z_path)
    # same predicate selects the same ROWS either way…
    rows = orders.filter(
        (F.col("o_orderdate") >= F.lit(lo_d))
        & (F.col("o_orderdate") <= F.lit(hi_d))
        & (F.col("o_custkey") >= lo_c)
        & (F.col("o_custkey") <= hi_c)
    ).count()
    assert rows > 0
    # …but the z-layout touches strictly fewer files
    assert z_alive < date_alive, (
        f"z-order did not prune: {z_alive}/{z_total} vs date-sort "
        f"{date_alive}/{date_total}"
    )
