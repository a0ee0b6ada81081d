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
