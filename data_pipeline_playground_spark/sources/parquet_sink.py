"""Partitioned / bucketed parquet sinks — the table layouts the 100 TB
design leans on (SCALE.md: partition pruning for time-sliced scans,
bucket-local joins for ANN and co-located facts).

Nothing in the reference writes columnar output (its only sink is JSON,
S7); these are driver-mandated scale extensions. Tests drive both
layouts against tmp dirs and assert the pruning/join plans, not just
the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, *partition_cols: str) -> None:
    """Hive-style partitioned parquet layout: one directory level per
    partition column. A reader filtering on a partition column scans
    only the matching directories (partition pruning — check
    ``PartitionFilters`` in the scan node), which at 100 TB is the
    difference between touching one day and touching three years.
    """
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_pruned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed_table(df: DataFrame, table_name: str, n_buckets: int,
                         *bucket_cols: str, sort_cols: tuple[str, ...] = ()) -> None:
    """Bucketed managed table (saveAsTable — bucketing metadata lives in
    the catalog). Two frames bucketed the same way join WITHOUT a
    shuffle: each task reads matching bucket files from both sides.
    This is the 'write embeddings bucketed by cell' ANN plan from
    SCALE.md made concrete.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table_name)
