"""Skew-mitigation utilities (SURVEY §4 partitioning/shuffle row).

Salting decomposes a skewed-key aggregation into two phases: partial
aggregates over (key, salt) spread hot keys across the cluster, then a
final merge over key. Results are identical to the direct groupBy —
verified by the `salted_user_totals` query whose oracle is the PLAIN
aggregation. AQE's skew-join splitting covers joins; this covers
aggregations whose hot keys overwhelm a single partition at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(df: DataFrame, key: str, value: Column | str,
               n_salts: int = 16, out: str = "total") -> DataFrame:
    """Two-phase salted sum of `value` per `key`.

    Phase 1 groups on (key, crc32(random-free deterministic salt)) —
    the salt is derived from a row-unique expression so it needs no
    rand() (deterministic, retry-safe); phase 2 merges per key.
    """
    value = F.col(value) if isinstance(value, str) else value
    salt = (F.crc32(F.concat_ws("#", *[F.col(c).cast("string") for c in df.columns]))
            % n_salts).alias("_salt")
    partial = (
        df.select(F.col(key), value.alias("_v"), salt)
        .groupBy(key, "_salt")
        .agg(F.sum("_v").alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias(out))


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                n_salts: int = 16) -> DataFrame:
    """Skew-safe equi-join: replicate `dim` across n_salts salt values
    and join `fact` on (key, deterministic-salt), so a hot fact key
    spreads over n_salts tasks instead of landing on one.

    Results are identical to ``fact.join(dim, key)`` (every fact row
    still meets its dim row exactly once — in the one replica whose
    salt matches). Use when the dim is too big to broadcast AND fact
    keys are skewed; AQE's skew-join split covers the sort-merge case,
    but salting also works under bucketing/storage-partitioned joins
    where AQE cannot re-split. The fact salt is derived from the whole
    row (no rand()) so retries/speculation see the same salt.
    """
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    dim_rep = dim.select("*", salts)
    fact_salt = (
        F.crc32(F.concat_ws("#", *[F.col(c).cast("string") for c in fact.columns]))
        % n_salts
    ).cast("int").alias("_salt")
    return (
        fact.select("*", fact_salt)
        .join(dim_rep, [key, "_salt"])
        .drop("_salt")
    )
