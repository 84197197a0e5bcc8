"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Fan out under-partitioned input before an expression-heavy
    per-row stage (md5 minhash/simhash folds, scaled-vector dot
    products — pure CPU).

    A scan of one small parquet file yields ONE partition, serializing
    the whole stage on one core; repartitioning to the session's
    default parallelism costs one narrow-ish shuffle of the input and
    buys full-cluster fan-out.  At 100 TB the scan already yields far
    more partitions than cores (`maxPartitionBytes`), so this is a
    no-op — the guard exists precisely so we never pay a gratuitous
    full-corpus shuffle at scale."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df
