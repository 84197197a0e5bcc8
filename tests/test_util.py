"""Contracts for operators/util.py — the fan-out guard's conf parsing
and file-size probing (ADVICE r4)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from firewatch_spark.operators.util import _max_partition_bytes, ensure_parallelism

_MB = 1024 * 1024


def _with_conf(spark, value):
    prior = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", value)
    try:
        return _max_partition_bytes(spark.range(1))
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prior)


def test_max_partition_bytes_parses_spark_byte_strings(spark):
    # the digits-only parse read '128m' as 128 bytes, disabling the
    # guard under suffix notation (ADVICE r4)
    assert _with_conf(spark, "128m") == 128 * _MB
    assert _with_conf(spark, "128MB") == 128 * _MB
    assert _with_conf(spark, "1g") == 1024 * _MB
    assert _with_conf(spark, "512k") == 512 * 1024
    assert _with_conf(spark, str(64 * _MB)) == 64 * _MB
    assert _with_conf(spark, "64b") == 64
    # (an unparseable value falls back to the 128 MiB default inside
    # _max_partition_bytes; Spark itself rejects it at conf.set time,
    # so that branch is only reachable through future conf renames)


def test_ensure_parallelism_handles_encoded_paths(spark, tmp_path):
    # a space in the directory name percent-encodes in inputFiles();
    # the guard must still stat the file and fan out (ADVICE r4)
    d = tmp_path / "dir with spaces"
    d.mkdir()
    spark.range(0, 1000).coalesce(1).write.parquet(str(d / "t.parquet"))
    df = spark.read.parquet(str(d / "t.parquet"))
    assert any("%20" in f for f in df.inputFiles())
    out = ensure_parallelism(df)
    target = max(2, spark.sparkContext.defaultParallelism)
    assert out.rdd.getNumPartitions() == target


def test_ensure_parallelism_noop_on_many_files(spark, tmp_path):
    path = str(tmp_path / "many")
    spark.range(0, 1000).repartition(8).write.parquet(path)
    df = spark.read.parquet(path)
    # enough scan splits already: the guard must not add a shuffle
    assert ensure_parallelism(df) is df
