"""Contract tests for the Spark-written replay-chunk fixture writer
(streaming/replay.py) — the VERDICT-r4 #1 replacement for the driver
``toPandas()`` slicing."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from firewatch_spark.streaming.replay import write_replay_chunks


def _read_chunk(spark, path):
    return spark.read.parquet(path)


def test_chunks_partition_input_by_increasing_ranges(spark, tmp_path):
    df = spark.range(0, 1000).select(
        (F.col("id") % 7).cast("string").alias("video_id"),
        F.col("id").alias("frame_number"),
    )
    tmp = str(tmp_path / "chunks")
    paths = write_replay_chunks(df, tmp, n_chunks=3)
    assert [os.path.basename(p) for p in paths] == [
        "chunk_000.parquet",
        "chunk_001.parquet",
        "chunk_002.parquet",
    ]
    # union of chunks == input, exactly once
    union = spark.read.parquet(*paths)
    assert union.count() == 1000
    assert union.select("frame_number").distinct().count() == 1000
    # ranges non-overlapping and increasing in replay (mtime) order
    prev_max = None
    prev_mtime = None
    for p in paths:
        stats = _read_chunk(spark, p).agg(
            F.min("frame_number").alias("lo"), F.max("frame_number").alias("hi")
        ).first()
        if prev_max is not None:
            assert stats["lo"] > prev_max
        prev_max = stats["hi"]
        mtime = os.path.getmtime(p)
        if prev_mtime is not None:
            assert mtime > prev_mtime  # FileStreamSource replay order pinned
        prev_mtime = mtime


def test_sentinel_written_last(spark, tmp_path):
    df = spark.range(0, 100).select(
        F.lit("v").alias("video_id"), F.col("id").alias("frame_number")
    )
    sentinel = spark.createDataFrame(
        [("v", 10_000)], "video_id string, frame_number long"
    )
    tmp = str(tmp_path / "chunks")
    paths = write_replay_chunks(df, tmp, n_chunks=2, sentinel=sentinel)
    assert os.path.basename(paths[-1]) == "chunk_999.parquet"
    assert _read_chunk(spark, paths[-1]).first()["frame_number"] == 10_000
    assert os.path.getmtime(paths[-1]) == max(os.path.getmtime(p) for p in paths)
    # no staging litter
    assert not glob.glob(os.path.join(tmp, "_stage_*"))


def test_empty_chunk_skipped_not_errored(spark, tmp_path):
    # constant order column: every percentile boundary collapses to the
    # same value, so all rows land in chunk 0 and the rest are empty
    df = spark.range(0, 50).select(
        F.lit("v").alias("video_id"), F.lit(7).cast("long").alias("frame_number")
    )
    tmp = str(tmp_path / "chunks")
    paths = write_replay_chunks(df, tmp, n_chunks=3)
    assert len(paths) >= 1
    total = sum(_read_chunk(spark, p).count() for p in paths)
    assert total == 50
