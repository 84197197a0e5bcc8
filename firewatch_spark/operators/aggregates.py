"""Per-key and global aggregations — A1-A7 from SURVEY.md §2.4.

All of these were hand-maintained dict counters in the reference's
consumer loop; in Spark each is a declarative aggregation with automatic
partial (map-side) aggregation, so they scale linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def completion_stats(
    df: DataFrame,
    key: str,
    seq: str,
    has_fire: str = "has_fire",
    fire_probability: str = "fire_probability",
) -> DataFrame:
    """A1 + A2 — the running per-video stats that seed the completion
    event (streams/stream.py:163,380-386 and :332-335): frame count,
    fire count, max reported probability, max sequence number seen."""
    return df.groupBy(key).agg(
        F.count(F.lit(1)).alias("total_frames"),
        F.sum(F.col(has_fire).cast("long")).alias("fire_count"),
        F.max(fire_probability).alias("max_fire_probability"),
        F.max(seq).alias("max_seq"),
    )


def global_counters(df: DataFrame, has_fire: str = "has_fire") -> DataFrame:
    """A7 — whole-stream message/detection/fire counters
    (streams/stream.py:459-461,518-526).  In production this is
    `df.observe(...)` so it rides along for free; as a query it is a
    keyless aggregate (single partial-agg reduce, no shuffle of data)."""
    return df.agg(
        F.count(F.lit(1)).alias("message_count"),
        F.sum(F.col(has_fire).cast("long")).alias("fire_count"),
        F.sum((~F.col(has_fire)).cast("long")).alias("no_fire_count"),
    )


def expected_frame_count(
    df: DataFrame, key: str, seq: str, interval: int
) -> DataFrame:
    """A5 — producer-side expected-frame arithmetic
    (scripts/test_with_videos.py:44-54): ceil(total/interval) via
    floor-div + remainder bump, computed per key from the max seq."""
    out = df.groupBy(key).agg((F.max(seq) + 1).alias("source_frames"))
    base = (F.col("source_frames") / F.lit(interval)).cast("long")
    bump = (F.col("source_frames") % F.lit(interval) > 0).cast("long")
    return out.withColumn("expected_frames", base + bump)


def with_progress_pct(
    df: DataFrame,
    key: str,
    seq: str,
    total_col: str,
    pct_col: str = "progress_pct",
) -> DataFrame:
    """A6 — monotone, capped progress percentage
    (streams/pipeline/progress.py:74-95,125-131): at each row,
    pct = min(int(done*100/total), 100), forced monotone non-decreasing
    with a running max.  `total_col` is the per-key expected total."""
    w = Window.partitionBy(key).orderBy(seq)
    done = F.row_number().over(w)
    raw_pct = F.least(
        F.floor(done * 100 / F.col(total_col)).cast("int"), F.lit(100)
    )
    monotone = F.max(raw_pct).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(pct_col, monotone)
