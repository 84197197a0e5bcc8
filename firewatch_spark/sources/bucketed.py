"""Bucketed table writes — the shuffle-free co-located join path.

SCALE.md's join posture: dimensions broadcast; fact⋈fact joins on a
shared key should NOT re-shuffle both sides on every query.  Bucketing
is Spark's answer: write each side hash-partitioned into the same
number of buckets on the join key, and every later equi-join on that
key reads bucket-aligned files — the plan has NO Exchange on either
side (pinned by test).  At 100 TB this converts a
recurring O(data) shuffle per query into a one-time layout cost at
write time, exactly like the reference pre-partitions its Kafka topics
by video_id (docs/SCALING.md:124-138) so consumers never re-key.

Bucketed writes go through the session catalog (``saveAsTable`` — a
plain ``parquet(path)`` write cannot record bucket metadata); pass
`path` to keep the files in an external location.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str | list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Write `df` bucketed by `key` (a column or list of columns) into
    `num_buckets` buckets (and optionally sorted within buckets, which
    also drops the Sort from later sort-merge joins).  Both sides of a
    future join must use the SAME key and bucket count to join
    exchange-free — or, the one-sided form, a computed DataFrame
    joining a bucketed table shuffles ONLY the computed side (the
    stored-dedup-index posture: the index never re-shuffles,
    per-batch cost is one exchange of the new batch)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(num_buckets, *keys)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)
