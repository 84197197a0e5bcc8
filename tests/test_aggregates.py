"""A1-A7 aggregation contracts (progress caps, ceil arithmetic)."""

from pyspark.sql import functions as F

from firewatch_spark.operators.aggregates import (
    completion_stats,
    expected_frame_count,
    global_counters,
    with_progress_pct,
)
from tests.conftest import rows


def test_completion_stats(spark):
    df = spark.createDataFrame(
        [("v", 3, True, 0.9), ("v", 1, False, 0.0), ("v", 2, True, 0.6)],
        "video_id string, frame_number long, has_fire boolean, fire_probability double",
    )
    out = rows(completion_stats(df, "video_id", "frame_number"))
    assert out == [
        {
            "video_id": "v",
            "total_frames": 3,
            "fire_count": 2,
            "max_fire_probability": 0.9,
            "max_seq": 3,
        }
    ]


def test_global_counters(spark):
    df = spark.createDataFrame(
        [(1, True), (2, False), (3, False)], "id long, has_fire boolean"
    )
    out = rows(global_counters(df))
    assert out == [{"message_count": 3, "fire_count": 1, "no_fire_count": 2}]


def test_expected_frames_ceil_arithmetic(spark):
    # reference scripts/test_with_videos.py:44-54 — floor-div +
    # remainder bump == ceil; exact division has no bump
    df = spark.createDataFrame(
        [("a", i) for i in range(10)] + [("b", i) for i in range(7)],
        "video_id string, frame_number long",
    )
    out = {r["video_id"]: r for r in rows(expected_frame_count(df, "video_id", "frame_number", 5))}
    assert out["a"]["expected_frames"] == 2  # 10/5 exact
    assert out["b"]["expected_frames"] == 2  # ceil(7/5)


def test_expected_frames_from_source_total_column(spark):
    # pre-sampled stream: the observed rows are NOT the source total
    df = spark.createDataFrame(
        [("a", 0, 100), ("a", 2, 100)], "video_id string, frame_number long, src long"
    )
    out = rows(expected_frame_count(df, "video_id", "frame_number", 3, source_total="src"))
    assert out[0]["source_frames"] == 100 and out[0]["expected_frames"] == 34


def test_progress_monotone_and_capped(spark):
    # total understates the stream -> pct hits the 100 cap and stays
    df = spark.createDataFrame(
        [("v", i, 4) for i in range(6)], "video_id string, frame_number long, total long"
    )
    out = rows(with_progress_pct(df, "video_id", "frame_number", "total"), "frame_number")
    assert [r["progress_pct"] for r in out] == [25, 50, 75, 100, 100, 100]


def test_progress_producer_cap(spark):
    # reference progress.py:74-95 — stream progress never exceeds
    # producer progress
    df = spark.createDataFrame(
        [("v", 1, 4, 30), ("v", 2, 4, 30), ("v", 3, 4, 80), ("v", 4, 4, 100)],
        "video_id string, frame_number long, total long, producer long",
    )
    out = rows(
        with_progress_pct(
            df, "video_id", "frame_number", "total", producer_pct_col="producer"
        ),
        "frame_number",
    )
    assert [r["progress_pct"] for r in out] == [25, 30, 75, 100]
