"""W1-W3 gap-sessionization contracts.

Boundary pinned by the reference (streams/stream.py:343-347): the
previous session closes only when `frame_number - last_seen > GAP` —
a jump of exactly GAP keeps the session open; GAP+1 closes it
(FIXTURES.md §1 pattern 3).
"""

from pyspark.sql import functions as F

from firewatch_spark.operators.sessions import session_stats, with_session_id
from tests.conftest import rows


def _frames(spark, seqs, key="v1"):
    return spark.createDataFrame([(key, s) for s in seqs], "video_id string, frame_number long")


def test_gap_of_exactly_300_keeps_session(spark):
    df = _frames(spark, [0, 1, 2, 302])  # 302 - 2 = 300 -> same session
    out = rows(with_session_id(df, "video_id", "frame_number", gap=300), "frame_number")
    assert [r["session_id"] for r in out] == [1, 1, 1, 1]


def test_gap_of_301_closes_session(spark):
    df = _frames(spark, [0, 1, 2, 303])  # 303 - 2 = 301 -> new session
    out = rows(with_session_id(df, "video_id", "frame_number", gap=300), "frame_number")
    assert [r["session_id"] for r in out] == [1, 1, 1, 2]


def test_same_video_reopens_as_new_session(spark):
    # FIXTURES pattern 3: same video_id continues after the gap
    df = _frames(spark, [0, 1, 400, 401, 900])
    out = rows(with_session_id(df, "video_id", "frame_number", gap=300), "frame_number")
    assert [r["session_id"] for r in out] == [1, 1, 2, 2, 3]


def test_sessions_are_per_key(spark):
    df = spark.createDataFrame(
        [("a", 0), ("b", 0), ("a", 1000), ("b", 1)],
        "video_id string, frame_number long",
    )
    out = rows(with_session_id(df, "video_id", "frame_number", gap=300), "video_id", "frame_number")
    assert [(r["video_id"], r["session_id"]) for r in out] == [
        ("a", 1), ("a", 2), ("b", 1), ("b", 1),
    ]


def test_session_stats_summary(spark):
    # completion-event arithmetic (stream.py:234-249): count, fire
    # count, max reported probability (0.0 when no fire in session)
    df = spark.createDataFrame(
        [
            ("v", 0, True, 0.9),
            ("v", 1, False, 0.0),
            ("v", 500, False, 0.0),  # new session, no fires
            ("v", 501, False, 0.0),
        ],
        "video_id string, frame_number long, has_fire boolean, fire_probability double",
    )
    sess = with_session_id(df, "video_id", "frame_number", gap=300)
    out = rows(session_stats(sess, "video_id", "frame_number"), "session_id")
    assert out[0]["total_frames"] == 2 and out[0]["fire_count"] == 1
    assert out[0]["max_fire_probability"] == 0.9
    assert out[1]["total_frames"] == 2 and out[1]["fire_count"] == 0
    assert out[1]["max_fire_probability"] == 0.0
    assert (out[1]["first_seq"], out[1]["last_seq"]) == (500, 501)


def test_builtin_session_window_boundary_matches_gap_rule(spark):
    """The idiomatic F.session_window path (SURVEY §2.5 W2 option a):
    with event-time = 1 s per sequence unit and gap = GAP seconds, the
    built-in merges a jump of exactly GAP (reference keeps the session,
    stream.py:343-347) and closes at GAP+1 — same boundary as the
    frame-domain strict-`>` rule."""
    from pyspark.sql import functions as F

    gap = 300
    df = spark.createDataFrame(
        [("v", 0), ("v", gap), ("v", 2 * gap + 1)], "k string, seq long"
    )
    df = df.withColumn("ts_t", F.timestamp_seconds(F.col("seq")))
    out = rows(
        df.groupBy("k", F.session_window("ts_t", f"{gap} seconds").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp("sw.start").alias("start"), "n"),
        "start",
    )
    # 0 and 300 merge (jump of exactly gap); 601 (jump gap+1) closes
    assert [(r["start"], r["n"]) for r in out] == [(0, 2), (601, 1)]
