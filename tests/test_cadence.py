"""M5/M6 cadence contracts.

M6 (inference cadence, stream.py:366-378): model runs on the first
frame and every Nth after; skipped frames carry the cached prediction
forward (LOCF) but are still emitted.

M5 (GradCAM cadence, fire_detect_nn.py:134-153): heatmap recomputes on
the 1st and every Nth *consecutive* positive; the consecutive counter
resets on any negative frame.
"""

from firewatch_spark.operators.cadence import (
    with_gradcam_cadence,
    with_inference_cadence,
    with_run_length,
)
from tests.conftest import rows


def test_locf_across_skipped_rows(spark):
    df = spark.createDataFrame(
        [("v", i, float(i * 10)) for i in range(1, 8)],
        "video_id string, frame_number long, pred double",
    )
    out = rows(
        with_inference_cadence(df, "video_id", "frame_number", ["pred"], every_n=3),
        "frame_number",
    )
    # inference on ordinals 1, 4, 7 -> frames 1, 4, 7
    assert [r["is_inference"] for r in out] == [True, False, False, True, False, False, True]
    # skipped rows carry the last inferred value
    assert [r["pred"] for r in out] == [10.0, 10.0, 10.0, 40.0, 40.0, 40.0, 70.0]


def test_cadence_n1_infers_everything(spark):
    df = spark.createDataFrame(
        [("v", i, float(i)) for i in range(5)],
        "video_id string, frame_number long, pred double",
    )
    out = rows(
        with_inference_cadence(df, "video_id", "frame_number", ["pred"], every_n=1),
        "frame_number",
    )
    assert all(r["is_inference"] for r in out)
    assert [r["pred"] for r in out] == [0.0, 1.0, 2.0, 3.0, 4.0]


def test_cadence_is_per_key(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("b", 1, 5.0), ("a", 2, 2.0), ("b", 2, 6.0)],
        "video_id string, frame_number long, pred double",
    )
    out = rows(
        with_inference_cadence(df, "video_id", "frame_number", ["pred"], every_n=2),
        "video_id",
        "frame_number",
    )
    # each key's first row is an inference row independently
    assert [(r["video_id"], r["is_inference"]) for r in out] == [
        ("a", True), ("a", False), ("b", True), ("b", False),
    ]
    assert [r["pred"] for r in out] == [1.0, 1.0, 5.0, 5.0]


def test_run_length_ids_and_positions(spark):
    flags = [True, True, False, True, True, True]
    df = spark.createDataFrame(
        [("v", i, f) for i, f in enumerate(flags)],
        "video_id string, frame_number long, hf boolean",
    )
    out = rows(with_run_length(df, "video_id", "frame_number", "hf"), "frame_number")
    assert [r["run_id"] for r in out] == [1, 1, 2, 3, 3, 3]
    assert [r["run_pos"] for r in out] == [1, 2, 1, 1, 2, 3]


def test_gradcam_recompute_first_and_every_nth_consecutive(spark):
    # run of 7 positives with N=5: recompute at consecutive positions
    # 1 and 6 (counter pre-increment % 5 == 0 — fire_detect_nn.py:136-150)
    flags = [True] * 7
    df = spark.createDataFrame(
        [("v", i, f) for i, f in enumerate(flags)],
        "video_id string, frame_number long, hf boolean",
    )
    out = rows(
        with_gradcam_cadence(df, "video_id", "frame_number", "hf", every_n_fire=5),
        "frame_number",
    )
    assert [r["recompute_heatmap"] for r in out] == [
        True, False, False, False, False, True, False,
    ]


def test_gradcam_counter_resets_on_negative(spark):
    # reference resets the consecutive counter on ANY negative frame
    # (fire_detect_nn.py:151-153): first positive after a gap recomputes
    flags = [True, True, False, True]
    df = spark.createDataFrame(
        [("v", i, f) for i, f in enumerate(flags)],
        "video_id string, frame_number long, hf boolean",
    )
    out = rows(
        with_gradcam_cadence(df, "video_id", "frame_number", "hf", every_n_fire=5),
        "frame_number",
    )
    assert [r["recompute_heatmap"] for r in out] == [True, False, False, True]


def test_gradcam_heatmap_reuse_within_run(spark):
    # heatmap LOCF between recomputes; negatives carry no heatmap
    flags = [True, True, True, False, True]
    df = spark.createDataFrame(
        [("v", i, f, float(i)) for i, f in enumerate(flags)],
        "video_id string, frame_number long, hf boolean, heatmap double",
    )
    out = rows(
        with_gradcam_cadence(
            df, "video_id", "frame_number", "hf", every_n_fire=2, heatmap_col="heatmap"
        ),
        "frame_number",
    )
    # N=2: recompute at run positions 1 and 3 -> frames 0 and 2 keep
    # their own heatmap, frame 1 reuses frame 0's, frame 3 (negative)
    # has none, frame 4 starts a new run -> fresh
    assert [r["heatmap"] for r in out] == [0.0, 0.0, 2.0, None, 4.0]


def test_gradcam_composed_after_locf_counts_inference_rows_only(spark):
    # ADVICE: when composed after M6, carried-forward rows must not
    # advance the run counter (the reference only counts predict() calls)
    df = spark.createDataFrame(
        [
            ("v", 0, True, True),
            ("v", 1, False, True),   # carried row: must not count
            ("v", 2, True, True),
            ("v", 3, True, False),
        ],
        "video_id string, frame_number long, is_inference boolean, hf boolean",
    )
    out = rows(
        with_gradcam_cadence(
            df,
            "video_id",
            "frame_number",
            "hf",
            every_n_fire=2,
            inference_only_col="is_inference",
        ),
        "frame_number",
    )
    by_frame = {r["frame_number"]: r for r in out}
    # inference positives at frames 0 and 2 form one run (frame 1 is
    # outside the domain): positions 1, 2 -> recompute only at frame 0
    assert by_frame[0]["recompute_heatmap"] is True
    assert by_frame[2]["recompute_heatmap"] is False
    # non-inference rows are never marked
    assert by_frame[1]["recompute_heatmap"] is False
    assert by_frame[1]["run_pos"] is None
