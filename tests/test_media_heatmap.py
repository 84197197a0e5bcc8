"""Contracts for the media-side operators: M3 surrogate GradCAM,
P10 overlay, P11 transform dims, S1 video scan, S4 JPEG encode,
S5 transport encode, A3/A4 aggregates, W5 dedup policy."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from firewatch_spark import surrogate
from firewatch_spark.functions import heatmap as hm
from firewatch_spark.functions import projections
from firewatch_spark.operators import aggregates
from firewatch_spark.sources.frames import video_file_scan
from firewatch_spark.sources.multimodal import jpeg_encode
from firewatch_spark.streaming.pipeline import with_late_policy
from tests.conftest import rows


def _np_heatmap(seq: int, cells: int = hm.HEATMAP_CELLS) -> np.ndarray:
    """The reference arithmetic (gradcam.py:81-84 normalization) in
    numpy, independent of the Spark implementation."""
    raw = np.array(
        [((seq * cells + j) * surrogate.KNUTH % surrogate.MOD) / surrogate.MOD
         for j in range(cells)]
    )
    return raw / (raw.max() + 1e-8)


def test_surrogate_heatmap_matches_numpy(spark):
    df = spark.range(5).select(F.col("id").alias("seq"))
    out = rows(df.select("seq", hm.surrogate_heatmap(F.col("seq")).alias("h")), "seq")
    for r in out:
        expected = _np_heatmap(r["seq"])
        np.testing.assert_allclose(np.array(r["h"]), expected, rtol=1e-12)
        assert 0.0 <= min(r["h"]) and max(r["h"]) <= 1.0  # gradcam.py:81-84 range


def test_overlay_blend_matches_reference_formula(spark):
    """addWeighted(frame, 1-a, colored, a) on a uniform 128-gray frame
    (overlay.py:38-41); None heatmap → identity (overlay.py:17-18)."""
    df = spark.range(3).select(F.col("id").alias("seq"))
    df = df.withColumn("h", hm.surrogate_heatmap(F.col("seq")))
    df = df.withColumn(
        "h", F.when(F.col("seq") == 2, F.lit(None)).otherwise(F.col("h"))
    )
    out = rows(df.select("seq", hm.overlay_stats(F.col("h")).alias("b")), "seq")
    for r in out[:2]:
        mean_h = _np_heatmap(r["seq"]).mean()
        assert r["b"] == pytest.approx(0.6 * 128.0 + 0.4 * 255.0 * mean_h, rel=1e-9)
    assert out[2]["b"] == 128.0  # identity on missing heatmap


def test_model_transform_dims_contract(spark):
    df = spark.createDataFrame([(1280, 720)], "w int, h int")
    r = rows(df.select(hm.model_transform_dims(F.col("w"), F.col("h")).alias("t")))[0]["t"]
    assert (r["model_w"], r["model_h"], r["channel_order"]) == (224, 224, "rgb")
    assert r["scale_x"] == pytest.approx(1280 / 224)


def test_gradcam_heatmap_locf_composition(spark):
    """Heatmap recomputed on run positions 1, N+1, ... of positive
    runs; reused (identical array) in between; NULL before any
    positive frame (fire_detect_nn.py:136-151)."""
    from firewatch_spark.operators.cadence import with_gradcam_cadence

    data = [("v", i, f) for i, f in enumerate([False, True, True, True, False, True])]
    df = spark.createDataFrame(data, "k string, seq long, hf boolean")
    out = with_gradcam_cadence(df, "k", "seq", "hf", every_n_fire=2)
    out = hm.with_gradcam_heatmap(out, "k", "seq")
    got = rows(out.select("seq", "recompute_heatmap", "heatmap"), "seq")
    assert got[0]["heatmap"] is None  # no positive yet
    np.testing.assert_allclose(got[1]["heatmap"], _np_heatmap(1), rtol=1e-12)
    assert got[2]["heatmap"] == got[1]["heatmap"]  # reuse (run_pos 2)
    np.testing.assert_allclose(got[3]["heatmap"], _np_heatmap(3), rtol=1e-12)
    assert got[4]["heatmap"] == got[3]["heatmap"]  # negative row: carries cache
    np.testing.assert_allclose(got[5]["heatmap"], _np_heatmap(5), rtol=1e-12)  # new run


def test_transport_encode_decode_roundtrip(spark):
    df = spark.createDataFrame([(b"\x00\xffjpeg-ish bytes",)], "payload binary")
    for mode in ("msgpack", "base64-json"):
        out = rows(
            df.select(
                projections.decode_transport(
                    projections.encode_transport(F.col("payload"), mode), mode
                ).alias("rt")
            )
        )
        assert bytes(out[0]["rt"]) == b"\x00\xffjpeg-ish bytes", mode
    with pytest.raises(ValueError):
        projections.encode_transport(F.col("payload"), "protobuf")


def test_jpeg_encode_size_arithmetic(spark):
    df = spark.createDataFrame(
        [(1, "image", b"px", 640, 480), (2, "image", None, 640, 480)],
        "media_id long, kind string, payload binary, meta_width int, meta_height int",
    )
    out = rows(jpeg_encode(df, quality=85), "media_id")
    assert len(out[0]["jpeg"]) == 640 * 480 // 85
    seed = hashlib.sha256(b"px").digest()
    assert bytes(out[0]["jpeg"][:32]) == seed  # deterministic fake content
    assert out[1]["jpeg"] is None


def test_video_file_scan_explodes_frames(spark, tmp_path):
    for i in range(2):
        (tmp_path / f"clip_{i}.mp4").write_bytes(bytes([i]) * 500)
    out = video_file_scan(spark, str(tmp_path), frame_interval=2)
    got = rows(out, "video_id", "frame_number")
    vids = {r["video_id"] for r in got}
    assert vids == {"clip_0", "clip_1"}
    per_vid = [r for r in got if r["video_id"] == "clip_0"]
    # S2 sampling inside the explode: only even frame numbers
    assert all(r["frame_number"] % 2 == 0 for r in per_vid)
    h = hashlib.sha256(bytes([0]) * 500).digest()
    assert len(per_vid) == (30 + h[0] % 211 + 1) // 2  # fake probe arithmetic
    assert per_vid[0]["fps"] == float(15 + h[1] % 46)


def test_frames_written_and_last_frame(spark):
    df = spark.createDataFrame(
        [("v", 1, True, b"a"), ("v", 2, False, b"b"), ("v", 3, True, b"c")],
        "k string, seq long, ok boolean, frame binary",
    )
    fw = rows(aggregates.frames_written(df, "k", written_flag="ok"))
    assert fw[0]["frames_written"] == 2
    fw_all = rows(aggregates.frames_written(df, "k"))
    assert fw_all[0]["frames_written"] == 3
    lf = rows(aggregates.last_frame(df, "k", "seq", "frame"))
    assert bytes(lf[0]["last_frame"]) == b"c" and lf[0]["last_seq"] == 3


def test_late_policy_dedup_batch(spark):
    df = spark.createDataFrame(
        [("v", 1), ("v", 1), ("v", 2), ("w", 1)], "video_id string, frame_number long"
    )
    out = rows(with_late_policy(df), "video_id", "frame_number")
    assert [(r["video_id"], r["frame_number"]) for r in out] == [
        ("v", 1), ("v", 2), ("w", 1),
    ]
