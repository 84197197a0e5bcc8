"""Explicit StructTypes for the reference's wire records.

The reference's schemas are implicit/convention-based (SURVEY.md §1.3;
reference `config.py:64-67` — "Producer and stream MUST agree").  Here they
are declared once so every source applies them via `from_json` / typed
columns, and malformed records can be routed to a dead-letter column
instead of per-frame exception swallowing (reference `streams/stream.py:421-423`).

Record provenance:
  frame message      producer/video_producer.py:116-124
  prediction         streams/models/fire_detect_nn.py:167-175
  detection event    streams/stream.py:405-418
  completion event   streams/stream.py:305-311 (+ stats :234-249)
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# Frame message — the main input stream (one row per video frame).
# `timestamp` is kept as the ISO-8601 string of the wire format; typed
# event-time is derived with to_timestamp() at the source boundary.
FRAME_SCHEMA = StructType(
    [
        StructField("video_id", StringType(), False),
        StructField("frame_number", IntegerType(), False),
        StructField("timestamp", StringType(), True),
        StructField("fps", DoubleType(), True),  # consumer defaults 30.0
        StructField("frame_data", BinaryType(), True),
        StructField("width", IntegerType(), True),  # nullable: metadata backfill
        StructField("height", IntegerType(), True),
    ]
)

# A single detection box (streams/models/yolov8.py:148-155).
DETECTION_SCHEMA = StructType(
    [
        StructField("bbox", ArrayType(IntegerType()), False),
        StructField("confidence", DoubleType(), False),
        StructField("class", StringType(), False),
        StructField("class_id", IntegerType(), False),
    ]
)

# Prediction — the model backend contract (fire_detect_nn.py:167-175).
# The 2-D heatmap is stored flattened with dims, which keeps it a compact
# fixed-width array for shuffle (SURVEY.md §7 "100 TB posture").
PREDICTION_SCHEMA = StructType(
    [
        StructField("has_fire", BooleanType(), False),
        StructField("fire_probability", DoubleType(), False),
        StructField("no_fire_probability", DoubleType(), False),
        StructField("detections", ArrayType(DETECTION_SCHEMA), False),
        StructField("model_type", StringType(), False),
        StructField("heatmap", ArrayType(DoubleType()), True),
        StructField("heatmap_h", IntegerType(), True),
        StructField("heatmap_w", IntegerType(), True),
    ]
)

# Detection event — output stream 1 (streams/stream.py:405-418).
FRAME_METADATA_SCHEMA = StructType(
    [
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("fps", DoubleType(), True),
    ]
)

DETECTION_EVENT_SCHEMA = StructType(
    [
        StructField("video_id", StringType(), False),
        StructField("frame_number", IntegerType(), False),
        StructField("timestamp", StringType(), True),
        StructField("processing_timestamp", StringType(), True),
        StructField("has_fire", BooleanType(), False),
        StructField("fire_probability", DoubleType(), False),
        StructField("detections", ArrayType(DETECTION_SCHEMA), False),
        StructField("frame_metadata", FRAME_METADATA_SCHEMA, True),
    ]
)

# Completion event — output stream 2, one per closed session
# (streams/stream.py:305-311; stats payload :234-249).
COMPLETION_STATS_SCHEMA = StructType(
    [
        StructField("total_frames", LongType(), False),
        StructField("fire_count", LongType(), False),
        StructField("max_fire_probability", DoubleType(), False),
    ]
)

VIDEO_METADATA_SCHEMA = StructType(
    [
        StructField("fps", DoubleType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("frame_count", LongType(), False),
    ]
)

COMPLETION_EVENT_SCHEMA = StructType(
    [
        StructField("video_id", StringType(), False),
        StructField("session_id", LongType(), False),
        StructField("local_filepath", StringType(), True),
        StructField("timestamp", StringType(), True),
        StructField("stats", COMPLETION_STATS_SCHEMA, False),
        StructField("video_metadata", VIDEO_METADATA_SCHEMA, True),
    ]
)
