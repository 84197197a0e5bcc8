"""The full EP2 stateful operator: inference cadence (M6) + session
machine (W1-W4) in ONE applyInPandasWithState stage — the exact-parity
streaming twin of the reference consumer loop.

Why one operator: SURVEY.md §7's risk register — "LOCF across
micro-batch boundaries: keep the cadence state inside the same stateful
operator as the session".  `last(..., ignorenulls=True)` works per
batch; only state carries the cached prediction across batches.  The
reference keeps both the inference-cadence counter and the
last-prediction cache in the same per-video dicts
(streams/stream.py:119-121,366-378); this operator holds the same six
session fields plus (frame_counter, cached_has_fire, cached_prob).

The model is injected as a vectorized ``predict_fn(seq: ndarray) ->
(has_fire, prob)`` and called ONLY on cadence-selected rows — the
skip-the-model win the cadence exists for (stream.py:366-378), now
batched: one call per (key, micro-batch) over the inference rows.

Output is the union of both reference output streams, discriminated by
``row_type``: 'frame' rows mirror the detections stream (per frame,
LOCF-filled), 'session' rows mirror the completions stream.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("row_type", StringType()),       # 'frame' | 'session'
        StructField("video_id", StringType()),
        StructField("frame_number", LongType()),     # frame rows
        StructField("is_inference", BooleanType()),
        StructField("has_fire", BooleanType()),
        StructField("fire_probability", DoubleType()),
        StructField("session_id", LongType()),       # session rows
        StructField("total_frames", LongType()),
        StructField("fire_count", LongType()),
        StructField("max_fire_probability", DoubleType()),
        StructField("first_seq", LongType()),
        StructField("last_seq", LongType()),
        StructField("closed_by", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("session_id", LongType()),
        StructField("first_seq", LongType()),
        StructField("last_seen", LongType()),
        StructField("total_frames", LongType()),
        StructField("fire_count", LongType()),
        StructField("max_fire_probability", DoubleType()),
        # M6 cadence state (reference stream.py:119-121)
        StructField("frame_counter", LongType()),
        StructField("cached_has_fire", BooleanType()),
        StructField("cached_prob", DoubleType()),
    ]
)


def surrogate_predict_fn(seq: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized surrogate backend (same arithmetic as surrogate.py)."""
    from .. import surrogate

    raw = ((seq.astype("int64") * surrogate.KNUTH) % surrogate.MOD) / float(surrogate.MOD)
    hf = raw >= surrogate.DEFAULT_THRESHOLD
    return hf, np.where(hf, raw, 0.0)


def _session_row(video_id, sid, first, last, total, fires, maxp, closed_by):
    return {
        "row_type": "session", "video_id": video_id, "frame_number": None,
        "is_inference": None, "has_fire": None, "fire_probability": None,
        "session_id": sid, "total_frames": total, "fire_count": fires,
        "max_fire_probability": maxp, "first_seq": first, "last_seq": last,
        "closed_by": closed_by,
    }


def _pipeline_fn(gap: int, every_n: int, timeout_ms: int, predict_fn: Callable):
    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        video_id = key[0]
        if state.hasTimedOut:
            (sid, first, last, total, fires, maxp, *_rest) = state.get
            state.remove()
            yield pd.DataFrame(
                [_session_row(video_id, sid, first, last, total, fires, maxp, "timeout")]
            )
            return

        if state.exists:
            (sid, first, last, total, fires, maxp, ctr, c_hf, c_prob) = state.get
        else:  # W1 — fresh key
            sid, first, last, total, fires, maxp = 1, None, None, 0, 0, 0.0
            ctr, c_hf, c_prob = 0, None, None

        batch = pd.concat(list(pdfs), ignore_index=True).sort_values("frame_number")
        seqs = batch["frame_number"].to_numpy(dtype="int64")

        # M6 cadence: inference iff (per-key running counter) % N == 0;
        # the counter continues ACROSS micro-batches via state.
        ordinals = ctr + np.arange(len(seqs), dtype="int64")
        is_inf = (ordinals % every_n) == 0

        # one vectorized model call per (key, batch), inference rows only
        hf = np.zeros(len(seqs), dtype=bool)
        prob = np.zeros(len(seqs), dtype="float64")
        if is_inf.any():
            hf_i, prob_i = predict_fn(seqs[is_inf])
            hf[is_inf], prob[is_inf] = hf_i, prob_i

        out: list[dict] = []
        for i, seq in enumerate(map(int, seqs)):
            if last is not None and seq - last > gap:  # W2 strict >
                out.append(
                    _session_row(video_id, sid, first, last, total, fires, maxp, "gap")
                )
                sid, first, total, fires, maxp = sid + 1, None, 0, 0, 0.0
                # NOTE: the reference does NOT reset the cadence counter
                # or prediction cache on session close (they live beside
                # the session dicts, stream.py:119-121) — neither do we.
            if is_inf[i]:
                c_hf, c_prob = bool(hf[i]), float(prob[i])
            row_hf = bool(c_hf) if c_hf is not None else False
            row_prob = float(c_prob) if c_prob is not None else 0.0
            if first is None:
                first = seq
            last = seq
            total += 1
            if row_hf:
                fires += 1
                maxp = max(maxp, row_prob)
            out.append(
                {
                    "row_type": "frame", "video_id": video_id,
                    "frame_number": seq, "is_inference": bool(is_inf[i]),
                    "has_fire": row_hf, "fire_probability": row_prob,
                    "session_id": sid, "total_frames": None,
                    "fire_count": None, "max_fire_probability": None,
                    "first_seq": None, "last_seq": None, "closed_by": None,
                }
            )
        ctr += len(seqs)

        state.update((sid, first, last, total, fires, maxp, ctr, c_hf, c_prob))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(out)

    return fn


def fire_detection_stream(
    frames: DataFrame,
    gap: int = 300,
    inference_every_n: int = 1,
    timeout_ms: "int | None" = 60_000,
    predict_fn: Callable = surrogate_predict_fn,
    key: str = "video_id",
) -> DataFrame:
    """EP2 in one stateful stage: frames (video_id, frame_number) →
    per-frame detection rows (cadence+LOCF applied) + session
    completion rows, exactly like the reference consumer loop.

    ``timeout_ms=None`` → NoTimeout (no W4 idle flush); required for
    ``availableNow`` replays to terminate — see
    session_state.sessionize_stream."""
    return frames.groupBy(key).applyInPandasWithState(
        _pipeline_fn(gap, inference_every_n, timeout_ms, predict_fn),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if timeout_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
