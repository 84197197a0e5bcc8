"""Streaming gap-sessionization with arbitrary state — the exact-parity
twin of operators/sessions.py (W1-W4 from SURVEY.md §2.5).

The reference holds per-video dicts in its consumer loop
(streams/stream.py:105-121) and closes a session only when the next
frame arrives with `frame_number - last_seen > gap`
(streams/stream.py:340-349) or on shutdown (`_cleanup`, :427-442).
Here the same state machine runs inside ``applyInPandasWithState``:

* key          = video_id — Spark shuffles each key's frames to one
  task, the distributed analog of the reference's per-key dicts;
* state        = (session_seq, first_seq, last_seen, total, fires,
  max_prob) — O(1) per key, NEVER buffers frames (100 TB safe);
* output       = one completion row per CLOSED session (W3), emitted
  when the gap rule fires (W2) or on state timeout — the streaming
  analog of the reference's shutdown flush (W4).  Under
  ``trigger(availableNow=True)`` the terminal batch fires pending
  processing-time timeouts, so a drained bounded stream flushes every
  open session (observed empirically) — matching `_cleanup`'s
  finalize-all-on-exit behavior.

The gap is in the **sequence-number domain**, not event time: exact
parity with the reference, strict `>` boundary (a jump of exactly
`gap` keeps the session).  A `session_window`-based variant would be
the idiomatic-time alternative (SURVEY.md §2.5 W2 note); this operator
exists precisely because the reference's domain is frame numbers.

Out-of-order handling matches the reference: rows are processed in
seq order *within* each micro-batch (sort), and `last_seen` is
overwritten per row exactly like the reference's dict update
(stream.py:349) — late rows inside the gap are absorbed.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DEFAULT_GAP = 300  # reference stream.py:343

OUTPUT_SCHEMA = StructType(
    [
        StructField("video_id", StringType()),
        StructField("session_id", LongType()),
        StructField("total_frames", LongType()),
        StructField("fire_count", LongType()),
        StructField("max_fire_probability", DoubleType()),
        StructField("first_seq", LongType()),
        StructField("last_seq", LongType()),
        StructField("closed_by", StringType()),  # 'gap' | 'timeout'
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
    ]
)


def fold_session_batch(
    video_id: str,
    state_tuple: "tuple | None",
    batch: pd.DataFrame,
    gap: int,
) -> tuple[tuple, list[dict]]:
    """THE W1–W3 per-batch state fold, shared by both arbitrary-state
    APIs (`_session_fn` on applyInPandasWithState and
    tws_session.GapSessionProcessor on transformWithStateInPandas) so
    the session semantics exist exactly once.  ``state_tuple`` is the
    (session_id, first_seq, last_seen, total, fires, max_prob) tuple or
    None for an unseen key (W1); returns the updated tuple and the
    completion rows closed by the gap rule (W2/W3) in batch order."""
    if state_tuple is None:
        sid, first, last, total, fires, maxp = 1, None, None, 0, 0, 0.0
    else:
        sid, first, last, total, fires, maxp = state_tuple

    closed: list[dict] = []
    batch = batch.sort_values("frame_number")
    for row in batch.itertuples(index=False):
        seq = int(row.frame_number)
        if last is not None and seq - last > gap:  # W2: strict >
            closed.append(
                {
                    "video_id": video_id,
                    "session_id": sid,
                    "total_frames": total,
                    "fire_count": fires,
                    "max_fire_probability": maxp,
                    "first_seq": first,
                    "last_seq": last,
                    "closed_by": "gap",
                }
            )
            sid, first, total, fires, maxp = sid + 1, None, 0, 0, 0.0
        if first is None:
            first = seq
        # reference overwrites last_seen unconditionally (stream.py:349)
        # — late rows inside the gap are absorbed
        last = seq
        total += 1
        if bool(row.has_fire):
            fires += 1
            maxp = max(maxp, float(row.fire_probability))
    return (sid, first, last, total, fires, maxp), closed


def _session_fn(gap: int, timeout_ms: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        video_id = key[0]
        if state.hasTimedOut:
            # W4 shutdown-flush analog: no frames for `timeout_ms` —
            # finalize the open session exactly like _cleanup does.
            (sid, first, last, total, fires, maxp) = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "video_id": video_id,
                        "session_id": sid,
                        "total_frames": total,
                        "fire_count": fires,
                        "max_fire_probability": maxp,
                        "first_seq": first,
                        "last_seq": last,
                        "closed_by": "timeout",
                    }
                ]
            )
            return

        batch = pd.concat(list(pdfs), ignore_index=True)
        new_state, closed = fold_session_batch(
            video_id, state.get if state.exists else None, batch, gap
        )
        state.update(new_state)
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if closed:
            yield pd.DataFrame(closed)

    return fn


def sessionize_stream(
    frames: DataFrame,
    gap: int = DEFAULT_GAP,
    timeout_ms: "int | None" = 60_000,
    key: str = "video_id",
) -> DataFrame:
    """Streaming sessionization: frames (video_id, frame_number,
    has_fire, fire_probability) → completion rows per closed session.

    Requires a streaming DataFrame; output mode `update`/`append` at
    the sink.  State is O(keys), not O(rows).

    ``timeout_ms=None`` disables the W4 idle-timeout flush entirely
    (NoTimeout).  Use it for bounded ``availableNow`` replays that
    close every session via the gap rule: a query with a pending
    ProcessingTimeTimeout timer never terminates under availableNow
    (Spark keeps the query alive for future timers), so a
    timer-armed replay burns its whole awaitTermination budget.
    """
    return frames.groupBy(key).applyInPandasWithState(
        _session_fn(gap, timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if timeout_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
