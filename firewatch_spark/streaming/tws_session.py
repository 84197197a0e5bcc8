"""Gap-sessionization on Spark 4's ``transformWithStateInPandas`` —
the same W1–W3 state machine as session_state.py on the NEW arbitrary-
state API (StatefulProcessor + typed state handles, SPARK-49564
family), kept as the forward-looking twin:

* ``applyInPandasWithState`` (session_state.py) is the exact-parity
  workhorse — one opaque state tuple, processing-time timeouts;
* ``transformWithStateInPandas`` is where Structured Streaming's
  arbitrary state is heading — named typed state slots (ValueState
  here; List/MapState for larger machines), per-key timers, TTL, and
  the RocksDB state store REQUIRED (the provider is set per query in
  `sessionize_stream_tws`'s caller), which is also the right provider
  for 100 TB state (incremental checkpointing, spill-free).

The state machine IS the same code: both APIs call
``session_state.fold_session_batch`` — gap in the sequence-number
domain, strict ``>`` boundary, per-batch sort, unconditional
``last_seen`` overwrite (reference stream.py:340-349) — so the two
wrappers cannot drift.
Timers are deliberately NOT armed (timeMode="none"): bounded
``availableNow`` replays close every session via the sentinel-driven
gap rule, exactly like the NoTimeout path of the old-API twin — the
W4 timeout flush is covered by session_state.py's armed-timer mode.

Output parity is pinned by tests/test_streaming.py: the TWS replay,
the applyInPandasWithState replay and the batch sessionizer must all
emit identical completion rows.

CONTAINER GATE: the transformWithState Python↔JVM state protocol is
protobuf-based (``pyspark.sql.streaming.proto``), and ``protobuf`` is
not installed here — a live query crashes its driver worker with
``ModuleNotFoundError: google``.  :data:`HAVE_TWS_PROTO` reports it;
the live parity test skips on it, and the processor's state machine is
additionally pinned by a fake-handle seam test that needs no protocol
(same pattern as the torch/cv2 seams).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from .session_state import (
    DEFAULT_GAP,
    OUTPUT_SCHEMA,
    STATE_SCHEMA,
    fold_session_batch,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

try:  # the TWS state server speaks protobuf from the Python side
    from pyspark.sql.streaming.proto import StateMessage_pb2  # noqa: F401

    HAVE_TWS_PROTO = True
except ImportError:
    HAVE_TWS_PROTO = False


class GapSessionProcessor(StatefulProcessor):
    """W1–W3 per-key session machine as a StatefulProcessor.

    State slot: one ValueState row (session_id, first_seq, last_seen,
    total_frames, fire_count, max_fire_probability) — O(1) per key,
    never buffers frames."""

    def __init__(self, gap: int = DEFAULT_GAP):
        self._gap = gap

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("session", STATE_SCHEMA)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        prior = tuple(self._state.get()) if self._state.exists() else None
        batch = pd.concat(list(rows), ignore_index=True)
        new_state, closed = fold_session_batch(key[0], prior, batch, self._gap)
        self._state.update(new_state)
        if closed:
            yield pd.DataFrame(closed)

    def close(self) -> None:
        pass


def sessionize_stream_tws(
    frames: DataFrame, gap: int = DEFAULT_GAP, key: str = "video_id"
) -> DataFrame:
    """Streaming sessionization via transformWithStateInPandas.

    The session running the query MUST use the RocksDB state store
    (``spark.sql.streaming.stateStore.providerClass`` =
    :data:`ROCKSDB_PROVIDER`) — transformWithState is only implemented
    there; callers set/restore the conf around the query start."""
    return frames.groupBy(key).transformWithStateInPandas(
        statefulProcessor=GapSessionProcessor(gap),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
