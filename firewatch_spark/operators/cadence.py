"""Cadence / LOCF operators — M5 and M6 from SURVEY.md §2.3.

The reference hand-rolls two sampling optimizations in its consumer loop:

M6  Inference cadence (streams/stream.py:366-378, config.py:59-62):
    run the model only on every Nth frame per video; skipped frames reuse
    the cached prediction but are still emitted.

M5  GradCAM cadence (fire_detect_nn.py:33-37,134-153, config.py:52-57):
    recompute the heatmap only on the 1st and every Nth *consecutive*
    positive frame; the counter resets on any negative frame; cached
    heatmap is reused in between.

Both are pure window-function compositions — no state, no UDFs, fully
inside whole-stage codegen.  At 100 TB the single shuffle is the
partitionBy(key); everything after is a sort within partitions, and the
same window partitioning is reused by downstream sessionization (no
second shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def key_window(key: str, seq: str) -> WindowSpec:
    return Window.partitionBy(key).orderBy(seq)


def with_inference_cadence(
    df: DataFrame,
    key: str,
    seq: str,
    value_cols: list[str],
    every_n: int,
    ordinal_col: str = "_ordinal",
) -> DataFrame:
    """M6 — per-key 1-in-N sampling with last-observation-carried-forward.

    Rows whose per-key ordinal (1-based row_number over `seq`) satisfies
    ``(ordinal - 1) % N == 0`` are "inference rows" (the reference runs
    the model on its first frame and then every Nth message,
    stream.py:366-369).  Every other row's `value_cols` are replaced by
    the most recent inference row's values (LOCF), exactly like the
    reference's cached-prediction reuse.

    Adds:  ``is_inference`` boolean and rewrites each value column.
    """
    w = key_window(key, seq)
    df = df.withColumn(ordinal_col, F.row_number().over(w))
    is_inf = ((F.col(ordinal_col) - 1) % F.lit(every_n)) == 0
    df = df.withColumn("is_inference", is_inf)
    for c in value_cols:
        # null-out skipped rows, then forward-fill with an unbounded-
        # preceding window: classic LOCF, one pass, no extra shuffle.
        masked = F.when(F.col("is_inference"), F.col(c))
        filled = F.last(masked, ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        df = df.withColumn(c, filled)
    return df.drop(ordinal_col)


def with_run_length(
    df: DataFrame,
    key: str,
    seq: str,
    flag: str | Column,
    run_id_col: str = "run_id",
    run_pos_col: str = "run_pos",
) -> DataFrame:
    """Run-length encoding of a boolean flag per key.

    Standard gaps-and-islands: a run starts where the flag value changes
    (detected with `lag`); `run_id` is the running count of starts and
    `run_pos` the 1-based position within the run.  This is the primitive
    under M5's "Nth consecutive positive" semantics.
    """
    flag_col = F.col(flag) if isinstance(flag, str) else flag
    w = key_window(key, seq)
    changed = (
        F.lag(flag_col).over(w).isNull()
        | (F.lag(flag_col).over(w) != flag_col)
    ).cast("int")
    df = df.withColumn("_run_start", changed)
    df = df.withColumn(
        run_id_col,
        F.sum("_run_start").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    run_w = Window.partitionBy(key, run_id_col).orderBy(seq)
    df = df.withColumn(run_pos_col, F.row_number().over(run_w))
    return df.drop("_run_start")


def with_gradcam_cadence(
    df: DataFrame,
    key: str,
    seq: str,
    has_fire: str,
    every_n_fire: int,
    heatmap_col: str | None = None,
    recompute_col: str = "recompute_heatmap",
    inference_only_col: str | None = None,
) -> DataFrame:
    """M5 — GradCAM run-length sampling with heatmap reuse.

    Reference semantics (fire_detect_nn.py:134-153): a counter of
    *consecutive* positives increments on each positive frame and
    resets to 0 on any negative; the heatmap is recomputed when the
    counter (pre-increment) % N == 0 — i.e. on the 1st, (N+1)th, (2N+1)th
    ... consecutive positive.  Between recomputes the cached heatmap is
    reused (LOCF within the positive run; negatives carry no heatmap).

    Intentional divergence from the reference: its counter lives on the
    single shared model instance (`_consecutive_fire_frames`,
    fire_detect_nn.py:33-37), so interleaved videos share one counter —
    an artifact of the single-threaded consumer, not a semantic.  Here
    the run-length is **per key**, which is the distributable meaning.

    When composing after M6's LOCF, pass ``inference_only_col`` (e.g.
    ``"is_inference"``): the reference's counter only advances on actual
    predict() calls, so carried-forward rows must not count — rows
    failing the predicate are excluded from the run-length domain and
    never marked for recompute.
    """
    if inference_only_col is not None:
        inf_rows = df.filter(F.col(inference_only_col))
        rest = df.filter(~F.col(inference_only_col))
        marked = with_gradcam_cadence(
            inf_rows, key, seq, has_fire, every_n_fire, heatmap_col, recompute_col
        )
        rest = rest.withColumn("run_id", F.lit(None).cast("long")).withColumn(
            "run_pos", F.lit(None).cast("int")
        ).withColumn(recompute_col, F.lit(False))
        return marked.unionByName(rest, allowMissingColumns=True)
    df = with_run_length(df, key, seq, has_fire)
    fire = F.col(has_fire)
    recompute = fire & (((F.col("run_pos") - 1) % F.lit(every_n_fire)) == 0)
    df = df.withColumn(recompute_col, recompute)
    if heatmap_col is not None:
        w = Window.partitionBy(key, "run_id").orderBy(seq).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        fresh = F.when(F.col(recompute_col), F.col(heatmap_col))
        reused = F.when(fire, F.last(fresh, ignorenulls=True).over(w))
        df = df.withColumn(heatmap_col, reused)
    return df
