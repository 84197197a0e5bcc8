"""Join-family operators the reference lacks — as-of join, range join,
windowed top-k — declared Spark-first (SURVEY.md §2.6 parity-plus).

Scale notes:
* `asof_join` uses the union+LOCF trick instead of a pairwise join: one
  shuffle on the key, a sort within partitions, zero row explosion.
  This is THE scalable as-of plan — a naive `left join + max` explodes
  on popular keys; this never materializes pairs at all.
* `range_join` is an equi-join on the key with the range as a residual
  predicate — Spark pushes the equi part into the shuffle/broadcast
  join and evaluates the band filter inline.
* `topk_per_group` is the classic row_number window; per-group heaps
  happen inside the sort, no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    seq: str,
    value_cols: list[str],
    strict: bool = True,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the latest right row with the same key
    and right.seq < left.seq (strict) or <= (non-strict).

    Union both sides with a side tag, sort per key by (seq, side), then
    forward-fill the right side's values — the carried value at each
    left row is exactly the as-of match.  With unique seq values and
    strict=True the right side sorts before the left at equal seq never
    occurring; for <= semantics the tag orders right rows first.
    """
    lcols = left.columns
    # side ordering at equal seq: strict puts right rows *after* left
    # (not yet visible to LOCF); non-strict puts them first.
    tag_right = 1 if strict else 0
    l_tagged = left.select(
        F.col(key), F.col(seq), F.lit(1 - tag_right).alias("_side"),
        F.struct(*[F.col(c) for c in lcols]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        F.col(key), F.col(seq), F.lit(tag_right).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(key)
        .orderBy(seq, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in value_cols
        ],
    )
    out = filled.filter(F.col("_lrow").isNotNull())
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in lcols],
        *[F.col(f"{prefix}{c}") for c in value_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_cond: Column,
    range_cond: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-join + residual range predicate; thin declarative wrapper
    that keeps the equi key visible to Catalyst so the physical plan is
    a hash/sort-merge join with an inline band filter."""
    return left.join(right, key_cond & range_cond, how)


def topk_per_group(
    df: DataFrame,
    group: str,
    order_by: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Windowed top-k: deterministic only if order_by is a total order
    (callers must append a unique tie-break column)."""
    w = Window.partitionBy(group).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w).cast("long")).filter(
        F.col(rank_col) <= k
    )
