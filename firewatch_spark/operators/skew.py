"""Skew-handling utilities — the "hot key" patterns SCALE.md promises.

AQE's skew-join splitting covers joins automatically (enabled in
session.py); what AQE cannot fix is a skewed HIGH-CARDINALITY aggregate
— ``countDistinct`` per key buffers every distinct value of a hot key
in one task.  `distinct_count_per_key` is the classic two-phase
rewrite: phase 1 dedups on (key, value), spreading a hot key's values
across the cluster because the shuffle key includes the value; phase 2
counts the deduped rows per key — a plain count whose partial
aggregation is map-side.  No single task ever holds a hot key's whole
value set.

`salted_agg` generalizes: a salt column splits each hot group into
`salt_buckets` sub-groups aggregated independently, then a final merge
combines the partials.  For purely algebraic aggs (count/sum/min/max)
Spark's map-side partial aggregation already achieves this; the
explicit salt pays off when per-group STATE is large (collect-like
buffers, large approx sketches) — the pattern is kept on the shelf
here, equality-tested so it can't drift.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(df: DataFrame, salt_buckets: int, random_salt: bool) -> Column:
    """The salt expression `salted_agg` uses, exposed for testing.
    Deterministic: ``pmod`` of the all-columns hash (uniform in
    [0, buckets), no ``abs`` Long.MIN_VALUE trap).  Random: partition
    id + a uniform draw, for hot keys made of identical rows."""
    if random_salt:
        return F.pmod(
            F.spark_partition_id()
            + F.floor(F.rand() * salt_buckets).cast("int"),
            F.lit(salt_buckets),
        )
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets)
    )


def distinct_count_per_key(
    df: DataFrame, key: str, value: str, out_col: str = "n_distinct"
) -> DataFrame:
    """Exact per-key distinct count that survives hot keys: dedup on
    (key, value) first — the shuffle spreads a hot key by value hash —
    then count per key (map-side partial).  Equivalent to
    ``groupBy(key).agg(countDistinct(value))`` for non-null values,
    minus the single-task value-set buffering."""
    deduped = df.select(key, value).where(F.col(value).isNotNull()).distinct()
    return deduped.groupBy(key).agg(F.count(F.lit(1)).alias(out_col))


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[Column, Callable[[Column], Column]]],
    salt_buckets: int = 16,
    random_salt: bool = False,
) -> DataFrame:
    """Two-phase aggregation over (key, salt) then key.

    `aggs` maps output name → (partial aggregate Column, merge
    function): e.g. ``{"n": (F.count(F.lit(1)), F.sum), "mx":
    (F.max("v"), F.max)}`` — the merge must be the partial's combiner
    (count/sum merge by sum; min/max by themselves).

    The default salt is a deterministic ``pmod`` of the row-value hash
    (``pmod``, not ``abs %``: ``abs(Long.MIN_VALUE)`` overflows and
    ``abs`` would halve the usable hash range — ADVICE r3): re-runs are
    stable and a hot key whose rows DIFFER splits evenly.  But the
    common skew shape is a hot key made of IDENTICAL duplicate rows —
    every copy hashes alike, lands in one salt bucket, and the split
    does nothing.  For that data pass ``random_salt=True``: the salt
    becomes ``(spark_partition_id, rand)``-derived, spreading exact
    duplicates at the cost of a nondeterministic (but
    merge-invariant — the final groupBy(key) re-combines whatever the
    split was) partial phase."""
    salted = df.withColumn(
        "_salt", salt_column(df, salt_buckets, random_salt).cast("int")
    )
    partial = salted.groupBy(key, "_salt").agg(
        *[c.alias(f"_p_{name}") for name, (c, _) in aggs.items()]
    )
    return partial.groupBy(key).agg(
        *[merge(F.col(f"_p_{name}")).alias(name) for name, (_, merge) in aggs.items()]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Hot-key-safe equi-join — the explicit salting form for when
    neither of the first two levers applies (broadcast: right side too
    big; AQE skew split: only kicks in for sort-merge with statistics,
    and cannot split a single monster KEY whose rows must still meet
    matching rows).

    The LEFT (skewed) side gets a deterministic row-hash salt in
    [0, salt_buckets); the RIGHT side is replicated once per salt
    value; the join key becomes (key, salt), so a hot key's rows
    spread over `salt_buckets` tasks instead of one straggler.  Cost:
    the right side shuffles salt_buckets× its size — worth it exactly
    when right ≪ the hot key's row volume.  Only inner and left joins
    are salt-safe (replicating the right side would duplicate
    right-outer unmatched rows); anything else raises."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_l = left.withColumn(
        "_salt", salt_column(left, salt_buckets, False).cast("int")
    )
    # ints in the array literal, no cast: a generator expression can't
    # be wrapped (Cast over explode is an AnalysisException)
    rep = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(int(i)) for i in range(salt_buckets)]))
    )
    return salted_l.join(rep, [key, "_salt"], how).drop("_salt")
