"""Dataset splitting and embedding storage transforms — the remaining
glue a training-data pipeline needs between cleaning and training.

All deterministic (md5-based), all pure Column algebra, all
embarrassingly parallel: no shuffle, no UDF, no RNG state — the same
row lands in the same split on every run and every cluster, which is
what makes 100 TB dataset versioning reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_by_hash(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/validation/test assignment: the first 8 hex
    chars of md5(salt|id) map to [0, 1); cumulative fraction boundaries
    pick the split.  Content-stable (re-runs and backfills agree),
    salt-able (a new salt re-draws the assignment), and exact in
    expectation — no sampleBy / RNG-seed fragility."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")).cast("binary")), 1, 8),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**8))
    )
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(out_col, expr)


def with_unit_norm(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "unit"
) -> DataFrame:
    """L2-normalize an array<float> column (cosine search over unit
    vectors reduces to dot products).  Zero vectors pass through as
    zeros instead of NaN."""
    n2 = F.expr(
        f"aggregate({vec_col}, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    )
    return df.withColumn("_n2", n2).withColumn(
        out_col,
        F.expr(
            f"CASE WHEN _n2 = 0.0 THEN transform({vec_col}, x -> CAST(0.0 AS DOUBLE)) "
            f"ELSE transform({vec_col}, x -> CAST(x AS DOUBLE) / sqrt(_n2)) END"
        ),
    ).drop("_n2")


def with_int8_quantized(
    df: DataFrame, vec_col: str = "unit", out_col: str = "q8", scale: int = 127
) -> DataFrame:
    """Symmetric int8 quantization of a unit-normalized vector
    (x → ⌊x·127 + 0.5⌋, clamped): 4× smaller storage, and int8 dot
    products approximate the cosine.  Dequantize with `x / 127.0`.

    Rounding is floor(x·s + 0.5) — "half toward +∞" — rather than
    engine round(): floor of an identical double is identical in every
    engine, while round() tie/representation behavior differs between
    Spark (BigDecimal HALF_UP) and other engines, which would break the
    DuckDB oracle's bit-parity."""
    return df.withColumn(
        out_col,
        F.expr(
            f"transform({vec_col}, x -> CAST(greatest(-{scale}.0, "
            f"least({scale}.0, floor(CAST(x AS DOUBLE) * {scale} + 0.5d))) AS TINYINT))"
        ),
    )
