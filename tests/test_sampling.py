"""Deterministic splitting + embedding storage-transform contracts."""

import math

import pytest

from pyspark.sql import functions as F

from firewatch_spark.operators import sampling
from tests.conftest import rows


def test_split_by_hash_deterministic_and_proportional(spark):
    df = spark.range(0, 20_000).selectExpr("id AS doc_id")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in rows(sampling.split_by_hash(df, fr))}
    b = {r["doc_id"]: r["split"] for r in rows(sampling.split_by_hash(df, fr))}
    assert a == b  # content-stable across runs
    counts = {s: sum(1 for v in a.values() if v == s) for s in fr}
    for s, f in fr.items():
        assert abs(counts[s] / 20_000 - f) < 0.01, (s, counts)
    # a different salt re-draws the assignment
    c = {r["doc_id"]: r["split"] for r in rows(sampling.split_by_hash(df, fr, salt="v2"))}
    assert c != a
    with pytest.raises(ValueError):
        sampling.split_by_hash(df, {"train": 0.5, "val": 0.1})


def test_unit_norm_and_int8_quantization(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in rows(
        sampling.with_int8_quantized(sampling.with_unit_norm(df))
    )}
    assert out[1]["unit"] == pytest.approx([0.6, 0.8])
    assert out[2]["unit"] == [0.0, 0.0]  # zero vector: no NaN
    assert out[1]["q8"] == [round(0.6 * 127), round(0.8 * 127)]
    assert out[3]["q8"] == [127, 0]
    # norm of every non-zero unit vector is 1
    n = rows(
        sampling.with_unit_norm(df).selectExpr(
            "vec_id",
            "aggregate(unit, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x) AS n2",
        ),
        "vec_id",
    )
    assert n[0]["n2"] == pytest.approx(1.0) and n[2]["n2"] == pytest.approx(1.0)
    # int8 dot approximates cosine: unit vecs (0.6,0.8)·(1,0) = 0.6
    q1, q3 = out[1]["q8"], out[3]["q8"]
    approx_cos = sum(x * y for x, y in zip(q1, q3)) / (127 * 127)
    assert math.isclose(approx_cos, 0.6, rel_tol=0.02)


def test_dsir_selects_target_like_docs(spark):
    """DSIR contract: docs sharing the target's vocabulary out-rank
    docs that don't, and exactly ceil(frac·N) rows survive with ranks
    1..n_keep."""
    target = spark.createDataFrame(
        [("alpha beta gamma delta",), ("beta gamma alpha beta",)], "text string"
    )
    pool = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),        # target-like
            (2, "beta gamma delta alpha"),  # target-like
            (3, "xray yankee zulu zulu"),   # off-distribution
            (4, "quebec romeo sierra"),     # off-distribution
        ],
        "doc_id long, text string",
    )
    out = rows(sampling.dsir_importance_sample(pool, target, keep_frac=0.5), "rank")
    assert [r["doc_id"] for r in out] in ([1, 2], [2, 1])
    assert [r["rank"] for r in out] == [1, 2]


def test_dsir_two_phase_rank_matches_naive_window(spark):
    """The range-bucket two-phase global rank is bit-identical to the
    one-task row_number() OVER (ORDER BY importance DESC, doc_id)."""
    from pyspark.sql import Window

    target = spark.createDataFrame(
        [("common words here",), ("more common words",)], "text string"
    )
    pool = spark.createDataFrame(
        [(i, f"common words tok{i % 7} tok{i % 5} here") for i in range(40)],
        "doc_id long, text string",
    )
    imp = sampling.dsir_importance(pool, target)
    w = Window.orderBy(F.desc("importance"), F.asc("doc_id"))
    naive = {
        r["doc_id"]: r["rk"]
        for r in rows(imp.withColumn("rk", F.row_number().over(w)))
    }
    two_phase = rows(sampling.dsir_importance_sample(pool, target, keep_frac=1.0))
    assert len(two_phase) == 40
    for r in two_phase:
        assert r["rank"] == naive[r["doc_id"]]


def test_pps_sample_certainty_stratum_and_count(spark):
    """PPS contracts: a row with weight >= W/n is ALWAYS selected (with
    selected_times proportional to its span), total selections across
    rows equal exactly n, and zero-weight rows are never selected."""
    rows_in = [(i, 10) for i in range(1, 21)] + [(99, 800), (100, 0)]
    df = spark.createDataFrame(rows_in, "doc_id long, n_chars long")
    out = sampling.pps_systematic_sample(df, n_keep=10, weight_col="n_chars")
    got = {r["doc_id"]: r["selected_times"] for r in out.collect()}
    # W = 1000, step = 100; doc 99 spans 800 -> exactly 8 multiples
    assert got[99] == 8
    assert 100 not in got
    assert sum(got.values()) == 10
