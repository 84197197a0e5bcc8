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
