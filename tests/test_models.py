"""M1 backend registry + UDF-path/column-path agreement."""

import pytest
from pyspark.sql import functions as F

from firewatch_spark import models
from tests.conftest import rows


def _frames(spark, n=20):
    return spark.createDataFrame(
        [(i, f"v{i % 3}", 640, 480) for i in range(n)],
        "seq_id long, video_id string, w int, h int",
    )


def test_registry_lookup_and_legacy_alias():
    assert models.get_backend("surrogate").name == "surrogate"
    # legacy alias resolution mirrors the reference dispatcher
    assert models.get_backend("fire-detect-nn").name == "surrogate"
    with pytest.raises(ValueError, match="unknown model backend"):
        models.get_backend("nope")


def test_torch_stubs_registered_but_not_runnable():
    import pandas as pd

    for name in ("densenet", "yolov8"):
        b = models.get_backend(name)
        with pytest.raises(NotImplementedError):
            b.predict_batch(pd.DataFrame({"seq": [1], "width": [1], "height": [1]}))


def test_udf_path_equals_column_path(spark):
    df = _frames(spark)
    col_out = rows(
        models.with_prediction(df, "surrogate", "seq_id", "w", "h", use_udf=False),
        "seq_id",
    )
    udf_out = rows(
        models.with_prediction(df, "surrogate", "seq_id", "w", "h", use_udf=True),
        "seq_id",
    )
    assert len(col_out) == len(udf_out) == 20
    for a, b in zip(col_out, udf_out):
        assert a["prediction"] == b["prediction"], (a, b)


def test_udf_path_preserves_passthrough_columns(spark):
    df = _frames(spark)
    out = models.with_prediction(df, "surrogate", "seq_id", "w", "h", use_udf=True)
    assert out.columns == ["seq_id", "video_id", "w", "h", "prediction"]
    got = rows(out.select("seq_id", "video_id"), "seq_id")
    assert got[5] == {"seq_id": 5, "video_id": "v2"}


def test_prediction_schema_contract(spark):
    out = models.with_prediction(_frames(spark), "surrogate", "seq_id", "w", "h")
    pred = out.schema["prediction"].dataType
    assert [f.name for f in pred.fields] == [
        "has_fire", "fire_probability", "no_fire_probability", "model_type", "detections",
    ]


# --- round 13: iterator-form batched inference (VERDICT r12 #4) ------


def test_iter_path_equals_scalar_udf_path(spark):
    df = _frames(spark)
    scalar_out = rows(
        models.with_prediction(df, "surrogate", "seq_id", "w", "h", use_udf=True),
        "seq_id",
    )
    iter_out = rows(
        models.with_prediction_iter(df, "surrogate", "seq_id", "w", "h"),
        "seq_id",
    )
    assert len(scalar_out) == len(iter_out) == 20
    for a, b in zip(scalar_out, iter_out):
        assert a["prediction"] == b["prediction"], (a, b)


def test_iter_path_single_arrow_python_roundtrip(spark):
    # the partition must round-trip through ONE Python worker node —
    # one ArrowEvalPython, no row-at-a-time BatchEvalPython anywhere
    out = models.with_prediction_iter(
        _frames(spark), "surrogate", "seq_id", "w", "h"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "BatchEvalPython" not in plan, plan


def test_iter_fn_setup_runs_once_per_partition(monkeypatch):
    # the iterator form's reason to exist: backend resolution (a real
    # backend's weight load) happens ONCE before the batch loop, not
    # once per Arrow batch
    import pandas as pd

    calls = []
    real_get = models.get_backend

    def counting_get(name):
        calls.append(name)
        return real_get(name)

    monkeypatch.setattr(models, "get_backend", counting_get)
    fn = models.make_iter_predict_fn("surrogate")
    batches = [
        (
            pd.Series([i, i + 1]),
            pd.Series([640, 640]),
            pd.Series([480, 480]),
        )
        for i in range(0, 6, 2)
    ]
    outs = list(fn(iter(batches)))
    assert len(outs) == 3 and all(len(o) == 2 for o in outs)
    assert calls == ["surrogate"]
