"""Model-backend registry (M1) and the Arrow-batched inference path (M2').

The reference's extensibility point is a config-driven dispatcher with a
uniform ``predict(frame) -> dict`` contract
(reference streams/models/dispatcher.py:34-87).  Here the same contract is
a *batch* function ``predict_batch(pd.DataFrame) -> pd.DataFrame`` wrapped
in a struct-returning scalar pandas UDF: the model loads once per Python
worker (executor singleton), Arrow ships columnar batches, and batch size is
governed by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — which is
exactly the batched-inference win the reference deferred
(reference docs/PERFORMANCE.md:148-150).

Two execution paths per backend, both returning the same answer:

* **column path** — pure Column expressions (JVM-side, whole-stage
  codegen); available for the deterministic surrogate and any backend
  whose math is expressible in Spark SQL.  This is the 100 TB fast path.
* **udf path** — Arrow-batched pandas UDF; required for real torch/ONNX
  backends.  The surrogate implements both so the oracle can prove
  udf-output == column-output == DuckDB SQL.

Real ML backends (DenseNet M2, YOLO M4, GradCAM M3 — reference
streams/models/fire_detect_nn.py:93-175, yolov8.py:115-162,
gradcam.py:19-90) need torch, which is not in this container; they are
registered as clearly-marked stubs with the exact same signature so the
plumbing (schema, batching, registry) is real and tested.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from . import surrogate

# Prediction schema — the uniform backend output contract
# (reference fire_detect_nn.py:167-175 / yolov8.py:157-162), minus the
# wall-clock timestamp (excluded from comparisons, SURVEY.md §7).
PREDICTION_SCHEMA = StructType(
    [
        StructField("has_fire", BooleanType()),
        StructField("fire_probability", DoubleType()),
        StructField("no_fire_probability", DoubleType()),
        StructField("model_type", StringType()),
        StructField(
            "detections",
            ArrayType(
                StructType(
                    [
                        StructField("bbox", ArrayType(IntegerType())),
                        StructField("confidence", DoubleType()),
                        StructField("class", StringType()),
                        StructField("class_id", IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


@dataclass
class ModelBackend:
    """One entry in the registry (M1 contract)."""

    name: str
    # batch predict: input pandas DataFrame with columns the backend
    # declares in `input_cols`; returns PREDICTION_SCHEMA-shaped frame.
    predict_batch: Callable[[pd.DataFrame], pd.DataFrame]
    input_cols: tuple[str, ...] = ("seq", "width", "height")
    # optional JVM-side fast path: (df, col mapping) -> Column of
    # PREDICTION_SCHEMA struct
    column_expr: Callable[..., Column] | None = None
    options: dict = field(default_factory=dict)


_REGISTRY: dict[str, ModelBackend] = {}


def register_backend(backend: ModelBackend) -> None:
    _REGISTRY[backend.name] = backend


def get_backend(name: str) -> ModelBackend:
    """Config-driven lookup, mirroring the reference's dispatcher
    (streams/models/dispatcher.py:34-87) including its legacy-alias
    tolerance: unknown names raise with the available list."""
    key = name.lower().strip()
    if key in ("fire-detect-nn", "firedetectnn"):  # legacy aliases
        key = "surrogate" if "surrogate" in _REGISTRY else key
    if key not in _REGISTRY:
        raise ValueError(f"unknown model backend {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[key]


# ---------------------------------------------------------------------------
# Surrogate backend — deterministic, oracle-replayable (FIXTURES.md §2).


def _surrogate_predict_batch(pdf: pd.DataFrame, threshold: float = 0.5) -> pd.DataFrame:
    """Vectorized numpy implementation of the surrogate model.

    Identical arithmetic to surrogate.raw_probability (Knuth
    multiplicative hash) so the pandas-UDF path, the Column path, and
    the DuckDB oracle agree bit-for-bit.
    """
    import numpy as np

    seq = pdf["seq"].to_numpy(dtype="int64")
    raw = ((seq * surrogate.KNUTH) % surrogate.MOD) / float(surrogate.MOD)
    has_fire = raw >= threshold
    fire_p = np.where(has_fire, raw, 0.0)
    width = pdf["width"].to_numpy(dtype="int64")
    height = pdf["height"].to_numpy(dtype="int64")
    dets = [
        [
            {
                "bbox": [0, 0, int(w), int(h)],
                "confidence": float(r),
                "class": "fire",
                "class_id": 1,
            }
        ]
        if hf
        else []
        for r, hf, w, h in zip(raw, has_fire, width, height)
    ]
    return pd.DataFrame(
        {
            "has_fire": has_fire,
            "fire_probability": fire_p,
            "no_fire_probability": 1.0 - raw,
            "model_type": "surrogate",
            "detections": dets,
        }
    )


def _surrogate_column_expr(seq: Column, width: Column, height: Column) -> Column:
    raw = surrogate.raw_probability(seq)
    return F.struct(
        surrogate.has_fire(raw).alias("has_fire"),
        surrogate.fire_probability(raw).alias("fire_probability"),
        surrogate.no_fire_probability(raw).alias("no_fire_probability"),
        F.lit("surrogate").alias("model_type"),
        surrogate.synth_detection(raw, width, height).alias("detections"),
    )


register_backend(
    ModelBackend(
        name="surrogate",
        predict_batch=_surrogate_predict_batch,
        column_expr=_surrogate_column_expr,
    )
)


def _torch_stub(kind: str) -> Callable[[pd.DataFrame], pd.DataFrame]:
    def _predict(pdf: pd.DataFrame) -> pd.DataFrame:
        raise NotImplementedError(
            f"{kind} backend requires torch/ultralytics (not in this container); "
            "plumbing (schema/batching/registry) is exercised via the surrogate"
        )

    return _predict


# Stubs for the torch-backed contracts (M2/M4) — same registry shape.
register_backend(ModelBackend(name="densenet", predict_batch=_torch_stub("DenseNet121")))
register_backend(ModelBackend(name="yolov8", predict_batch=_torch_stub("YOLOv8")))


# ---------------------------------------------------------------------------
# Applying a backend to a DataFrame.


def with_prediction(
    df: DataFrame,
    backend_name: str,
    seq: str,
    width: str,
    height: str,
    out_col: str = "prediction",
    use_udf: bool = False,
) -> DataFrame:
    """Attach a PREDICTION_SCHEMA struct column via the chosen backend.

    ``use_udf=False`` (default) takes the JVM Column fast path when the
    backend has one; ``use_udf=True`` forces the Arrow-batched pandas-UDF
    path (the only option for real model backends).  Both paths are
    per-row transforms: no shuffle, fully parallel, and the binary/frame
    columns never need to leave the executor.
    """
    backend = get_backend(backend_name)
    if not use_udf and backend.column_expr is not None:
        return df.withColumn(
            out_col, backend.column_expr(F.col(seq), F.col(width), F.col(height))
        )

    predict_batch = backend.predict_batch

    # Scalar pandas UDF returning the prediction struct: ONLY the three
    # key columns cross the Arrow boundary; every passthrough column
    # stays JVM-side untouched.  (The previous mapInPandas wrapper
    # round-tripped the whole row through Python — measured ~2× slower
    # at sf0.1.)
    def _predict(seq_s, width_s, height_s):
        return predict_batch(
            pd.DataFrame({"seq": seq_s, "width": width_s, "height": height_s})
        )

    # manual annotations: `from __future__ import annotations` would
    # stringify inline hints and break pandas_udf signature inference
    _predict.__annotations__ = {
        "seq_s": pd.Series,
        "width_s": pd.Series,
        "height_s": pd.Series,
        "return": pd.DataFrame,
    }
    from pyspark.sql.functions import pandas_udf

    udf = pandas_udf(_predict, returnType=PREDICTION_SCHEMA)
    return df.withColumn(
        out_col,
        udf(
            F.col(seq).cast("long"),
            F.col(width).cast("long"),
            F.col(height).cast("long"),
        ),
    )
