"""Serving API layer (reference `API/pastapi.py:168-219` parity, M6/M7).

The reference runs FastAPI over a pandas frame it re-collects at startup
and a model it re-downloads per process, picking the LATEST model folder
by lexicographic sort (`pastapi.py:70-87`).  This module keeps that
surface but Spark-shaped:

  - handlers are plain functions returning dicts, so they are testable
    without an HTTP stack and wire into ANY framework;
  - ``create_app`` is import-gated FastAPI glue (sandbox has no fastapi;
    the wiring is the same three routes the reference exposes);
  - model selection reproduces latest-by-lexicographic-path over a
    models root (timestamped subdirs sort correctly), with the
    reference's majority-class fallback when nothing is loadable;
  - every /predict logs through the APPEND-mode audit log
    (``lookup.log_prediction`` -- the reference overwrote one object per
    day, `pastapi.py:150,160`).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lookup import country_eta, log_prediction, point_lookup


def latest_model_path(models_root: str) -> str | None:
    """Latest model directory by lexicographic name (`pastapi.py:81`) --
    timestamped folders (yyyyMMdd-HHmmss) make lexicographic == newest.
    None when the root is empty/missing (caller falls back)."""
    if not os.path.isdir(models_root):
        return None
    dirs = sorted(d for d in os.listdir(models_root) if os.path.isdir(os.path.join(models_root, d)))
    return os.path.join(models_root, dirs[-1]) if dirs else None


@dataclass
class ServingContext:
    """Process-lifetime serving state: one cached gold frame, one fitted
    model (or majority-class fallback), one append-only prediction log."""

    spark: SparkSession
    gold: DataFrame
    model: Any | None = None
    log_root: str | None = None
    majority_status: str | None = field(init=False, default=None)

    def __post_init__(self) -> None:
        self.gold = self.gold.cache()
        if self.model is None and "delivery_status" in self.gold.columns:
            # Reference fallback: DummyClassifier(most_frequent)
            # (`pastapi.py:73-76`) == always predict the majority class.
            top = (
                self.gold.groupBy("delivery_status")
                .count()
                .orderBy(F.desc("count"), F.asc("delivery_status"))
                .first()
            )
            self.majority_status = None if top is None else top["delivery_status"]

    @classmethod
    def from_paths(
        cls,
        spark: SparkSession,
        gold_path: str,
        models_root: str | None = None,
        log_root: str | None = None,
    ) -> "ServingContext":
        model = None
        path = latest_model_path(models_root) if models_root else None
        if path is not None:
            try:
                from pyspark.ml import PipelineModel

                model = PipelineModel.load(path)
            except Exception:
                model = None  # reference behavior: fall back, don't fail
        return cls(spark=spark, gold=spark.read.parquet(gold_path), model=model, log_root=log_root)


def handle_track(ctx: ServingContext, tracking_number: str) -> dict:
    """GET /track/{id}: point lookup (`pastapi.py:168-177`)."""
    rows = point_lookup(ctx.gold, tracking_number).limit(2).collect()
    if not rows:
        return {"found": False, "tracking_number": tracking_number}
    return {"found": True, **{k: str(v) for k, v in rows[0].asDict().items()}}


def handle_eta(ctx: ServingContext, country: str) -> dict:
    """GET /eta/{country}: coerced-mean ETA (`pastapi.py:204-210`)."""
    r = country_eta(ctx.gold, country).first()
    return {
        "country": country.upper(),
        "n_shipments": r["n_shipments"],
        "avg_delivery_days": r["avg_delivery_days"],
        "estimated_delivery_date": str(r["estimated_delivery_date"]),
    }


def handle_predict(ctx: ServingContext, features: dict) -> dict:
    """POST /predict: score one request through the FITTED pipeline (no
    per-request encoder re-fit -- the reference's train/serve-skew bug,
    `pastapi.py:134-141`) or the majority fallback; append to the audit
    log (M7)."""
    row = ctx.spark.createDataFrame(
        [
            (
                str(features.get("tracking_number", "unknown")),
                str(features.get("courier", "")),
                str(features.get("origin_country", "")),
                str(features.get("destination_country", "")),
                str(features.get("status", "")),
                float(features.get("shipment_weight", 0.0)),
                int(features.get("delivery_days", 0)),
            )
        ],
        "tracking_number string, courier string, origin_country string, "
        "destination_country string, status string, shipment_weight double, "
        "delivery_days bigint",
    )
    if ctx.model is not None:
        from ..ml.pipeline import score

        label: float | None = float(score(ctx.model, row).first()["predicted_label"])
        status, source = None, "model"
    else:
        label, status, source = None, ctx.majority_status, "majority_fallback"
    out = (
        row.withColumn("predicted_label", F.lit(label).cast("double"))
        .withColumn("predicted_status", F.lit(status).cast("string"))
        .withColumn("model_source", F.lit(source))
    )
    if ctx.log_root:
        log_prediction(out, ctx.log_root)
    return {
        "tracking_number": features.get("tracking_number", "unknown"),
        "predicted_label": label,
        "predicted_status": status,
        "model_source": source,
    }


def create_app(ctx: ServingContext):
    """FastAPI wiring (import-gated; the sandbox has no fastapi).  Routes
    mirror the reference: /track/{id}, /eta/{country}, /predict."""
    try:
        from fastapi import FastAPI
    except ImportError:
        return None

    app = FastAPI(title="lakehouse-serving")

    @app.get("/track/{tracking_number}")
    def track(tracking_number: str) -> dict:
        return handle_track(ctx, tracking_number)

    @app.get("/eta/{country}")
    def eta(country: str) -> dict:
        return handle_eta(ctx, country)

    @app.post("/predict")
    def predict(features: dict) -> dict:
        return handle_predict(ctx, features)

    return app
