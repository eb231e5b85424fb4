"""Serving API layer (reference `API/pastapi.py:70-219` parity): latest
model selection, framework-free handlers, fallback + append-log behavior.
FastAPI wiring itself is import-gated (no fastapi in the sandbox)."""

from __future__ import annotations

import pytest

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.pipelines.bronze import (
    generate_bronze_day,
)
from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.pipelines.silver import (
    silver_transform,
)
from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.serve.api import (
    ServingContext,
    create_app,
    handle_eta,
    handle_predict,
    handle_track,
    latest_model_path,
)


@pytest.fixture(scope="module")
def silver(spark):
    return silver_transform(generate_bronze_day(spark, "2024-03-01", 300), "2024-03-01").cache()


def test_latest_model_path_lexicographic(tmp_path):
    root = tmp_path / "models"
    assert latest_model_path(str(root)) is None  # missing root -> fallback
    for d in ("20240101-000000", "20240301-120000", "20240215-090000"):
        (root / d).mkdir(parents=True)
    assert latest_model_path(str(root)).endswith("20240301-120000")


def test_handlers_with_fallback_model(spark, silver, tmp_path):
    gold_path = str(tmp_path / "gold")
    silver.write.parquet(gold_path)
    log_root = str(tmp_path / "plog")
    ctx = ServingContext.from_paths(
        spark, gold_path, models_root=str(tmp_path / "nomodels"), log_root=log_root
    )
    assert ctx.model is None and ctx.majority_status is not None

    some = silver.select("tracking_number").first().tracking_number
    hit = handle_track(ctx, some)
    assert hit["found"] and hit["tracking_number"] == some
    assert handle_track(ctx, "NOPE0000000") == {
        "found": False,
        "tracking_number": "NOPE0000000",
    }

    country = silver.select("destination_country").first().destination_country
    eta = handle_eta(ctx, country.lower())  # case-insensitive (P6)
    assert eta["n_shipments"] > 0 and eta["estimated_delivery_date"]

    out = handle_predict(ctx, {"tracking_number": "T1", "courier": "DHL"})
    assert out["model_source"] == "majority_fallback"
    assert out["predicted_status"] == ctx.majority_status
    # M7: append, never overwrite
    handle_predict(ctx, {"tracking_number": "T2"})
    log = spark.read.parquet(log_root)
    assert log.count() == 2
    assert set(r.tracking_number for r in log.collect()) == {"T1", "T2"}


def test_handle_predict_with_real_model(spark, silver, tmp_path):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.ml.pipeline import (
        train_delivery_model,
    )

    model, _, _ = train_delivery_model(silver)
    root = tmp_path / "models" / "20240301-120000"
    model.write().overwrite().save(str(root))
    gold_path = str(tmp_path / "gold")
    silver.write.parquet(gold_path)
    ctx = ServingContext.from_paths(
        spark, gold_path, models_root=str(tmp_path / "models")
    )
    assert ctx.model is not None
    out = handle_predict(
        ctx,
        {
            "tracking_number": "TX9",
            "courier": "DHL",
            "origin_country": "India",
            "destination_country": "USA",
            "status": "delivered",
            "shipment_weight": 3.5,
            "delivery_days": 4,
        },
    )
    assert out["model_source"] == "model"
    assert isinstance(out["predicted_label"], float)


def test_create_app_import_gated(spark, silver, tmp_path):
    gold_path = str(tmp_path / "gold")
    silver.write.parquet(gold_path)
    ctx = ServingContext.from_paths(spark, gold_path)
    app = create_app(ctx)
    try:
        import fastapi  # noqa: F401

        assert app is not None
    except ImportError:
        assert app is None
