"""ML pipeline (M1-M6) and serving-operator (P5/P6/A8/F12/M7) tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.pipelines.bronze import (
    generate_bronze_day,
)
from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.pipelines.gold import (
    build_gold_tables,
)
from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.pipelines.silver import (
    silver_transform,
)


@pytest.fixture(scope="module")
def silver(spark):
    return silver_transform(generate_bronze_day(spark, "2024-03-01", 400), "2024-03-01").cache()


@pytest.fixture(scope="module")
def gold_fact(spark, silver):
    return build_gold_tables(silver)["fact_shipment"].cache()


def test_ml_train_eval_save_load(spark, silver, tmp_path_factory):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.ml.pipeline import (
        evaluate,
        score,
        train_delivery_model,
    )
    from pyspark.ml import PipelineModel

    model, train, test = train_delivery_model(silver)
    metrics = evaluate(model, test)
    assert 0.0 <= metrics["accuracy"] <= 1.0
    assert sum(metrics["confusion"].values()) == test.count()

    # M5: persistence round-trip -> identical predictions (the encoders
    # travel WITH the model; no per-request re-fit as in pastapi.py:139).
    path = str(tmp_path_factory.mktemp("model")) + "/rf"
    model.write().overwrite().save(path)
    loaded = PipelineModel.load(path)
    a = {(r.tracking_number, r.predicted_label) for r in score(model, test).collect()}
    b = {(r.tracking_number, r.predicted_label) for r in score(loaded, test).collect()}
    assert a == b


def test_point_lookup(gold_fact):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.serve.lookup import (
        point_lookup,
    )

    some = gold_fact.select("tracking_number").first().tracking_number
    hit = point_lookup(gold_fact, some).collect()
    assert len(hit) >= 1 and all(r.tracking_number == some for r in hit)
    assert point_lookup(gold_fact, "NOPE0000000").count() == 0


def test_country_eta(gold_fact):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.serve.lookup import (
        country_eta,
    )

    country = gold_fact.select("destination_country").first().destination_country
    row = country_eta(gold_fact, country.lower()).collect()[0]  # case-insensitive (P6)
    want = gold_fact.filter(F.col("destination_country") == country).agg(
        F.round(F.avg("delivery_days"), 2)
    ).collect()[0][0]
    assert row.n_shipments > 0 and row.avg_delivery_days == want
    assert row.estimated_delivery_date is not None


def test_prediction_log_appends(spark, tmp_path_factory):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.serve.lookup import (
        log_prediction,
    )

    root = str(tmp_path_factory.mktemp("log")) + "/predictions"
    row = spark.createDataFrame([("TN1", "SUCCESS")], ["tracking_number", "predicted"])
    log_prediction(row, root)
    log_prediction(row, root)  # M7: second request must APPEND, not overwrite
    assert spark.read.parquet(root).count() == 2
