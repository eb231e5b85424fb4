"""Delivery-prediction model (SURVEY.md section 2.10, M1-M6).

The reference trains a scikit-learn RandomForest on pandas
(`MLOPS/prediction.py:94-126`): per-column LabelEncoder (M1),
train_test_split 80/20 seed 42 (M2), 150 trees / depth 12 / seed 42 (M3),
accuracy + confusion matrix (M4), joblib to object storage (M5), and --
its worst bug -- re-fits encoders per serving request
(`API/pastapi.py:134-141`), so serving codes drift from training.

Spark ML equivalent: StringIndexer stages + VectorAssembler +
RandomForestClassifier inside ONE PipelineModel -- encoders are fitted
once and persist with the model, eliminating the train/serve skew by
construction.  Training distributes; no collect-to-driver of features.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.ml.feature import StringIndexer, VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Reference feature set (`prediction.py:102-112`): note it INCLUDES
#: ``status``, from which the label is deterministically derived
#: (`Silver_tranformation.py:107-111`) -- a target leak we reproduce for
#: parity and flag here; drop "status" for an honest model.
CATEGORICAL = ["courier", "origin_country", "destination_country", "status"]
NUMERIC = ["shipment_weight", "delivery_days"]
LABEL = "delivery_status"


def build_pipeline() -> Pipeline:
    """M1+M3 as one fitted unit (reference hyperparameters:
    `prediction.py:125-126`)."""
    stages = [
        StringIndexer(inputCol=c, outputCol=f"{c}_idx", handleInvalid="keep")
        for c in CATEGORICAL
    ]
    stages.append(
        StringIndexer(inputCol=LABEL, outputCol="label", handleInvalid="error")
    )
    stages.append(
        VectorAssembler(
            inputCols=[f"{c}_idx" for c in CATEGORICAL] + NUMERIC,
            outputCol="features",
            handleInvalid="keep",
        )
    )
    stages.append(
        RandomForestClassifier(
            featuresCol="features",
            labelCol="label",
            numTrees=150,
            maxDepth=12,
            seed=42,
        )
    )
    return Pipeline(stages=stages)


def train_delivery_model(
    df_silver: DataFrame,
) -> tuple[PipelineModel, DataFrame, DataFrame]:
    """M2+M3: dedupe to shipment grain (`prediction.py:99`), drop
    null-label rows (`:97`), 80/20 split seed 42 (`:119`), fit.
    Returns (model, train, test)."""
    data = (
        df_silver.na.drop(subset=[LABEL])
        .na.fill({"shipment_weight": 0.0, "delivery_days": 0})
        .dropDuplicates(["tracking_number"])
        .select(*CATEGORICAL, *NUMERIC, LABEL, "tracking_number")
    )
    train, test = data.randomSplit([0.8, 0.2], seed=42)
    model = build_pipeline().fit(train)
    return model, train, test


def evaluate(model: PipelineModel, test: DataFrame) -> dict:
    """M4: accuracy + confusion matrix (computed distributed, not via
    sklearn on a collected frame)."""
    pred = model.transform(test)
    acc = MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName="accuracy"
    ).evaluate(pred)
    confusion = {
        (r.label, r.prediction): r["count"]
        for r in pred.groupBy("label", "prediction").count().collect()
    }
    return {"accuracy": acc, "confusion": confusion}


def score(model: PipelineModel, rows: DataFrame) -> DataFrame:
    """M6: scoring operator -- the fitted pipeline (with its encoders)
    applied to arbitrary rows; no per-request re-fit."""
    return model.transform(rows).select(
        "tracking_number", F.col("prediction").alias("predicted_label")
    )
