"""Silver: flatten / clean / conform (SURVEY.md section 3.1).

Reproduces the dataflow semantics of
`Silver_layer/Silver_tranformation.py:76-114`:

    explode(checkpoints) -> 14-column projection with casts/aliases and
    struct-field access -> fillna {status, checkpoint_city,
    checkpoint_country: UNKNOWN} -> delivery_status CASE -> audit columns.

One narrow pipeline -- no shuffle; wrong timestamps become NULL via
try_to_timestamp (the reference ran Spark 3.5 with ANSI off, where plain
to_timestamp nulls; Spark 4 ANSI mode would throw), planted dupes/nulls survive to be
handled downstream.  The same function serves batch AND Structured
Streaming (streaming/ingest.py) -- it is a pure DataFrame->DataFrame map.

Known reference behaviors deliberately kept: plain explode drops
shipments with null/empty checkpoint arrays (`:78`; generator guarantees
>= 2, `extraction.py:80`); delivery_status counts OUTFORDELIVERY as
SUCCESS (`:109`).  Behavior fixed, not copied: the double count()
recompute (`:71,124`) -- callers count once from write metrics if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

#: Explicit bronze schema (FIXTURES.md A1) -- no inference pass at scale.
BRONZE_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("tracking_number", StringType()),
        StructField("slug", StringType()),
        StructField("tag", StringType()),
        StructField("created_at", StringType()),
        StructField("updated_at", StringType()),
        StructField("origin_country_iso3", StringType()),
        StructField("destination_country_iso3", StringType()),
        StructField("customer_name", StringType()),
        StructField("shipment_weight_kg", StringType()),
        StructField("delivery_days", StringType()),
        StructField(
            "checkpoints",
            ArrayType(
                StructType(
                    [
                        StructField("message", StringType()),
                        StructField("city", StringType()),
                        StructField("country", StringType()),
                        StructField("checkpoint_time", StringType()),
                        StructField("tag", StringType()),
                    ]
                )
            ),
        ),
    ]
)

SILVER_COLUMNS = [
    "shipment_id",
    "courier",
    "status",
    "tracking_number",
    "origin_country",
    "destination_country",
    "shipment_weight",
    "delivery_days",
    "created_at",
    "updated_at",
    "checkpoint_city",
    "checkpoint_country",
    "checkpoint_message",
    "checkpoint_time",
    "delivery_status",
    "load_date",
    "load_timestamp",
]

SUCCESS_STATUSES = ["DELIVERED", "OUTFORDELIVERY"]


def read_bronze(
    spark: SparkSession, path: str, multiline: bool = False
) -> DataFrame:
    """Bronze scan with the explicit schema.  ``multiline=True`` reads the
    reference's one-array-per-file layout (`Silver_tranformation.py:62`);
    default reads JSON-lines (splittable -- the scale layout)."""
    reader = spark.read.schema(BRONZE_SCHEMA)
    if multiline:
        reader = reader.option("multiline", "true")
    return reader.json(path)


def silver_transform(df_bronze: DataFrame, load_date: str) -> DataFrame:
    """`Silver_tranformation.py:76-114` semantics, one narrow pass."""
    exploded = df_bronze.withColumn("checkpoint", F.explode("checkpoints"))
    projected = exploded.select(
        F.col("id").alias("shipment_id"),
        F.trim(F.upper(F.col("slug"))).alias("courier"),
        F.trim(F.upper(F.col("tag"))).alias("status"),
        F.col("tracking_number"),
        F.col("origin_country_iso3").alias("origin_country"),
        F.col("destination_country_iso3").alias("destination_country"),
        F.col("shipment_weight_kg").cast("double").alias("shipment_weight"),
        F.col("delivery_days").cast("int").alias("delivery_days"),
        F.try_to_timestamp(F.col("created_at")).alias("created_at"),
        F.try_to_timestamp(F.col("updated_at")).alias("updated_at"),
        F.col("checkpoint.city").alias("checkpoint_city"),
        F.col("checkpoint.country").alias("checkpoint_country"),
        F.col("checkpoint.message").alias("checkpoint_message"),
        F.try_to_timestamp(F.col("checkpoint.checkpoint_time")).alias("checkpoint_time"),
    )
    cleaned = projected.na.fill(
        {"status": "UNKNOWN", "checkpoint_city": "UNKNOWN", "checkpoint_country": "UNKNOWN"}
    )
    return (
        cleaned.withColumn(
            "delivery_status",
            F.when(F.col("status").isin(*SUCCESS_STATUSES), "SUCCESS").otherwise("PENDING"),
        )
        .withColumn("load_date", F.lit(load_date))
        .withColumn("load_timestamp", F.current_timestamp())
    )


def write_silver(df: DataFrame, silver_root: str) -> None:
    """Idempotent partitioned sink (`Silver_tranformation.py:121` semantics
    + dynamic partition overwrite: re-running one date never clobbers
    others)."""
    df.write.mode("overwrite").partitionBy("load_date").parquet(silver_root)


def with_quality_observation(df: DataFrame):
    """Attach zero-extra-pass data-quality counters to a silver frame.

    ``df.observe`` evaluates the metric expressions DURING whatever
    action consumes the frame (the silver write), so row counts, null
    rates, and rule-hit counts cost nothing beyond the job already
    running -- at 100 TB a separate validation scan would double the
    pipeline's read volume.  Returns ``(observed_df, observation)``;
    read ``observation.get`` AFTER the action completes.
    """
    from pyspark.sql import Observation

    obs = Observation("silver_quality")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("checkpoint_time").isNull().cast("long")).alias("null_checkpoint_time"),
        F.sum(F.col("created_at").isNull().cast("long")).alias("null_created_at"),
        F.sum((F.col("status") == "UNKNOWN").cast("long")).alias("unknown_status"),
        F.sum((F.col("delivery_status") == "SUCCESS").cast("long")).alias("n_success"),
    )
    return observed, obs


def write_silver_observed(df: DataFrame, silver_root: str) -> dict:
    """:func:`write_silver` with quality counters captured from the SAME
    job (no second scan); returns the metrics dict."""
    observed, obs = with_quality_observation(df)
    write_silver(observed, silver_root)
    return dict(obs.get)
