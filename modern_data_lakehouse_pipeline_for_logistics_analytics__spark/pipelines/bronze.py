"""Bronze: synthetic shipment generator (SURVEY.md S10).

Spark-native replacement for the reference's single-process Faker loop
(`Bronze_layer/extraction.py:65-111`): ``spark.range(n)`` + deterministic
hash-derived column expressions -- generation itself distributes across
executors, so fixture volume scales with the cluster instead of one
Python process.  Fully deterministic for a given (date, n): every field
derives from xxhash64(row id, salt) -- unlike the reference, whose
``random.*`` calls are unseeded (SURVEY.md section 5).

Schema matches FIXTURES.md A1 (the generator record at
`extraction.py:96-109`, checkpoint struct at `:80-94`), including the
reference's quirk of 2-letter codes in *_iso3 fields.  Edge rows the
reference cannot produce (null tag/city, unparseable timestamp, duplicate
tracking number) are planted at fixed row indices to pin cleaning
semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COURIERS = ["dhl", "fedex", "ups", "usps", "amazon", "bluedart", "correios", "delhivery", "dpd", "royalmail"]
TAGS = ["Pending", "InfoReceived", "InTransit", "OutForDelivery", "Delivered", "Exception", "FailedAttempt"]
MESSAGES = [
    "Shipment information received",
    "Departed from facility",
    "Arrived at sorting hub",
    "Out for delivery",
    "Delivered to recipient",
]
CITIES = ["Hamburg", "Mumbai", "Chicago", "Osaka", "Lyon", "Porto", "Leeds", "Quito"]
COUNTRIES = ["Germany", "India", "United States", "Japan", "France", "Portugal", "United Kingdom", "Ecuador"]
COUNTRY_CODES = ["DE", "IN", "US", "JP", "FR", "PT", "GB", "EC"]


def _pick(options: list[str], h: F.Column) -> F.Column:
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.pmod(h, F.lit(len(options))) + 1).cast("int"))


def generate_bronze_day(spark: SparkSession, date_str: str, n: int = 1000) -> DataFrame:
    """One day of nested shipment records (FIXTURES.md A1), deterministic
    in (date_str, n)."""
    df = spark.range(n).withColumnRenamed("id", "row_id")
    h = lambda salt: F.xxhash64(F.col("row_id"), F.lit(date_str), F.lit(salt))  # noqa: E731
    created = F.to_timestamp(F.lit(f"{date_str} 00:00:00")) + F.make_dt_interval(
        hours=F.pmod(h("ch"), 24).cast("int").cast("bigint"),
        mins=F.pmod(h("cm"), 60).cast("int").cast("bigint"),
    ) - F.make_dt_interval(hours=F.lit(24).cast("bigint"))
    delta_hours = (F.pmod(h("uh"), 72) + 1).cast("int")
    updated = created + F.make_dt_interval(hours=delta_hours.cast("bigint"))

    n_cp = (F.pmod(h("ncp"), 5) + 2).cast("int")  # 2-6 checkpoints
    checkpoints = F.transform(
        F.sequence(F.lit(0), n_cp - 1),
        lambda j: F.struct(
            _pick(MESSAGES, h("msg") + j).alias("message"),
            # planted edge: null city on ~1/20 shipments' checkpoints
            F.when(F.pmod(h("nullcity"), 20) == 0, F.lit(None).cast("string"))
            .otherwise(_pick(CITIES, h("city") + j))
            .alias("city"),
            _pick(COUNTRIES, h("cty") + j).alias("country"),
            F.date_format(
                created + F.make_dt_interval(hours=(j * 3).cast("bigint")),
                "yyyy-MM-dd'T'HH:mm:ss",
            ).alias("checkpoint_time"),
            _pick(TAGS, h("cptag") + j).alias("tag"),
        ),
    )

    return df.select(
        F.concat(F.lit("ship-"), F.lit(date_str), F.lit("-"), F.col("row_id")).alias("id"),
        # planted edge: duplicate tracking number every 97th row
        F.when(
            F.col("row_id") % 97 == 0, F.lit("ZZ0000000000")
        ).otherwise(
            F.concat(
                _pick([chr(c) * 2 for c in range(65, 91)], h("tk")),
                F.lpad(F.pmod(h("tkn"), 10_000_000_000).cast("string"), 10, "0"),
            )
        ).alias("tracking_number"),
        _pick(COURIERS, h("slug")).alias("slug"),
        # planted edge: null tag every 53rd row (exercises fillna)
        F.when(F.col("row_id") % 53 == 0, F.lit(None).cast("string"))
        .otherwise(_pick(TAGS, h("tag")))
        .alias("tag"),
        F.date_format(created, "yyyy-MM-dd'T'HH:mm:ss").alias("created_at"),
        # planted edge: unparseable timestamp every 71st row
        F.when(F.col("row_id") % 71 == 0, F.lit("not-a-timestamp"))
        .otherwise(F.date_format(updated, "yyyy-MM-dd'T'HH:mm:ss"))
        .alias("updated_at"),
        _pick(COUNTRY_CODES, h("oc")).alias("origin_country_iso3"),
        _pick(COUNTRY_CODES, h("dc")).alias("destination_country_iso3"),
        F.concat(F.lit("Customer "), F.pmod(h("cust"), 5000).cast("string")).alias(
            "customer_name"
        ),
        (F.round(F.pmod(h("wt"), 1490) / 100.0 + 0.1, 2)).alias("shipment_weight_kg"),
        F.floor(delta_hours / 24).cast("int").alias("delivery_days"),
        checkpoints.alias("checkpoints"),
    )


def write_bronze_json(df: DataFrame, bronze_root: str, date_str: str, n_files: int = 4) -> str:
    """Write a date partition of bronze as multiline-readable JSON.

    The reference writes ONE json array per day (`extraction.py:122-128`),
    which caps read parallelism at 1 task/day; we emit ``n_files`` files
    (repartition before write) so the multiline scan parallelizes.
    """
    path = os.path.join(bronze_root, date_str)
    df.repartition(n_files).write.mode("overwrite").json(path)
    return path
