"""Gold: star schema + metrics (SURVEY.md section 3.2).

Reproduces `Gold_layer/starschema.py:75-146`: 4 dims, 2 facts, 1
pre-aggregated courier-metrics table.  Deliberate divergences (SURVEY.md
section 4):

  - Surrogate keys are deterministic xxhash64(natural key), not
    ``monotonically_increasing_id`` (`starschema.py:75`) whose values
    depend on partition layout and renumber on every re-run.
  - The silver scan is cached once and reused by all 7 outputs; the
    reference re-scans the parquet up to 7x (`starschema.py:59` vs writes
    `:76-146`).
  - Everything stays typed parquet; the reference's CSV sink erases types
    (`starschema.py:76` etc., SURVEY.md section 1.3).  CSV remains an
    optional egress via sources.writers.write_csv.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dims import dim_with_hashed_key


def build_gold_tables(df_silver: DataFrame) -> dict[str, DataFrame]:
    """All 7 gold outputs from one cached silver frame."""
    df = df_silver.cache()

    dims = {
        "dim_courier": dim_with_hashed_key(df, ["courier"], "courier_id"),
        "dim_location": dim_with_hashed_key(
            df, ["checkpoint_city", "checkpoint_country"], "location_id"
        ),
        "dim_date": dim_with_hashed_key(
            df.select(F.to_date("created_at").alias("date")), ["date"], "date_id"
        ),
        "dim_shipment_status": dim_with_hashed_key(df, ["status"], "status_id"),
    }

    # fact_shipment grain: one row per shipment (`starschema.py:105-116`
    # projects shipment-level columns off the exploded frame, which leaves
    # one row per checkpoint -- we keep its column set but dedupe to the
    # declared grain deterministically).
    fact_shipment = df.select(
        "tracking_number",
        "courier",
        "origin_country",
        "destination_country",
        "shipment_weight",
        "delivery_days",
        "status",
        "created_at",
        "updated_at",
        "delivery_status",
    ).dropDuplicates(["tracking_number", "courier", "created_at"])

    fact_tracking_event = df.select(
        "tracking_number",
        "checkpoint_city",
        "checkpoint_country",
        "checkpoint_message",
        "checkpoint_time",
        "courier",
        "status",
        "updated_at",
    )

    # `starschema.py:137-145` exactly: distinct tracking numbers, DELIVERED
    # count, 2dp avg delivery days, success pct.
    courier_summary = (
        df.groupBy("courier")
        .agg(
            F.countDistinct("tracking_number").alias("total_shipments"),
            F.count(F.when(F.col("status") == "DELIVERED", True)).alias("delivered_shipments"),
            F.round(F.avg("delivery_days"), 2).alias("avg_delivery_days"),
        )
        .withColumn(
            "delivery_success_pct",
            F.round(F.col("delivered_shipments") / F.col("total_shipments") * 100, 2),
        )
    )

    return {
        **dims,
        "fact_shipment": fact_shipment,
        "fact_tracking_event": fact_tracking_event,
        "fact_courier_metrics": courier_summary,
    }


def write_gold(tables: dict[str, DataFrame], gold_root: str) -> None:
    for name, tdf in tables.items():
        tdf.write.mode("overwrite").parquet(f"{gold_root}/{name}")
