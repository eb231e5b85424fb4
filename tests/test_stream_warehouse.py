"""Exactly-once streaming egress to a DB-API warehouse: batch inserts
and the ledger commit atomically; a replayed batch (fresh checkpoint
over the same files after the ledger already has its id) inserts ZERO
duplicate rows."""

from __future__ import annotations

import sqlite3

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.streaming.ingest import (
    stream_to_warehouse_exactly_once,
)

SCHEMA = "k long, v double"


def test_exactly_once_under_replay(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("xo"))
    in_dir, db = f"{root}/in", f"{root}/wh.db"

    spark.createDataFrame([(1, 1.0), (2, 2.0)], SCHEMA).write.parquet(f"{in_dir}/b1")

    con_factory = lambda: sqlite3.connect(db)  # noqa: E731

    stream = spark.readStream.schema(SCHEMA).parquet(f"{in_dir}/*")
    stream_to_warehouse_exactly_once(stream, con_factory, "gold", f"{root}/ckpt1")

    con = sqlite3.connect(db)
    assert con.execute('SELECT COUNT(*) FROM "gold"').fetchone()[0] == 2
    assert con.execute('SELECT COUNT(*) FROM "__committed_batches"').fetchone()[0] == 1
    con.close()

    # Replay: a FRESH checkpoint re-delivers batch 0 over the same files
    # -- the ledger hit must skip the insert entirely (no duplicates).
    stream2 = spark.readStream.schema(SCHEMA).parquet(f"{in_dir}/*")
    stream_to_warehouse_exactly_once(stream2, con_factory, "gold", f"{root}/ckpt2")
    con = sqlite3.connect(db)
    assert con.execute('SELECT COUNT(*) FROM "gold"').fetchone()[0] == 2
    con.close()

    # New data through the ORIGINAL checkpoint lands as the next batch.
    spark.createDataFrame([(3, 3.0)], SCHEMA).write.parquet(f"{in_dir}/b2")
    stream3 = spark.readStream.schema(SCHEMA).parquet(f"{in_dir}/*")
    stream_to_warehouse_exactly_once(stream3, con_factory, "gold", f"{root}/ckpt1")
    con = sqlite3.connect(db)
    assert con.execute('SELECT COUNT(*) FROM "gold"').fetchone()[0] == 3
    assert con.execute('SELECT COUNT(*) FROM "__committed_batches"').fetchone()[0] == 2
    con.close()
