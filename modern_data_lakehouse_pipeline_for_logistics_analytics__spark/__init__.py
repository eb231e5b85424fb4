"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference logistics-lakehouse pipeline
(`sankojupradeep/Modern-Data-Lakehouse-Pipeline-for-Logistics-Analytics-`),
re-expressed Spark-first.

Layout:
    session    -- SparkSession factory (replaces the 5 copy-pasted config
                  blocks in the reference, e.g. Silver_tranformation.py:27-39)
    sources    -- readers/sinks (SURVEY.md section 2.1, S1-S9)
    operators  -- relational + north-star operators (sections 2.2-2.8)
    functions  -- scalar function helpers (section 2.8)
    plans      -- named query plans exposed through __spark_entry__
    streaming  -- incremental / event-time operators (section 2.9)
    pipelines  -- medallion bronze->silver->gold composition (section 3)
    ml         -- StringIndexer + RandomForest parity pipeline (section 2.10)
"""

__version__ = "0.1.0"
