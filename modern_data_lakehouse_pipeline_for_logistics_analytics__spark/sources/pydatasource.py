"""Spark 4 Python Data Source API: a custom batch source with real
partition planning (SURVEY source surface S10's synthetic generator,
re-expressed as a first-class ``spark.read.format(...)`` source instead
of a driver-side createDataFrame).

Why this matters at scale: the Data Source API executes ``read`` on the
EXECUTORS, one task per ``InputPartition`` -- the generator (or an
external system fetch: REST pages, a message queue, a proprietary
store) parallelizes across the cluster and never materializes on the
driver, unlike the createDataFrame path it replaces for large synthetic
or external corpora.

Deterministic by construction: row content is a pure function of
``doc_id``, and doc_ids stripe across partitions, so any (rows,
partitions) configuration yields the same TABLE -- partitioning changes
only layout, never content (asserted in tests/test_pydatasource.py).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: Tiny word pool; content derives from doc_id alone (no RNG state).
_WORDS = [
    "table", "scan", "row", "batch", "merge", "shuffle", "join", "agg",
    "window", "spark", "value", "key", "part", "query", "fast", "slow",
]


def _doc_text(doc_id: int, n_words: int = 24) -> str:
    # Knuth multiplicative stepping: deterministic, id-seeded, no RNG.
    h = (doc_id * 2654435761) % (1 << 31)
    out = []
    for j in range(n_words):
        h = (h * 2654435761 + j) % (1 << 31)
        out.append(_WORDS[h % len(_WORDS)])
    return " ".join(out)


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs")`` after
    ``spark.dataSource.register(SyntheticDocsDataSource)``.

    Options: ``rows`` (total row count, default 100), ``partitions``
    (input partitions, default 4).
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, shard int"

    def reader(self, schema) -> "SyntheticDocsReader":
        return SyntheticDocsReader(self.options)


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_rows = int(options.get("rows", 100))
        self.n_parts = max(1, int(options.get("partitions", 4)))

    def partitions(self) -> list[InputPartition]:
        # One InputPartition per shard -> one executor task per shard;
        # this is the planning half the createDataFrame path lacks.
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition):
        shard = partition.value
        # Stripe doc_ids across shards: every (rows, partitions) config
        # produces the same table, only the layout differs.
        for doc_id in range(shard, self.n_rows, self.n_parts):
            yield (doc_id, _doc_text(doc_id), shard)


def register_synthetic_docs(spark) -> None:
    """Idempotent registration of the source with a session."""
    spark.dataSource.register(SyntheticDocsDataSource)
