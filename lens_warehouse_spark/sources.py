"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API).

The reference ingests via HTTP POST into Datomic ([P src/lens/handler.clj];
/root/reference is empty — SURVEY.md §0); the Spark-native counterpart of
"a source the engine doesn't ship" is the DataSource V2 Python API: a
planner-visible source with a declared schema and EXPLICIT input
partitions, so Spark schedules one task per partition and the reads run
executor-side in parallel — the contract a 100 TB connector (REST shards,
Kafka segments, proprietary scan ranges) must satisfy. No driver-side
materialization: each partition generates only its own range.

The demo source is deterministic (id, md5(id)) rows so the DuckDB oracle
can regenerate it exactly — proving the partitioned reader produces the
declared relation, not just "some rows".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with siblings)

from lens_warehouse_spark.registry import register

_SYNTH_ROWS = 10_000
_SYNTH_PARTS = 8


def _register_synth_source(spark: SparkSession) -> None:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _RangePartition(InputPartition):
        def __init__(self, start: int, end: int):
            self.start, self.end = start, end

    class _SynthReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("rows", _SYNTH_ROWS))
            self.parts = int(options.get("partitions", _SYNTH_PARTS))
            # r8 adversarial pass: validate HERE, planner-side, where
            # the message names the option — partitions=0 used to die
            # as a bare ZeroDivisionError in partitions(), and a
            # negative rows silently produced an empty relation.
            if self.n < 0:
                raise ValueError(f"rows must be >= 0, got {self.n}")
            if self.parts < 1:
                raise ValueError(f"partitions must be >= 1, got {self.parts}")

        def partitions(self):
            step = (self.n + self.parts - 1) // self.parts
            return [
                _RangePartition(i, min(i + step, self.n))
                for i in range(0, self.n, step)
            ]

        def read(self, partition):
            import hashlib

            for i in range(partition.start, partition.end):
                yield (i, hashlib.md5(str(i).encode()).hexdigest())

    class SynthSource(DataSource):
        @classmethod
        def name(cls):
            return "lws_synth"

        def schema(self):
            return "id bigint, h string"

        def reader(self, schema):
            return _SynthReader(self.options)

    # idempotent: re-registering the same name just replaces it
    spark.dataSource.register(SynthSource)


@register(
    "s19_python_datasource",
    oracle=f"""
SELECT range AS id, md5(CAST(range AS VARCHAR)) AS h
FROM range({_SYNTH_ROWS})
WHERE range % 1000 < 3
""",
)
def s19_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_synth_source(spark)
    df = (
        spark.read.format("lws_synth")
        .option("rows", _SYNTH_ROWS)
        .option("partitions", _SYNTH_PARTS)
        .load()
    )
    return df.filter(F.col("id") % 1000 < 3)
