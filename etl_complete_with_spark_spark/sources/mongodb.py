"""MongoDB source (S4-S6 of SURVEY §2.1).

Rebuilds the reference's Mongo extraction (shared_etls/etls/load_utils.py:49-103
range scan with optional explicit schema; :244-303 MIN probe; :365-457 MAX
probe) over the official ``mongodb`` Spark connector:

- Explicit ``StructType`` schema when the registry has one (the reference
  sets ``inferSchema=False`` at load_utils.py:89 to skip the inference
  sampling scan) — resolved via schema_registry.py.
- The slice predicate is declared as a DataFrame filter; the connector
  translates it to an aggregation-pipeline ``$match``, so the range is
  evaluated server-side, mirroring the reference's pushed ``between``.
- Parity note: the reference's Mongo filter is *inclusive* BETWEEN
  (P2, load_utils.py:90) while its JDBC predicate is half-open (P1) —
  we default to half-open for cross-source consistency and keep
  ``inclusive=True`` for exact reference behavior.

The connector jar is not in the test image; tests cover filter/option
construction, and schema plumbing is tested through schema_registry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..slicing import Interval


class MongoSource:
    def __init__(
        self,
        uri: str,
        database: str,
        collection: str,
        partition_column: str,
        schema: StructType | None = None,
        inclusive: bool = False,
    ):
        self.uri = uri
        self.database = database
        self.collection = collection
        self.partition_column = partition_column
        self.schema = schema
        self.inclusive = inclusive

    def describe(self) -> dict[str, str]:
        return {
            "connection.uri": self.uri,
            "database": self.database,
            "collection": self.collection,
        }

    def slice_condition(self, interval: Interval) -> Column:
        pc = F.col(self.partition_column)
        if self.inclusive:  # reference P2: BETWEEN start AND end (load_utils.py:90)
            return pc.between(F.lit(interval.start), F.lit(interval.end))
        return (pc >= F.lit(interval.start)) & (pc < F.lit(interval.end))

    def _read(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.format("mongodb")
        for k, v in self.describe().items():
            reader = reader.option(k, v)
        if self.schema is not None:
            reader = reader.schema(self.schema)  # no inference scan
        return reader.load()

    def read_slice(self, spark: SparkSession, interval: Interval) -> DataFrame:
        return self._read(spark).filter(self.slice_condition(interval))

    def read_range(self, spark: SparkSession, intervals: list[Interval]) -> DataFrame:
        if not intervals:
            raise ValueError("read_range needs at least one interval")
        lo = min(iv.start for iv in intervals)
        hi = max(iv.end for iv in intervals)
        return self.read_slice(spark, Interval(lo, hi))

    def probe_min(self, spark: SparkSession):
        return self._read(spark).agg(F.min(self.partition_column)).first()[0]

    def probe_max(self, spark: SparkSession):
        return self._read(spark).agg(F.max(self.partition_column)).first()[0]


class MongoTwinSource(MongoSource):
    """Parquet-backed twin of :class:`MongoSource` — byte-identical slice
    semantics (same ``slice_condition``, same registry-schema
    enforcement, same probes inherited from MongoSource) with only the
    wire format swapped: ``spark.read.parquet`` instead of the
    ``mongodb`` connector, whose jar is absent from this image
    (COVERAGE.md environmental-dependency table). This is what lets the
    mongodb_carga_* lifecycle (reference mongodb_carga_date.py:102-200:
    registry resolve -> slice -> retry-without-recovery) run END TO END
    through the CLI in tests; on a cluster with the connector, the same
    pipeline takes a real MongoSource with zero other changes."""

    def __init__(
        self,
        path: str,
        partition_column: str,
        schema: StructType | None = None,
        inclusive: bool = False,
    ):
        super().__init__(
            uri=f"twin://{path}",
            database="",
            collection=path,
            partition_column=partition_column,
            schema=schema,
            inclusive=inclusive,
        )
        self.path = path

    def _read(self, spark: SparkSession) -> DataFrame:
        df = spark.read.parquet(self.path)
        if self.schema is not None:
            # the registry schema is authoritative, as with the real
            # connector's explicit-schema load (no inference)
            df = df.select(
                [F.col(f.name).cast(f.dataType) for f in self.schema.fields]
            )
        return df
