"""JDBC source (S1-S3 of SURVEY §2.1).

Rebuilds the reference's JDBC extraction (shared_etls/etls/load_utils.py:11-46
range scan; :306-362 MIN probe; :460-526 MAX probe) Spark-first:

- The reference read each slice *sequentially*, one Spark job per chunk,
  by baking the range into a ``dbTable`` subquery. Here the whole window
  is ONE parallel read: each half-open slice becomes an entry of
  ``predicates=`` (one task per slice, fetched concurrently), which is
  Spark's native range partitioning for JDBC. Sequential slices survive
  only as resumability units in pipeline.py.
- MIN/MAX probes push the aggregate to the source DB via a one-row
  subquery — the DB scans its index instead of shipping the table.

Spark ships an embeddable database in its own classpath — Apache Derby
(the Hive-metastore backend) — so the whole surface IS integration-tested
against a live JDBC endpoint: ``tests/test_jdbc_derby.py`` seeds a Derby
table via :func:`seed_jdbc_table` and drives probes, slice reads, the
parallel ``predicates=`` range read, and the full ResyncPipeline through
it; the ``jdbc_resync_orders`` catalog query replays the same lifecycle
under the DuckDB oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..slicing import Interval, jdbc_predicates, query_definition

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(directory: str) -> str:
    """Embedded-Derby JDBC URL for a database under ``directory``."""
    return f"jdbc:derby:{directory}/db;create=true"


def seed_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    options: dict[str, str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize a DataFrame as a JDBC table (integration tests / demos).

    Two portability normalizations:
    - column names are UPPERCASED before the write — Spark's JDBC writer
      quotes identifiers, and quoted-lowercase columns are unreachable
      from the reference-style unquoted SQL this source emits
      (load_utils.py:37-44); Derby/Oracle/DB2 fold unquoted identifiers
      to uppercase, so uppercase stored names match either way.
    - TIMESTAMP_NTZ columns are cast to plain TIMESTAMP — JDBC dialects
      map java.sql.Timestamp, not LocalDateTime.
    """
    out = df
    for name, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            out = out.withColumn(name, F.col(name).cast("timestamp"))
    out = out.toDF(*[c.upper() for c in out.columns])
    writer = (
        out.write.mode(mode).format("jdbc").option("url", url).option("dbtable", table)
    )
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save()


class JdbcSource:
    def __init__(
        self,
        url: str,
        table: str,
        partition_column: str,
        user: str | None = None,
        password: str | None = None,
        fetchsize: int = 10_000,
        options: dict[str, str] | None = None,
    ):
        self.url = url
        self.table = table
        self.partition_column = partition_column
        self.user = user
        self.password = password
        self.fetchsize = fetchsize
        self.options = options or {}

    # -- option/SQL construction (unit-testable without a DB) ---------------

    def _base_options(self) -> dict[str, str]:
        opts = {"url": self.url, "fetchsize": str(self.fetchsize), **self.options}
        if self.user is not None:
            opts["user"] = self.user
        if self.password is not None:
            opts["password"] = self.password
        return opts

    def describe_slice(self, interval: Interval) -> dict[str, str]:
        """Reader options for one slice: the reference's pushdown subquery
        (load_utils.py:37-44) — kept for exact-parity single-slice reads."""
        return {
            **self._base_options(),
            "dbtable": query_definition(self.table, self.partition_column, interval),
        }

    def describe_range(self, intervals: list[Interval]) -> tuple[dict[str, str], list[str]]:
        """Reader options + per-slice predicates for the parallel window read."""
        return (
            {**self._base_options(), "dbtable": self.table},
            jdbc_predicates(self.partition_column, intervals),
        )

    def probe_sql(self, agg: str) -> str:
        """`(select min(pc) as agg_value from T) subs` — aggregate pushed to
        the source DB (load_utils.py:343, :497). Unlike the reference, the
        aggregate is aliased: engines that auto-name derived columns
        (Derby names it "1") break Spark's re-select of the subquery
        otherwise; MySQL & friends accept the alias equally."""
        return (
            f"(select {agg}({self.partition_column}) as agg_value "
            f"from {self.table}) subs"
        )

    # -- Spark reads (need a driver jar + live DB) --------------------------

    def read_slice(self, spark: SparkSession, interval: Interval) -> DataFrame:
        reader = spark.read.format("jdbc")
        for k, v in self.describe_slice(interval).items():
            reader = reader.option(k, v)
        return reader.load()

    def read_range(self, spark: SparkSession, intervals: list[Interval]) -> DataFrame:
        opts, predicates = self.describe_range(intervals)
        props = {k: v for k, v in opts.items() if k not in ("url", "dbtable")}
        return spark.read.jdbc(
            url=opts["url"], table=opts["dbtable"], predicates=predicates, properties=props
        )

    def _probe(self, spark: SparkSession, agg: str):
        reader = (
            spark.read.format("jdbc")
            .option("dbtable", self.probe_sql(agg))
        )
        for k, v in self._base_options().items():
            reader = reader.option(k, v)
        return reader.load().first()[0]

    def probe_min(self, spark: SparkSession):
        return self._probe(spark, "min")

    def probe_max(self, spark: SparkSession):
        return self._probe(spark, "max")
