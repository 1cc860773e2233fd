"""CLI entry point: sliced resync of a source table into the lake.

Keeps the reference's argument surface (resync_date/etls/carga_date.py:35-50:
--namespace --dataset --connection --db_user --db_pass --start_process
--end_process --id_request --partition_column --amount; the reference's
--cloud_environment becomes --lake-root) and unifies its four programs
(carga_date / carga_int / mongodb_carga_date / mongodb_carga_int) behind
``--source-kind {jdbc,mongodb,parquet} --mode {date,int}``.

Examples::

    python -m etl_complete_with_spark_spark.cli.resync \
        --source-kind parquet --mode int \
        --connection /root/testdata/sf0.001/events.parquet \
        --namespace demo --dataset events --partition_column event_id \
        --amount 1000 --lake-root /tmp/lake --merge-keys event_id
"""

from __future__ import annotations

import argparse
import datetime as _dt
import sys

from ..lake import Lake
from ..observability import http_status_callback, null_status
from ..pipeline import ResyncConfig, ResyncPipeline
from ..schema_registry import SchemaRegistry
from ..session import get_spark
from ..slicing import database_from_url, disable_ssl_for_mysql
from ..sources import JdbcSource, MongoSource, MongoTwinSource, ParquetSource


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--namespace", required=True)
    p.add_argument("--dataset", required=True)
    p.add_argument("--connection", required=True, help="JDBC url / Mongo URI / parquet path")
    p.add_argument("--db_user")
    p.add_argument("--db_pass")
    p.add_argument("--start_process", dest="start")
    p.add_argument("--end_process", dest="end")
    p.add_argument("--id_request", default="")
    p.add_argument("--partition_column", required=True)
    p.add_argument("--amount", type=int, default=0, help="estimated row count (chunk tier)")
    p.add_argument("--lake-root", required=True)
    p.add_argument("--source-kind", choices=["jdbc", "mongodb", "parquet"], default="jdbc")
    p.add_argument("--mode", choices=["date", "int"], required=True)
    p.add_argument("--schema-registry", help="dir of {ns}_{ds}.json StructType schemas")
    p.add_argument("--status-endpoint", help="REST endpoint for run status callbacks")
    p.add_argument("--sequential", action="store_true",
                   help="per-slice resumable jobs instead of one parallel read")
    p.add_argument("--no-recovery", action="store_true",
                   help="mongodb_carga_* lifecycle: retry each slice but never "
                   "resume from the manifest (reference "
                   "mongodb_carga_date.py:160-195)")
    p.add_argument("--merge-keys", help="comma-separated business key columns; "
                   "when given, phase 2 (transform+merge into TRUSTED) runs too")
    p.add_argument("--no-hyphen-separator", action="store_true",
                   help="reference concat (NULL-strict) surrogate-key mode")
    return p


def _parse_bound(value: str | None, mode: str):
    if value is None:
        return None
    try:
        return int(value) if mode == "int" else _dt.date.fromisoformat(value)
    except ValueError as exc:
        expected = "an integer" if mode == "int" else "an ISO date (YYYY-MM-DD)"
        raise SystemExit(
            f"error: --start_process/--end_process must be {expected} "
            f"in --mode {mode}; got {value!r}"
        ) from exc


def build_source(args, spark=None):
    if args.source_kind == "parquet":
        return ParquetSource(args.connection, args.partition_column)
    if args.source_kind == "jdbc":
        url = disable_ssl_for_mysql(args.connection)  # D6 parity
        return JdbcSource(url, args.dataset, args.partition_column,
                          user=args.db_user, password=args.db_pass)
    schema = None
    if args.schema_registry and spark is not None:
        schema = SchemaRegistry(args.schema_registry).resolve(
            spark, args.namespace, args.dataset, lake=Lake(args.lake_root)
        )
    import os

    # Route on the EXPLICIT scheme, never on local filesystem state: a
    # mongodb:// URI always takes the real connector, anything else is
    # the parquet twin of the Mongo lifecycle (same registry resolve,
    # same slice semantics; the connector jar is absent in the test
    # image — COVERAGE.md) and must point at an existing local path —
    # a mistyped path errors here instead of surfacing as a confusing
    # connector failure.
    if args.connection.startswith(("mongodb://", "mongodb+srv://")):
        return MongoSource(
            args.connection,
            database_from_url(args.connection, args.namespace),  # D7 parity
            args.dataset,
            args.partition_column,
            schema=schema,
        )
    if os.path.exists(args.connection):
        return MongoTwinSource(
            args.connection, args.partition_column, schema=schema
        )
    raise SystemExit(
        f"error: --connection {args.connection!r} is neither a "
        "mongodb://(+srv) URI nor an existing local parquet path"
    )


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    # validate bounds before paying JVM startup
    start = _parse_bound(args.start, args.mode)
    end = _parse_bound(args.end, args.mode)
    spark = get_spark(app_name=f"resync-{args.namespace}-{args.dataset}")
    status = http_status_callback(args.status_endpoint) if args.status_endpoint else null_status

    cfg = ResyncConfig(
        namespace=args.namespace,
        dataset=args.dataset,
        partition_column=args.partition_column,
        mode=args.mode,
        start=start,
        end=end,
        amount=args.amount,
        id_request=args.id_request,
        recovery=not args.no_recovery,
    )
    lake = Lake(args.lake_root)
    pipe = ResyncPipeline(build_source(args, spark), lake, cfg, status_callback=status)
    result = pipe.run(spark, parallel=not args.sequential)
    print(
        f"resync {args.namespace}.{args.dataset}: {len(result.completed)} slices loaded, "
        f"{len(result.skipped)} resumed-skip, {result.attempts} attempts"
    )
    if args.merge_keys:
        trusted = pipe.transform_and_merge(
            spark,
            [c.strip() for c in args.merge_keys.split(",")],
            hyphen_separator=not args.no_hyphen_separator,
        )
        print(f"trusted {args.namespace}.{args.dataset}: {trusted.count()} rows after merge")
    return 0


if __name__ == "__main__":
    sys.exit(main())
