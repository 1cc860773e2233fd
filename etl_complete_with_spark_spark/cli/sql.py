"""CLI: ad-hoc Spark SQL over the testdata tables and lake zones.

The free-form companion to ``cli.catalog`` (which runs pre-registered
queries): registers every testdata parquet table as a temp view, plus
any lake datasets under ``--lake-root`` as ``work_<ns>_<ds>`` /
``trusted_<ns>_<ds>``, then executes one SQL statement::

    python -m etl_complete_with_spark_spark.cli.sql \
        "SELECT o_orderpriority, count(*) FROM orders GROUP BY 1" -n 10

    python -m etl_complete_with_spark_spark.cli.sql --explain \
        "SELECT * FROM lineitem WHERE l_shipdate >= '1996-01-01'"

    python -m etl_complete_with_spark_spark.cli.sql \
        "SELECT * FROM trusted_sales_orders LIMIT 5" --lake-root /tmp/lake

``--output`` writes the full result as parquet instead of showing rows
(the operational export path — no driver collect of big results).
"""

from __future__ import annotations

import argparse
import os

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def register_views(spark, sf_dir: str, lake_root: str | None) -> list[str]:
    """Create temp views; returns the names registered."""
    from ..queries import load

    names = []
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            load(spark, sf_dir, t).createOrReplaceTempView(t)
            names.append(t)
    if lake_root:
        from ..lake import TRUSTED, WORK, Lake

        lake = Lake(lake_root)
        for zone, prefix, reader in (
            (WORK, "work", lake.read_work),
            (TRUSTED, "trusted", lake.read_trusted),
        ):
            zone_dir = os.path.join(lake_root, lake.environment, zone)
            if not os.path.isdir(zone_dir):
                continue
            for ns in sorted(os.listdir(zone_dir)):
                ns_dir = os.path.join(zone_dir, ns)
                if not os.path.isdir(ns_dir):
                    continue  # stray files at the zone level are not namespaces
                for ds in sorted(os.listdir(ns_dir)):
                    name = f"{prefix}_{ns}_{ds}"
                    try:
                        reader(spark, ns, ds).createOrReplaceTempView(name)
                        names.append(name)
                    except Exception:
                        continue  # half-written/foreign dirs are not tables
    return names


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="sql", description=__doc__)
    ap.add_argument("statement", help="one Spark SQL statement")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
        help="testdata directory (default: $SPARK_GRAFT_SF_DIR or sf0.001)",
    )
    ap.add_argument("--lake-root", help="also register lake datasets as views")
    ap.add_argument("-n", "--rows", type=int, default=20, help="rows to show")
    ap.add_argument("--explain", action="store_true", help="print the physical plan instead")
    ap.add_argument("--output", help="write full result as parquet here (no show)")
    args = ap.parse_args(argv)

    from ..session import get_spark

    spark = get_spark(app_name="sql-cli")
    register_views(spark, args.sf_dir, args.lake_root)
    df = spark.sql(args.statement)

    if args.explain:
        from .. import plans as P

        print(P.explain_summary(df))
        print(P.formatted_plan(df))
        return 0
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.output}")
        return 0
    df.show(args.rows, truncate=False)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
