"""CLI: inspect and run the query catalog.

The operational front door to the engine's query surface::

    python -m etl_complete_with_spark_spark.cli.catalog list
    python -m etl_complete_with_spark_spark.cli.catalog explain dedup_minhash_lsh
    python -m etl_complete_with_spark_spark.cli.catalog run q3_shipping_priority -n 10

``explain`` prints the plan-health summary (shuffles, codegen stages,
broadcast, scanned columns) plus the formatted physical plan — the same
signals PLANS.md snapshots, but on demand for one query.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="catalog", description=__doc__)
    ap.add_argument("command", choices=["list", "explain", "run"])
    ap.add_argument("query", nargs="?", help="catalog query name")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
        help="testdata directory (default: $SPARK_GRAFT_SF_DIR or sf0.001)",
    )
    ap.add_argument("-n", "--rows", type=int, default=20, help="rows to show for `run`")
    args = ap.parse_args(argv)

    from ..queries import ORACLE, QUERIES

    if args.command == "list":
        width = max(map(len, QUERIES))
        for name in QUERIES:
            kind = "exact-oracle" if name in ORACLE else "rows-only"
            print(f"{name:<{width}}  {kind}")
        return 0

    if not args.query:
        ap.error(f"`{args.command}` needs a query name (see `catalog list`)")
    if args.query not in QUERIES:
        print(f"unknown query {args.query!r}; `catalog list` shows all", file=sys.stderr)
        return 2

    from ..session import get_spark

    spark = get_spark(app_name=f"catalog-{args.command}")
    df = QUERIES[args.query](spark, args.sf_dir)

    if args.command == "explain":
        from .. import plans as P

        s = P.explain_summary(df)
        print(f"query:          {args.query}")
        print(f"exchanges:      {s['exchanges']}")
        print(f"codegen stages: {s['codegen_stages']}")
        print(f"broadcast join: {s['broadcast_join']}")
        print(f"read columns:   {', '.join(sorted(s['read_columns'])) or '-'}")
        print()
        df.explain("formatted")
    else:
        df.show(args.rows, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
