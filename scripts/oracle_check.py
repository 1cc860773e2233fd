"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given SF, then compares row count, sorted-column schema and
an order-insensitive value hash. Catches mismatches before the driver
does. Usage::

    python scripts/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        # The DRIVER's canonicalizer (pandas sort_values) dies on list
        # cells ("unhashable type: 'list'", CORRECTNESS_r01) — so any
        # catalog query emitting an array column must serialize it.  Fail
        # here too instead of silently handling what the gate cannot.
        raise TypeError(
            "array-typed result cell — driver's canonicalizer cannot hash "
            "lists; serialize (concat_ws / array_to_string) in the catalog query"
        )
    return str(v)


def frame_fingerprint(pdf):
    pdf = pdf[sorted(pdf.columns)]
    rows = sorted(
        ",".join(canon(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest(), len(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # Data-trained oracles (ann_ivf_topk's quantizer) must learn from the
    # same SF the comparison runs at; set before the catalog import.
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", sf_dir)

    import __spark_entry__ as e
    from etl_complete_with_spark_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"weak  {name}: rows-only check, {len(sdf)} rows")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failed.append(name)
            continue
        sh, sn = frame_fingerprint(sdf)
        dh, dn = frame_fingerprint(ddf)
        scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
        if scols != dcols:
            print(f"FAIL  {name}: columns {scols} != {dcols}")
            failed.append(name)
        elif sn != dn:
            print(f"FAIL  {name}: rowcount {sn} != {dn}")
            failed.append(name)
        elif sh != dh:
            print(f"FAIL  {name}: value hash mismatch ({sn} rows)")
            failed.append(name)
        else:
            print(f"ok    {name}: {sn} rows")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
