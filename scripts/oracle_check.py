"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given SF, then compares row count, sorted-column schema and
an order-insensitive value hash. Catches mismatches before the driver
does. Usage::

    python scripts/oracle_check.py [sf_dir] [query ...]
    python scripts/oracle_check.py --json OUT.json [sf_dir] [query ...]

``--json`` additionally writes a CORRECTNESS_SF*-style artifact (the
r12 SF01 sweep's shape: a ``_meta`` header + per-query ``results``).
"""

from __future__ import annotations

import datetime
import hashlib
import json
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
    argv = list(sys.argv[1:])
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

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
    results: dict[str, dict] = {}
    n_checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_checked += 1
        row = {"err": None, "rows": None, "rows_match": None,
               "schema_match": None, "hash_match": None}
        results[name] = row
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            row["err"] = f"spark error: {ex}"
            failed.append(name)
            continue
        row["rows"] = len(sdf)
        if name not in oracles:
            print(f"weak  {name}: rows-only check, {len(sdf)} rows")
            row["weak"] = True
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            row["err"] = f"duckdb error: {ex}"
            failed.append(name)
            continue
        sh, sn = frame_fingerprint(sdf)
        dh, dn = frame_fingerprint(ddf)
        scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
        row["schema_match"] = scols == dcols
        row["rows_match"] = sn == dn
        row["hash_match"] = sh == dh
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
    if json_out:
        artifact = {
            "_meta": {
                "command": " ".join(["python scripts/oracle_check.py"] + sys.argv[1:]),
                "generated": datetime.date.today().isoformat(),
                "n_failures": len(failed),
                "n_queries": n_checked,
                "sf_dir": sf_dir,
            },
            "results": results,
        }
        with open(json_out, "w") as fh:
            json.dump(artifact, fh, indent=1, sort_keys=True)
        print(f"artifact written: {json_out}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
