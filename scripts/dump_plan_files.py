"""Dump per-query `.explain("formatted")` output to plans/<round>/<name>_<tag>.txt.

Optimization-round evidence files: the judge checks plan claims
(Exchange counts, join strategy, PushedFilters, codegen spans) against
these captures. Static AQE plans (isFinalPlan=false) — the same thing
`df.explain("formatted")` prints before execution.

Usage::

    python scripts/dump_plan_files.py <tag> <query> [query ...]
    # writes plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<tag>.txt (tag: before|after)

SPARK_GRAFT_SF_DIR selects the data dir (default the bench SF, sf0.1);
SPARK_GRAFT_PLAN_ROUND the plans/ subdir (default r16).
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit("usage: dump_plan_files.py <tag> <query> [query ...]")
    tag, names = sys.argv[1], sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from etl_complete_with_spark_spark.queries import QUERIES
    from etl_complete_with_spark_spark.session import get_spark

    out_dir = os.path.join(
        ROOT, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r16")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"dump-plan-files-{tag}")
    try:
        for name in names:
            df = QUERIES[name](spark, sf_dir)
            text = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(out_dir, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(f"-- {name} ({tag}) on {sf_dir}\n\n{text}")
            print(f"wrote {path}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
