"""Benchmark harness: runs the query catalog at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {"q": sec, ...}, "sf": ...}

Each query is forced end-to-end with a `noop`-format write (computes every
row/column, no sink cost, no driver collect). Every query runs twice and
the MINIMUM is reported: the first run absorbs JIT/codegen/FS-cache
warmup, and min-of-N is the standard way to keep shared-box load spikes
out of the trend line (the driver compares rounds against each other).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_complete_with_spark_spark.queries import QUERIES  # noqa: E402
from etl_complete_with_spark_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="bench")
    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        runs = []
        for _ in range(2):
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - start)
        timings[name] = round(min(runs), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
