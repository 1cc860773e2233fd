"""A/B: spark.local.dir on tmpfs (/dev/shm) vs the root overlay FS.

Round-8 (VERDICT r7 orders 2+5): the r7 closing artifact moved
executorRunTime -47% vs the r6 baseline, and the committed SCALING.md
note predated the final run — leaving the tmpfs share of that move
unapportioned. This script measures it directly: each query runs in its
own fresh session per placement (warmup run included in the totals
delta, same methodology as bench.py), recording wall seconds,
executorRunTime and executorCpuTime per run.

Usage::

    python scripts/ab_local_dir.py [query ...]   # default: one
        shuffle-heavy (association_rules_parts) + one scan-only
        (agg_pricing_summary) query

Prints a JSON object per (query, placement) and a final summary table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

DEFAULT_QUERIES = ["association_rules_parts", "agg_pricing_summary"]
PLACEMENTS = {"tmpfs": "/dev/shm/spark-local", "overlay": "/tmp/spark-local-ab"}


def _measure_child(query: str) -> dict:
    """Runs in the child process (one fresh JVM per measurement)."""
    from bench import _UI_CONF, _quiesced_totals  # noqa: E402
    from etl_complete_with_spark_spark.queries import QUERIES  # noqa: E402
    from etl_complete_with_spark_spark.session import get_spark  # noqa: E402
    import time

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"ab-localdir-{query}", extra_conf=_UI_CONF)
    try:
        fn = QUERIES[query]
        before = _quiesced_totals(spark)
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
        after = _quiesced_totals(spark)
        out = {"query": query, "wall_min_s": round(min(walls), 3)}
        if before is not None and after is not None:
            out["executor_run_s_per_run"] = round((after[3] - before[3]) / 2 / 1e3, 2)
            out["executor_cpu_s_per_run"] = round((after[4] - before[4]) / 2 / 1e9, 2)
            out["shuffle_write_mb_per_run"] = round((after[1] - before[1]) / 2 / 1e6, 2)
        return out
    finally:
        spark.stop()


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        print(json.dumps(_measure_child(sys.argv[2])))
        return
    queries = sys.argv[1:] or DEFAULT_QUERIES
    results: dict[str, dict[str, dict]] = {}
    for query in queries:
        for placement, path in PLACEMENTS.items():
            env = {**os.environ, "SPARK_GRAFT_LOCAL_DIR": path}
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", query],
                capture_output=True, text=True, timeout=600, env=env,
            )
            rec = json.loads(proc.stdout.strip().splitlines()[-1])
            results.setdefault(query, {})[placement] = rec
            print(json.dumps({"placement": placement, **rec}))
    print("\nquery                           metric                tmpfs   overlay  overlay/tmpfs")
    for query, by_p in results.items():
        for metric in ("wall_min_s", "executor_run_s_per_run", "executor_cpu_s_per_run"):
            a = by_p["tmpfs"].get(metric)
            b = by_p["overlay"].get(metric)
            if a is None or b is None:
                continue
            ratio = round(b / a, 2) if a else float("nan")
            print(f"{query:31s} {metric:21s} {a:7.2f} {b:9.2f} {ratio:8.2f}")


if __name__ == "__main__":
    main()
