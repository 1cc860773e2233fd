"""Cold-session executor-CPU measurement for one or more catalog queries.

Same methodology as ``bench.py``'s catalog run and confirm pass (two
runs including the first, totals delta halved, noop sink) in ONE fresh
JVM per invocation — the apples-to-apples number for before/after A/Bs
of a single query's implementation.

Usage::

    python scripts/measure_cpu.py <query> [query ...]

Prints one JSON line per query: wall (min of runs), executorRunTime and
executorCpuTime per run, shuffle write MB per run.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)


def main() -> None:
    from bench import _UI_CONF, _box_canary, _quiesced_totals  # noqa: E402
    from etl_complete_with_spark_spark.queries import QUERIES  # noqa: E402
    from etl_complete_with_spark_spark.session import get_spark  # noqa: E402

    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: measure_cpu.py <query> [query ...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="measure-cpu", extra_conf=_UI_CONF)
    try:
        # Box-state context (bench.py's canary): CPU-seconds drift with
        # host SMT/turbo state, so an A/B is only comparable after
        # dividing each side by its session's canary reading.
        canary = _box_canary(spark)
        print(json.dumps({"box_canary_cpu_s": canary}))
        for name in names:
            fn = QUERIES[name]
            before = _quiesced_totals(spark)
            walls = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                walls.append(time.perf_counter() - t0)
            after = _quiesced_totals(spark)
            rec = {"query": name, "wall_min_s": round(min(walls), 3)}
            if before is not None and after is not None:
                rec["executor_run_s_per_run"] = round((after[3] - before[3]) / 2 / 1e3, 2)
                rec["executor_cpu_s_per_run"] = round((after[4] - before[4]) / 2 / 1e9, 2)
                rec["shuffle_write_mb_per_run"] = round((after[1] - before[1]) / 2 / 1e6, 2)
            print(json.dumps(rec))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
