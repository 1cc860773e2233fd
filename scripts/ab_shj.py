"""A/B: sort-merge vs AQE shuffled-hash conversion for the sf1.0 joins.

Measures catalog queries in a fresh JVM per arm with
``spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold`` either at its
default 0 (off -> SMJ keeps its sorts) or raised so AQE rewrites the
post-shuffle SMJ into a shuffled hash join (guide §3.1: often faster when
each build partition fits in memory; the risk is per-partition build OOM,
which the threshold itself bounds).

Usage::

    python scripts/ab_shj.py <threshold|0> <query> [query ...]

Same methodology as measure_cpu.py (two runs incl. cold, quiesced totals
halved, box canary).
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

    threshold, names = sys.argv[1], sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    conf = dict(_UI_CONF)
    conf["spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"] = threshold
    spark = get_spark(app_name=f"ab-shj-{threshold}", extra_conf=conf)
    try:
        # sf_dir in the first record (r15 ADVICE): the documented SHJ
        # numbers were taken at sf1.0 — a run without SPARK_GRAFT_SF_DIR
        # silently measures sf0.1, where the big joins broadcast and the
        # conversion is dormant.
        print(json.dumps({"threshold": threshold, "sf_dir": sf_dir,
                          "box_canary_cpu_s": _box_canary(spark)}))
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
                rec["executor_cpu_s_per_run"] = round((after[4] - before[4]) / 2 / 1e9, 2)
                rec["shuffle_write_mb_per_run"] = round((after[1] - before[1]) / 2 / 1e6, 2)
            print(json.dumps(rec))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
