"""Rotate bench_cpu_baseline.json from the closing BENCH_FULL.json.

Run once at round open (the VERDICT's recurring "re-anchor the perf
gate" order, first executed by hand in round 8): the prior round's
closing per-query executorCpuTime numbers become the new baseline the
CPU gate compares against, like-for-like. Also carries the box-
throughput canary (bench._box_canary) recorded alongside those numbers,
so the gate can normalize a future run on a faster/slower box into
baseline-box units before comparing. Usage::

    python scripts/rotate_cpu_baseline.py <round-number> [note]
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    round_n = int(sys.argv[1])
    note = sys.argv[2] if len(sys.argv) > 2 else (
        f"Rotated at round-{round_n} open: per-query executor task "
        "CPU-seconds (executorCpuTime) from the prior round's closing "
        "BENCH_FULL.json — the CPU gate's like-for-like baseline. "
        "box_canary_cpu_s is the fixed all-core canary measured in the "
        "same run; current-run canary / this = the box factor the gate "
        "divides out."
    )
    with open(os.path.join(HERE, "BENCH_FULL.json")) as f:
        full = json.load(f)
    base = {
        "metric": "executor_cpu_sec_per_run",
        "round": round_n,
        "note": note,
        "executor_cpu_sec_per_run": full["executor_cpu_sec_per_run"],
        "executor_cpu_sec_total": full["executor_cpu_sec_total"],
        "box_canary_cpu_s": (full.get("box_canary") or {}).get("start_cpu_s"),
        "box_canary_mem_cpu_s": (full.get("box_canary_mem") or {}).get(
            "start_cpu_s"
        ),
    }
    out = os.path.join(HERE, "bench_cpu_baseline.json")
    with open(out, "w") as f:
        json.dump(base, f, indent=1, sort_keys=True)
    print(
        f"rotated: {out} <- BENCH_FULL.json "
        f"(total {base['executor_cpu_sec_total']} s, "
        f"canary {base['box_canary_cpu_s']} s, "
        f"mem canary {base['box_canary_mem_cpu_s']} s)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
