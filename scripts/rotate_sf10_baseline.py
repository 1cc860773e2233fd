"""Rotate bench_sf10_baseline.json from the closing BENCH_SF10.json.

Same lifecycle as rotate_cpu_baseline.py, for the sf1.0 shape mini-gate
(bench.py --sf10, round 15 per r14 VERDICT order 1): the prior round's
closing per-shape CPU-s/run + shuffle-write MB/run become the baseline
the gate compares against, carried with the canaries recorded in the
same session so a future run on a faster/slower box is normalized into
baseline-box units first. Usage::

    python scripts/rotate_sf10_baseline.py <round-number>
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
    with open(os.path.join(HERE, "BENCH_SF10.json")) as f:
        art = json.load(f)
    run = art.get("run")
    if not run or not run.get("shapes"):
        print("BENCH_SF10.json carries no run block — nothing to rotate")
        return 1
    base = {
        "metric": "sf10_shape_gate_baseline",
        "round": round_n,
        "shapes": run["shapes"],
        "box_canary_cpu_s": run.get("box_canary_cpu_s"),
        "box_canary_mem_cpu_s": run.get("box_canary_mem_cpu_s"),
    }
    out = os.path.join(HERE, "bench_sf10_baseline.json")
    with open(out, "w") as f:
        json.dump(base, f, indent=1, sort_keys=True)
    cpus = {n: s.get("cpu_s_per_run") for n, s in run["shapes"].items()}
    print(f"rotated: {out} <- BENCH_SF10.json ({cpus})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
