"""Compute the next round's PRIORITY_WINDOW from the CORRECTNESS artifacts.

Implements the rotation policy documented in COVERAGE.md §artifacts and
asserted by `tests/test_entry_contract.py`:

1. `pipeline_work_to_trusted` and `jdbc_resync_orders` stay pinned.
2. Every catalog query with NO green row in any prior artifact gets a slot.
3. Remaining slots go to the least-recorded queries — fewest green rows
   first, earliest-recorded round first, registration order as tiebreak.

Prints the 50-entry list as Python source ready to paste into
`__spark_entry__.PRIORITY_WINDOW` (with per-entry provenance comments).
Run at the START of a round, after the driver has written the previous
round's CORRECTNESS artifact::

    python scripts/rotate_window.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_complete_with_spark_spark.queries import QUERIES  # noqa: E402

PINNED = ["pipeline_work_to_trusted", "jdbc_resync_orders"]
WINDOW = 50


def record_counts(repo_root: str):
    counts: dict[str, int] = {}
    first_round: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
        with open(path) as fh:
            data = json.load(fh)
        for name, res in data.items():
            if res.get("err") is None and res.get("rows_match") is True:
                counts[name] = counts.get(name, 0) + 1
                first_round.setdefault(name, rnd)
    return counts, first_round


def next_window():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    counts, first_round = record_counts(root)
    reg = list(QUERIES)
    never = [q for q in reg if q not in counts and q not in PINNED]
    rest = sorted(
        (q for q in reg if q in counts and q not in PINNED),
        key=lambda q: (counts[q], first_round[q], reg.index(q)),
    )
    window = PINNED + never + rest[: WINDOW - len(PINNED) - len(never)]
    if len(window) < WINDOW:  # tiny catalog: pad in registration order
        window += [q for q in reg if q not in window][: WINDOW - len(window)]
    return window[:WINDOW], counts, first_round, never


def main() -> None:
    window, counts, first_round, never = next_window()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    newest = max(
        (
            int("".join(c for c in os.path.basename(p) if c.isdigit()))
            for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
        ),
        default=0,
    )
    print(f"WINDOW_GENERATED_AFTER = {newest}")
    print("PRIORITY_WINDOW: list[str] = [")
    for q in window:
        if q in PINNED:
            tag = "pinned"
        elif q in never:
            tag = "never recorded"
        else:
            tag = f"{counts[q]} row(s), first r{first_round[q]:02d}"
        print(f'    "{q}",  # {tag}')
    print("]")


if __name__ == "__main__":
    main()
