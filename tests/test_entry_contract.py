"""Driver-contract invariants for __spark_entry__.

The driver's correctness gate samples the FIRST 50 entries of ``queries()``
— these tests pin the curated priority window (one representative per
COVERAGE.md operator family) and the catalog-wide naming rules the gate
relies on (matching oracle keys, no array-typed result cells is covered by
oracle_check itself).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from etl_complete_with_spark_spark.queries import ORACLE, QUERIES  # noqa: E402


def test_priority_window_is_50_known_queries():
    assert len(entry.PRIORITY_WINDOW) == 50
    assert len(set(entry.PRIORITY_WINDOW)) == 50
    missing = [n for n in entry.PRIORITY_WINDOW if n not in QUERIES]
    assert not missing, f"priority window names not in catalog: {missing}"


def test_queries_dict_leads_with_priority_window():
    q = entry.queries()
    assert list(q)[:50] == entry.PRIORITY_WINDOW
    assert len(q) == len(QUERIES)  # reordered, never dropped


def _green_counts(art_dir: str, max_round: int) -> dict[str, int]:
    """Green-record counts per query from CORRECTNESS_r*.json in
    ``art_dir``, considering ONLY artifacts with round <= ``max_round``
    — the set the committed window was computed from.  Newer artifacts
    (the driver writes the CURRENT round's file before every judging
    pass, while the window is necessarily one rotation old) are
    intentionally invisible here."""
    import glob
    import json

    counts: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(art_dir, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
        if rnd > max_round:
            continue
        with open(path) as fh:
            data = json.load(fh)
        for name, res in data.items():
            if res.get("err") is None and res.get("rows_match") is True:
                counts[name] = counts.get(name, 0) + 1
    return counts


def _assert_window_matches_policy(counts: dict[str, int]) -> None:
    window = set(entry.PRIORITY_WINDOW)
    assert {"pipeline_work_to_trusted", "jdbc_resync_orders"} <= window

    never_recorded = {q for q in QUERIES if q not in counts}
    assert never_recorded <= window, f"missing: {never_recorded - window}"

    # every non-pinned re-record slot holds a query with the MINIMUM
    # record count among those not yet in the window (no slot wasted on
    # a well-recorded query while a lesser-recorded one waits)
    non_window_min = min(
        (counts.get(q, 0) for q in QUERIES if q not in window), default=0
    )
    overfed = [
        q
        for q in entry.PRIORITY_WINDOW[2:]
        if counts.get(q, 0) > non_window_min
    ]
    assert not overfed, f"window slots wasted on well-recorded queries: {overfed}"


def test_priority_window_follows_rotation_policy():
    """COVERAGE.md rotation policy, derived from the CORRECTNESS
    artifacts on disk (not a per-round hardcoded list): the two flagship
    rows stay pinned; every catalog query with NO green row in any prior
    artifact is in the window; the re-record slots go to the
    least-recorded queries, earliest-recorded round first.  Artifacts
    newer than entry.WINDOW_GENERATED_AFTER are excluded — they did not
    exist when the window was rotated (round-6 VERDICT order 1)."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    counts = _green_counts(here, entry.WINDOW_GENERATED_AFTER)
    assert counts, "no CORRECTNESS artifacts found at or before the stamp"
    _assert_window_matches_policy(counts)


def test_rotation_policy_immune_to_newer_artifact(tmp_path):
    """The exact judging-time sequence that broke round 6: the driver
    drops the CURRENT round's artifact next to the committed (one
    rotation old) window.  Simulated by copying every artifact into a
    tmpdir plus a fake next-round artifact; the policy replay must not
    change, because the stamp hides everything newer."""
    import glob
    import shutil

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")))
    assert arts, "no CORRECTNESS artifacts found"
    for path in arts:
        shutil.copy(path, tmp_path / os.path.basename(path))
    fake_round = entry.WINDOW_GENERATED_AFTER + 1
    shutil.copy(arts[-1], tmp_path / f"CORRECTNESS_r{fake_round:02d}.json")

    with_fake = _green_counts(str(tmp_path), entry.WINDOW_GENERATED_AFTER)
    without = _green_counts(here, entry.WINDOW_GENERATED_AFTER)
    assert with_fake == without
    _assert_window_matches_policy(with_fake)


def test_window_stamp_not_stale():
    """The stamp must cover every artifact round the window could have
    seen MINUS the at-most-one the driver wrote this round: if two or
    more artifacts are newer than the stamp, a rotation was skipped."""
    import glob

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = sorted(
        int("".join(c for c in os.path.basename(p) if c.isdigit()))
        for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
    )
    newer = [r for r in rounds if r > entry.WINDOW_GENERATED_AFTER]
    assert len(newer) <= 1, (
        f"window stamped r{entry.WINDOW_GENERATED_AFTER} but artifacts "
        f"{newer} exist — run scripts/rotate_window.py and re-stamp"
    )


def test_every_priority_query_has_an_oracle():
    """Everything in the driver's sampled window must get the strong
    (hash-match) check, including ann_ivf_topk as of round 3. The only
    tolerated exception is ann_ivf when the gate-SF parquet is unreadable
    at import (the oracle builder returns None -> rows-only fallback)."""
    no_oracle = [n for n in entry.PRIORITY_WINDOW if n not in ORACLE]
    assert no_oracle in ([], ["ann_ivf_topk"]), no_oracle
    if not os.environ.get("CI_NO_TESTDATA"):
        assert "ann_ivf_topk" in ORACLE


def test_stated_catalog_count_matches_len_queries():
    """The window comment in __spark_entry__ states the catalog size ("N
    at the time of writing"); a stale number there costs driver/judge
    trust (r11 VERDICT wrong #3 — it said 164 while len(QUERIES) was
    165).  Pin the stated count to the real one."""
    import inspect
    import re

    src = inspect.getsource(entry)
    m = re.search(r"``QUERIES`` — (\d+) at the time of writing", src)
    assert m, "catalog-count sentence missing from __spark_entry__"
    assert int(m.group(1)) == len(QUERIES), (
        f"__spark_entry__ says {m.group(1)} queries, catalog has "
        f"{len(QUERIES)} — update the comment"
    )


def test_oracle_sql_keys_subset_of_queries():
    o = entry.oracle_sql()
    q = entry.queries()
    assert set(o) <= set(q)
    # ordered consistently with queries() so the driver pairs them 1:1
    order = {n: i for i, n in enumerate(q)}
    keys = list(o)
    assert keys == sorted(keys, key=order.__getitem__)
