"""CPU-gate logic: baseline column, calibration, verdicts — no Spark.

The gate itself (`bench._cpu_gate`) is pure arithmetic over the
committed baseline; the only Spark-touching piece (`_cpu_confirm`) is
monkeypatched so these tests assert the round-8 re-anchor semantics:

- the gate reads ``executor_cpu_sec_per_run`` (true CPU) from the
  rotated baseline, not the r6/r7 ``executor_sec_per_run`` column;
- the confirm pass's control-query ratio calibrates candidate
  confirm readings before the verdict (r7 ADVICE: an uncalibrated
  quiet-session confirm under-read 0.43-0.9x and could label a ~2x
  real regression as box noise);
- verdicts: calibrated-confirmed regressions are violations,
  calibrated-reverted ones are not, instrumentation gaps stay flagged.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

import bench  # noqa: E402


@pytest.fixture(autouse=True)
def _isolated_flag_ledger(monkeypatch, tmp_path):
    """Every gate call records flags into the two-strike ledger and a
    repeat flag escalates to the (Spark-touching) ABAB pass — point the
    ledger at a per-test tmp file and stub the ABAB so unit tests stay
    pure arithmetic. Tests that assert ABAB semantics override the stub."""
    monkeypatch.setenv("SPARK_GRAFT_FLAG_HISTORY", str(tmp_path / "flags.json"))
    monkeypatch.setenv("SPARK_GRAFT_ABAB_SETTLE_S", "0")
    monkeypatch.setattr(
        bench,
        "_cpu_abab",
        lambda names, reps=bench.ABAB_REPS: {
            n: {"samples_s": [], "calibrated_s": [], "reps": 0,
                "median_calibrated_s": None}
            for n in names
        },
    )


def _baseline() -> dict[str, float]:
    here = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    with open(os.path.join(here, "bench_cpu_baseline.json")) as f:
        base = json.load(f)
    return base["executor_cpu_sec_per_run"]


def _biggest(base: dict[str, float]) -> str:
    """Largest NON-EXEMPT baseline query — the r14 rotation made the
    overall max (dedup_containment) a CPU_GATE_EXEMPT entry, and exempt
    queries never escalate, which is not what these tests exercise."""
    return max((q for q in base if q not in bench.CPU_GATE_EXEMPT),
               key=base.get)


def test_baseline_stores_cpu_column_for_current_round():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "bench_cpu_baseline.json")) as f:
        base = json.load(f)
    assert "executor_cpu_sec_per_run" in base
    assert "executor_sec_per_run" not in base  # elapsed-time column retired
    assert base["round"] >= 7
    assert len(base["executor_cpu_sec_per_run"]) >= 150


def test_identical_numbers_pass_clean():
    g = bench._cpu_gate(dict(_baseline()))
    assert g["metric"] == "executor_cpu_sec_per_run"
    assert g["total_pct"] == 0.0
    assert g["median_pct"] == 0.0
    assert g["contamination_hint"] is False
    assert g["violations"] == []
    assert g["total_within_threshold"] is True


def test_contamination_hint_on_concentrated_drift(monkeypatch):
    """Total blows the threshold from a handful of queries while the
    median stays flat -> contamination_hint fires (the r8 pytest-
    aftermath signature: total +71%, median +16% -> clean rerun +7.9%)."""
    base = _baseline()
    cur = dict(base)
    top = sorted(base, key=base.get, reverse=True)[:4]
    for q in top:
        cur[q] = round(base[q] * 4.0, 2)
    monkeypatch.setattr(
        bench, "_cpu_confirm",
        lambda names: {**{f"__control__{c}": base[c] for c in bench.CPU_CONFIRM_CONTROLS},
                       **{n: base[n] for n in names}},
    )
    g = bench._cpu_gate(cur)
    assert g["total_pct"] > bench.CPU_GATE_TOTAL_PCT
    assert g["median_pct"] <= bench.CPU_GATE_TOTAL_PCT
    assert g["contamination_hint"] is True
    # every flag reverted on a baseline-level confirm
    assert g["violations"] == []


def test_engine_wide_regression_moves_median(monkeypatch):
    base = _baseline()
    cur = {q: round(v * 1.5, 3) for q, v in base.items()}
    # confirm corroborates the regression (no Spark in unit tests)
    monkeypatch.setattr(
        bench, "_cpu_confirm",
        lambda names: {**{f"__control__{c}": base[c] for c in bench.CPU_CONFIRM_CONTROLS},
                       **{n: cur[n] for n in names}},
    )
    g = bench._cpu_gate(cur)
    assert g["median_pct"] >= 40.0  # the median ruler sees it
    assert g["contamination_hint"] is False
    assert len(g["violations"]) > 0


def test_sub_floor_or_sub_pct_regressions_not_flagged():
    base = _baseline()
    cur = dict(base)
    # +0.4 s absolute (below the 0.5 s floor) on a small query
    small = min(base, key=base.get)
    cur[small] = base[small] + 0.4
    # +10% (below the 25% threshold) on a large query
    big = _biggest(base)
    cur[big] = round(base[big] * 1.10, 2)
    g = bench._cpu_gate(cur)
    assert g["regressions"] == {}
    assert g["violations"] == []


def _gate_with_confirm(monkeypatch, cur, confirm_map):
    monkeypatch.setattr(bench, "_cpu_confirm", lambda names: dict(confirm_map))
    return bench._cpu_gate(cur)


def test_confirmed_regression_is_violation_after_calibration(monkeypatch):
    base = _baseline()
    big = _biggest(base)
    cur = dict(base)
    cur[big] = round(base[big] * 2.0, 2)
    ctl = bench.CPU_CONFIRM_CONTROLS
    # controls read 0.8x baseline in the confirm session (quiet-session
    # offset); candidate confirms at 1.6x raw = 2.0x calibrated -> real
    confirm = {f"__control__{c}": round(base[c] * 0.8, 3) for c in ctl if c in base}
    confirm[big] = round(base[big] * 1.6, 2)
    g = _gate_with_confirm(monkeypatch, cur, confirm)
    assert g["confirm_calibration"] == 0.8
    assert g["regressions"][big]["verdict"] == "confirmed"
    assert big in g["violations"]


def test_noise_regression_reverts_after_calibration(monkeypatch):
    base = _baseline()
    big = _biggest(base)
    cur = dict(base)
    cur[big] = round(base[big] * 2.0, 2)  # catalog-run smear
    ctl = bench.CPU_CONFIRM_CONTROLS
    # confirm session reads everything at ~baseline: controls 1.0x,
    # candidate 1.05x -> calibrated 1.05x, inside the threshold
    confirm = {f"__control__{c}": base[c] for c in ctl if c in base}
    confirm[big] = round(base[big] * 1.05, 2)
    g = _gate_with_confirm(monkeypatch, cur, confirm)
    assert g["regressions"][big]["verdict"] == "reverted-on-confirm (box noise)"
    assert g["violations"] == []


def test_uncalibrated_underread_no_longer_masks(monkeypatch):
    """The r7 failure mode: controls show the confirm session reads
    0.5x baseline; a candidate confirming at 0.8x raw is 1.6x
    calibrated... but the clamp bounds calibration at 0.7, so the
    candidate lands at 0.8/0.7 = 1.14x -> reverted. The clamp trades
    a pathological control reading for bounded error; assert both the
    clamp and that a genuinely-regressed 1.0x-raw candidate (2.0x at
    the clamped calibration) is still confirmed."""
    base = _baseline()
    big = _biggest(base)
    cur = dict(base)
    cur[big] = round(base[big] * 2.0, 2)
    ctl = bench.CPU_CONFIRM_CONTROLS
    confirm = {f"__control__{c}": round(base[c] * 0.5, 3) for c in ctl if c in base}
    confirm[big] = round(base[big] * 1.4, 2)  # 2.8x at true offset
    g = _gate_with_confirm(monkeypatch, cur, confirm)
    assert g["confirm_calibration"] == bench.CPU_CONFIRM_CAL_CLAMP[0]
    assert g["regressions"][big]["verdict"] == "confirmed"


def test_missing_confirm_reading_stays_flagged(monkeypatch):
    base = _baseline()
    big = _biggest(base)
    cur = dict(base)
    cur[big] = round(base[big] * 2.0, 2)
    confirm = {f"__control__{c}": None for c in bench.CPU_CONFIRM_CONTROLS}
    confirm[big] = None
    g = _gate_with_confirm(monkeypatch, cur, confirm)
    assert g["regressions"][big]["confirm_s"] is None
    assert big in g["violations"]  # instrumentation gap never hides a flag


def test_new_queries_reported_not_gated():
    cur = dict(_baseline())
    cur["brand_new_query"] = 42.0
    g = bench._cpu_gate(cur)
    assert "brand_new_query" in g["new_queries"]
    assert "brand_new_query" not in g["regressions"]


def test_controls_exist_in_baseline_and_catalog():
    base = _baseline()
    from etl_complete_with_spark_spark.queries import QUERIES

    for c in bench.CPU_CONFIRM_CONTROLS + [bench.CPU_CONFIRM_WARMUP]:
        assert c in QUERIES
        assert c in base


def test_controls_carry_half_second_baselines():
    """r8 order 3: a ~0.1 s control reads timer noise, not session
    offset (sketch_countmin_users at 0.13 s baseline read ratio 1.462,
    outside the very clamp band the calibration applies). Controls must
    carry >= 0.5 s baseline CPU so their ratio measures the session."""
    base = _baseline()
    for c in bench.CPU_CONFIRM_CONTROLS:
        assert base[c] >= 0.5, f"control {c} baseline {base[c]} < 0.5 s"


def test_control_ratio_band_asserted_into_artifact(monkeypatch):
    """Each co-timed control's in-band status (inside the calibration
    clamp) is recorded per control, and confirm_controls_in_band goes
    False when any control reads outside it — the confirm pass's own
    health check, machine-readable instead of judge-spotted."""
    base = _baseline()
    cand = max(base, key=base.get)
    cur = dict(base)
    cur[cand] = round(base[cand] * 2.0, 3)
    ctl_good, ctl_bad = bench.CPU_CONFIRM_CONTROLS[:2]

    def fake_confirm(names):
        out = {f"__control__{c}": base[c] * 1.05
               for c in bench.CPU_CONFIRM_CONTROLS}
        out[f"__control__{ctl_bad}"] = base[ctl_bad] * 1.5  # out of band
        out.update({n: cur[n] for n in names})
        return out

    monkeypatch.setattr(bench, "_cpu_confirm", fake_confirm)
    g = bench._cpu_gate(cur)
    assert g["confirm_controls"][ctl_good]["in_band"] is True
    assert g["confirm_controls"][ctl_bad]["in_band"] is False
    assert g["confirm_controls_in_band"] is False

    def fake_confirm_ok(names):
        out = {f"__control__{c}": base[c] * 1.02
               for c in bench.CPU_CONFIRM_CONTROLS}
        out.update({n: cur[n] for n in names})
        return out

    monkeypatch.setattr(bench, "_cpu_confirm", fake_confirm_ok)
    g2 = bench._cpu_gate(cur)
    assert g2["confirm_controls_in_band"] is True


def test_floor_cleared_when_fresh_below_threshold():
    exceeding = {"qa": 3.5, "qb": 4.0, "pagerank_suppliers": 3.8}
    candidates = ["qa", "qb"]
    fresh = {"qa": {"recorded_s": 3.5, "fresh_s": 2.4, "recorded_over_fresh": 1.46},
             "qb": {"recorded_s": 4.0, "fresh_s": 3.6, "recorded_over_fresh": 1.11}}
    pf = bench._adjudicate_floor(exceeding, candidates, fresh)
    assert pf["violations"] == ["qb"]  # fresh also above floor -> stands
    assert "qa" in pf["cleared_on_fresh"]  # cold process under floor -> noise
    assert "pagerank_suppliers" in pf["exempt"]  # registered exemption


def test_floor_missing_or_errored_fresh_is_conservative():
    exceeding = {"qa": 3.5, "qb": 3.6}
    candidates = ["qa", "qb"]
    fresh = {"qa": {"error": "timeout"}}  # qb absent entirely
    pf = bench._adjudicate_floor(exceeding, candidates, fresh)
    assert pf["violations"] == ["qa", "qb"]
    assert pf["cleared_on_fresh"] == {}


# ---------------------------------------------------------------------------
# Confirm-session warmth parity (round-8 fix): shared-subtree caches
# ---------------------------------------------------------------------------


def test_prewarm_groups_cover_only_catalog_queries():
    for grp in bench.CPU_CONFIRM_SHARED_CACHES:
        for q in grp:
            assert q in bench.QUERIES, f"{q} not in catalog"
    assert bench.CPU_CONFIRM_WARMUP_PY in bench.QUERIES


def test_prewarm_leader_measures_cold():
    # dedup_ngram_jaccard builds _JACCARD_PAIRS_CACHE itself in the
    # catalog (no group member precedes it), so its confirm must NOT
    # warm anything — the baseline includes the build.
    assert bench._confirm_prewarm("dedup_ngram_jaccard") == []
    assert bench._confirm_prewarm("triangle_coorder_parts") == []


def test_prewarm_same_segment_sharer_gets_its_builder():
    # dedup_cluster_keep runs after dedup_ngram_jaccard in the SAME
    # session segment, so its catalog baseline (0.64 s) excludes the
    # pair build; the r8 confirm session measured it cache-cold at
    # 3.24 s and "confirmed" a phantom +90% regression.
    assert bench._confirm_prewarm("dedup_cluster_keep") == ["dedup_ngram_jaccard"]
    assert bench._confirm_prewarm("dedup_cluster_keep_star") == ["dedup_ngram_jaccard"]
    for q in (
        "kcore_coorder_parts",
        "bfs_coorder_parts",
        "clustering_coefficient_parts",
        "lpa_communities_parts",
    ):
        assert bench._confirm_prewarm(q) == ["triangle_coorder_parts"], q


def test_prewarm_respects_segment_boundaries():
    # cluster_aware_split_docs is a _JACCARD_PAIRS_CACHE member but
    # opens a NEW session segment in the catalog, so it pays the pair
    # build itself and its baseline is cold — warming it in the confirm
    # session would UNDER-read and mask a real regression. This pins
    # the catalog layout the warmth model assumes; if the catalog is
    # ever reordered, this failure is the prompt to re-derive it.
    names = list(bench.QUERIES)
    i = names.index("cluster_aware_split_docs")
    j = names.index("dedup_ngram_jaccard")
    assert j < i and j // bench.RECYCLE_EVERY < i // bench.RECYCLE_EVERY
    assert bench._confirm_prewarm("cluster_aware_split_docs") == []


def test_prewarm_non_members_unaffected():
    assert bench._confirm_prewarm("agg_pricing_summary") == []
    assert bench._confirm_prewarm("not_a_query") == []


# ---------------------------------------------------------------------------
# Box-throughput canary normalization (round-8)
# ---------------------------------------------------------------------------


def test_box_factor_normalizes_slow_box_readings():
    # Same engine, box running 25% slow (SMT/turbo state): every catalog
    # reading inflates ~uniformly; the canary measures the same factor
    # and the gate judges in baseline-box units -> clean.
    base = _baseline()
    cur = {q: round(v * 1.25, 3) for q, v in base.items()}
    g = bench._cpu_gate(cur, box_factor=1.25)
    assert g["box_factor"] == 1.25
    assert g["violations"] == []
    assert abs(g["total_pct"]) < 1.0
    assert abs(g["median_pct"]) < 1.0
    assert g["current_total_raw_s"] > g["current_total_s"]


def test_box_factor_cannot_mask_real_regression(monkeypatch):
    # Engine-wide +50% on a box the canary says is only 10% slow: the
    # normalized readings still regress and the confirm corroborates.
    base = _baseline()
    cur = {q: round(v * 1.5, 3) for q, v in base.items()}
    monkeypatch.setattr(
        bench, "_cpu_confirm",
        lambda names: {**{f"__control__{c}": base[c] for c in bench.CPU_CONFIRM_CONTROLS},
                       **{n: cur[n] for n in names}},
    )
    g = bench._cpu_gate(cur, box_factor=1.1)
    assert g["median_pct"] >= 30.0
    assert len(g["violations"]) > 0


def test_box_factor_clamped_and_fast_box_scales_up():
    base = _baseline()
    # box 20% FASTER than baseline: raw readings deflate; normalization
    # scales them back up into baseline-box units -> still clean, and a
    # wild canary reading is clamped to the configured band
    cur = {q: round(v * 0.8, 3) for q, v in base.items()}
    g = bench._cpu_gate(cur, box_factor=0.8)
    assert abs(g["total_pct"]) < 1.5
    g2 = bench._cpu_gate(dict(base), box_factor=5.0)
    assert g2["box_factor"] == bench.CANARY_FACTOR_CLAMP[1]


def test_no_canary_baseline_keeps_prior_behavior():
    base = _baseline()
    g = bench._cpu_gate(dict(base), box_factor=None)
    assert g["box_factor"] is None
    assert g["total_pct"] == 0.0


def test_rotate_cpu_baseline_script_roundtrip(tmp_path, monkeypatch):
    # The rotation script must carry the per-query CPU column AND the
    # canary so next round's gate can normalize by box state.
    import importlib.util

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "rotate_cpu_baseline",
        os.path.join(here, "scripts", "rotate_cpu_baseline.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    full = {
        "executor_cpu_sec_per_run": {"q1": 1.5, "q2": 0.3},
        "executor_cpu_sec_total": 1.8,
        "box_canary": {"start_cpu_s": 14.5, "end_cpu_s": 14.7},
        "box_canary_mem": {"start_cpu_s": 38.2, "end_cpu_s": 41.0},
    }
    with open(tmp_path / "BENCH_FULL.json", "w") as f:
        json.dump(full, f)
    monkeypatch.setattr(mod, "HERE", str(tmp_path))
    monkeypatch.setattr(sys, "argv", ["rotate_cpu_baseline.py", "9"])
    assert mod.main() == 0
    with open(tmp_path / "bench_cpu_baseline.json") as f:
        base = json.load(f)
    assert base["round"] == 9
    assert base["executor_cpu_sec_per_run"] == full["executor_cpu_sec_per_run"]
    assert base["box_canary_cpu_s"] == 14.5
    assert base["box_canary_mem_cpu_s"] == 38.2


def test_rotate_cpu_baseline_tolerates_missing_mem_canary(tmp_path, monkeypatch):
    # Artifacts written before the memory canary existed must still rotate.
    import importlib.util

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "rotate_cpu_baseline",
        os.path.join(here, "scripts", "rotate_cpu_baseline.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    full = {
        "executor_cpu_sec_per_run": {"q1": 1.5},
        "executor_cpu_sec_total": 1.5,
        "box_canary": {"start_cpu_s": 12.0},
    }
    with open(tmp_path / "BENCH_FULL.json", "w") as f:
        json.dump(full, f)
    monkeypatch.setattr(mod, "HERE", str(tmp_path))
    monkeypatch.setattr(sys, "argv", ["rotate_cpu_baseline.py", "9"])
    assert mod.main() == 0
    with open(tmp_path / "bench_cpu_baseline.json") as f:
        base = json.load(f)
    assert base["box_canary_mem_cpu_s"] is None


def test_select_box_factor_prefers_memory_axis():
    # The one observed divergence had ALU and memory ANTI-correlated
    # (ALU 17% faster, catalog +10% tracking memory): when both canaries
    # have baselines, the memory factor governs; ALU is the fallback for
    # pre-memory-canary baselines; neither -> None (gate inert).
    assert bench._select_box_factor(0.83, 1.1) == (1.1, "mem")
    assert bench._select_box_factor(1.2, None) == (1.2, "alu")
    assert bench._select_box_factor(None, 1.05) == (1.05, "mem")
    assert bench._select_box_factor(None, None) == (None, None)


def test_r9_baseline_activates_both_canaries():
    """r8 order 1: the rotated baseline must carry BOTH canary readings
    from the r8 closing artifact so _select_box_factor has a real
    denominator — until it does, the gate cannot normalize a degraded
    box and still depends on retire-by-rerun."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "bench_cpu_baseline.json")) as f:
        base = json.load(f)
    assert base["round"] >= 9
    assert isinstance(base.get("box_canary_cpu_s"), (int, float))
    assert isinstance(base.get("box_canary_mem_cpu_s"), (int, float))


def test_degraded_memory_box_rescales_comparison():
    """End-to-end r8 failure mode: memory bandwidth degrades +30%
    (catalog readings inflate ~uniformly) while the ALU canary reads
    the box FASTER. The mem factor must govern and the gate must judge
    the inflated readings clean in baseline-box units."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "bench_cpu_baseline.json")) as f:
        baseline = json.load(f)
    mem_base = baseline["box_canary_mem_cpu_s"]
    alu_base = baseline["box_canary_cpu_s"]
    # current-session canaries: ALU 17% faster, memory 30% slower — the
    # anti-correlated pair actually observed in r8
    alu_factor = round(alu_base * 0.83 / alu_base, 3)
    mem_factor = round(mem_base * 1.30 / mem_base, 3)
    factor, source = bench._select_box_factor(alu_factor, mem_factor)
    assert source == "mem" and factor == 1.3
    base_q = baseline["executor_cpu_sec_per_run"]
    cur = {q: round(v * 1.3, 3) for q, v in base_q.items()}
    g = bench._cpu_gate(cur, box_factor=factor)
    assert g["box_factor"] == 1.3
    assert g["violations"] == []
    assert abs(g["total_pct"]) < 1.5 and abs(g["median_pct"]) < 1.5


# -- Two-strike ABAB escalation (round-10, per r9 VERDICT order 3) -------


def _flag_one(base, q, confirm_ratio=1.05):
    """A catalog run flagging ``q`` at 2x with a confirm session reading
    controls at baseline and the candidate at ``confirm_ratio``."""
    cur = dict(base)
    cur[q] = round(base[q] * 2.0, 2)
    confirm = {f"__control__{c}": base[c] for c in bench.CPU_CONFIRM_CONTROLS}
    confirm[q] = round(base[q] * confirm_ratio, 2)
    return cur, confirm


def test_first_flag_settles_on_single_confirm_and_records_strike(monkeypatch):
    base = _baseline()
    big = _biggest(base)
    cur, confirm = _flag_one(base, big)
    monkeypatch.setattr(bench, "_cpu_confirm", lambda names: dict(confirm))
    g = bench._cpu_gate(cur)
    # no prior strike -> single-confirm adjudication, no ABAB evidence
    assert g["regressions"][big]["verdict"] == "reverted-on-confirm (box noise)"
    assert "abab" not in g["regressions"][big]
    ledger = json.load(open(os.environ["SPARK_GRAFT_FLAG_HISTORY"]))
    assert ledger[big][0]["count"] == 1


def test_second_flag_same_baseline_escalates_to_abab(monkeypatch):
    """r8's pack episode: a single confirm can mis-read. A query flagged
    twice on the same baseline must NOT be retired on another single
    confirm — the interleaved ABAB median adjudicates."""
    base = _baseline()
    big = _biggest(base)
    cur, confirm = _flag_one(base, big)
    monkeypatch.setattr(bench, "_cpu_confirm", lambda names: dict(confirm))
    bench._cpu_gate(cur)  # strike 1 recorded

    abab_calls = []

    def fake_abab(names, reps=bench.ABAB_REPS):
        abab_calls.append(list(names))
        return {n: {"samples_s": [base[n]] * 3,
                    "calibrated_s": [round(base[n] * r, 2) for r in (0.98, 1.03, 1.01)],
                    "reps": 3,
                    "median_calibrated_s": round(base[n] * 1.01, 2)}
                for n in names}

    monkeypatch.setattr(bench, "_cpu_abab", fake_abab)
    g = bench._cpu_gate(cur)  # strike 2: must escalate
    assert abab_calls == [[big]]
    row = g["regressions"][big]
    assert row["strikes_prior"] >= 1
    assert row["abab"]["median_calibrated_s"] is not None
    assert row["verdict"] == "reverted-on-abab (box noise, two-strike)"
    assert big not in g["violations"]
    # both strikes are on the ledger now
    ledger = json.load(open(os.environ["SPARK_GRAFT_FLAG_HISTORY"]))
    assert ledger[big][0]["count"] == 2


def test_prior_round_strike_escalates_immediately(monkeypatch):
    """A flag recorded under a PREVIOUS baseline (consecutive-round
    repeat) escalates on the very first flag of the new round."""
    base = _baseline()
    big = _biggest(base)
    with open(os.environ["SPARK_GRAFT_FLAG_HISTORY"], "w") as f:
        json.dump({big: [{"baseline_round": -1, "count": 1,
                          "verdict": "reverted-on-confirm (box noise)",
                          "pct": 40.0}]}, f)
    cur, confirm = _flag_one(base, big)
    monkeypatch.setattr(bench, "_cpu_confirm", lambda names: dict(confirm))

    def fake_abab(names, reps=bench.ABAB_REPS):
        return {n: {"samples_s": [], "calibrated_s": [], "reps": 3,
                    "median_calibrated_s": round(base[n] * 1.02, 2)}
                for n in names}

    monkeypatch.setattr(bench, "_cpu_abab", fake_abab)
    g = bench._cpu_gate(cur)
    assert g["regressions"][big]["verdict"] == (
        "reverted-on-abab (box noise, two-strike)"
    )


def test_abab_confirms_real_regression_as_violation(monkeypatch):
    base = _baseline()
    big = _biggest(base)
    with open(os.environ["SPARK_GRAFT_FLAG_HISTORY"], "w") as f:
        json.dump({big: [{"baseline_round": -1, "count": 1,
                          "verdict": "confirmed", "pct": 60.0}]}, f)
    cur, confirm = _flag_one(base, big, confirm_ratio=1.9)
    monkeypatch.setattr(bench, "_cpu_confirm", lambda names: dict(confirm))

    def fake_abab(names, reps=bench.ABAB_REPS):
        return {n: {"samples_s": [], "calibrated_s": [], "reps": 3,
                    "median_calibrated_s": round(base[n] * 1.9, 2)}
                for n in names}

    monkeypatch.setattr(bench, "_cpu_abab", fake_abab)
    g = bench._cpu_gate(cur)
    assert g["regressions"][big]["verdict"] == "confirmed (abab)"
    assert big in g["violations"]


def test_abab_instrumentation_gap_stays_flagged(monkeypatch):
    """An unreadable ABAB (UI totals unavailable in every rep) must keep
    the repeat flag a violation, never hide it."""
    base = _baseline()
    big = _biggest(base)
    with open(os.environ["SPARK_GRAFT_FLAG_HISTORY"], "w") as f:
        json.dump({big: [{"baseline_round": -1, "count": 1,
                          "verdict": "confirmed", "pct": 60.0}]}, f)
    cur, confirm = _flag_one(base, big)
    monkeypatch.setattr(bench, "_cpu_confirm", lambda names: dict(confirm))
    # autouse stub already returns median None
    g = bench._cpu_gate(cur)
    assert g["regressions"][big]["verdict"] == "confirmed (abab unreadable)"
    assert big in g["violations"]


def test_annulled_row_still_counts_prior_strikes():
    """r11 VERDICT #2 semantics, pinned: annulment supersedes the
    VERDICT (the r10 'confirmed (abab)' was instrument poisoning), not
    the strike history — the flag firings were real events, so a
    re-flag must still escalate to ABAB, same as before the annulment."""
    annulled = {
        "baseline_round": 10,
        "count": 2,
        "pct": 42.2,
        "verdict": "confirmed (abab) [ANNULLED r12 — see annulled.reason]",
        "annulled": {"round": 12, "original_verdict": "confirmed (abab)",
                     "reason": "instrument poisoning"},
    }
    history = {"q": [annulled]}
    assert bench._prior_strikes(history, "q", 10) == 2  # same baseline: count
    assert bench._prior_strikes(history, "q", 11) == 1  # other baseline: once


def test_record_flag_history_never_mutates_annulled_row(monkeypatch, tmp_path):
    """An annulled row is a sealed historical record: a fresh flag on the
    same (query, baseline) appends a NEW row instead of overwriting the
    annulled verdict/pct — otherwise the recorded supersession (and the
    raw poisoned evidence it annotates) would silently vanish."""
    monkeypatch.setenv("SPARK_GRAFT_FLAG_HISTORY", str(tmp_path / "flags.json"))
    annulled = {
        "baseline_round": 10,
        "count": 2,
        "pct": 42.2,
        "verdict": "confirmed (abab) [ANNULLED r12 — see annulled.reason]",
        "annulled": {"round": 12, "original_verdict": "confirmed (abab)",
                     "reason": "instrument poisoning"},
    }
    history = {"q": [dict(annulled)]}
    bench._record_flag_history(
        history, {"q": {"verdict": "reverted-on-confirm (box noise)", "pct": 30.0}}, 10
    )
    assert history["q"][0] == annulled  # untouched, annotation intact
    assert len(history["q"]) == 2
    assert history["q"][1] == {
        "baseline_round": 10, "count": 1, "pct": 30.0,
        "verdict": "reverted-on-confirm (box noise)",
    }
    # and both rows keep counting as strikes
    assert bench._prior_strikes(history, "q", 10) == 3


def test_abab_box_evidence_factors(monkeypatch):
    """r12: escalation sessions stamp their own box state so a confirm
    taken in a dirty window is self-annotating. Factors are computed
    against the rotated baseline's canaries; missing baselines yield
    None factors, never a crash."""
    monkeypatch.setattr(bench, "_box_canary", lambda s: 14.93)
    monkeypatch.setattr(bench, "_box_canary_mem", lambda s: 42.91)
    ev = bench._abab_box_evidence(
        None, {"box_canary_cpu_s": 12.44, "box_canary_mem_cpu_s": 35.76}
    )
    assert ev["alu_cpu_s"] == 14.93 and ev["mem_cpu_s"] == 42.91
    assert ev["alu_factor"] == 1.2 and ev["mem_factor"] == 1.2
    ev2 = bench._abab_box_evidence(None, {})
    assert ev2["alu_factor"] is None and ev2["mem_factor"] is None
    monkeypatch.setattr(bench, "_box_canary", lambda s: None)
    ev3 = bench._abab_box_evidence(None, {"box_canary_cpu_s": 12.44})
    assert ev3["alu_cpu_s"] is None and ev3["alu_factor"] is None


# -- Dirty-window self-defense (round-13, per r12 VERDICT order 2) -------


def _clean_box():
    return {"start": {"alu_factor": 0.97, "mem_factor": 1.01},
            "end": {"alu_factor": 0.99, "mem_factor": 1.03},
            "dirty_threshold_factor": bench.ABAB_BOX_DIRTY_FACTOR,
            "dirty": False}


def _dirty_box():
    return {"start": {"alu_factor": 1.02, "mem_factor": 1.31},
            "end": {"alu_factor": 1.05, "mem_factor": 1.4},
            "dirty_threshold_factor": bench.ABAB_BOX_DIRTY_FACTOR,
            "dirty": True}


def _abab_stub_factory(base, boxes, ratio=1.9, calls=None):
    """fake _cpu_abab returning a regressing median with the next box
    state popped from ``boxes`` on each call."""
    def fake_abab(names, reps=bench.ABAB_REPS):
        if calls is not None:
            calls.append(list(names))
        box = boxes.pop(0)
        return {n: {"samples_s": [], "calibrated_s": [], "reps": 3,
                    "median_calibrated_s": round(base[n] * ratio, 2),
                    "session_box": box}
                for n in names}
    return fake_abab


def _prime_strike(q):
    with open(os.environ["SPARK_GRAFT_FLAG_HISTORY"], "w") as f:
        json.dump({q: [{"baseline_round": -1, "count": 1,
                        "verdict": "confirmed", "pct": 60.0}]}, f)


def test_box_dirty_thresholds():
    t = bench.ABAB_BOX_DIRTY_FACTOR
    assert bench._box_dirty({"alu_factor": t + 0.01, "mem_factor": 1.0})
    assert bench._box_dirty({"alu_factor": 1.0, "mem_factor": t + 0.01})
    assert not bench._box_dirty({"alu_factor": t, "mem_factor": t})  # at, not over
    # None factors cannot adjudicate dirt (no canary baseline): clean
    assert not bench._box_dirty({"alu_factor": None, "mem_factor": None})
    assert not bench._box_dirty({})
    assert not bench._box_dirty(None)


def test_compose_session_box_dirty_on_either_sample():
    clean = {"alu_factor": 0.98, "mem_factor": 1.0}
    dirty = {"alu_factor": 0.99, "mem_factor": 1.3}
    assert bench._compose_session_box(clean, clean)["dirty"] is False
    # mid-session degradation: start clean, end dirty -> session dirty
    assert bench._compose_session_box(clean, dirty)["dirty"] is True
    assert bench._compose_session_box(dirty, clean)["dirty"] is True
    box = bench._compose_session_box(clean, dirty)
    assert box["start"] == clean and box["end"] == dirty
    assert box["dirty_threshold_factor"] == bench.ABAB_BOX_DIRTY_FACTOR


def test_dirty_window_confirm_never_lands_as_confirmed(monkeypatch):
    """The r12 failure mode, closed: a regressing ABAB median measured in
    a dirty window must not enter the ledger as 'confirmed (abab)' — the
    gate retries solo, and a still-dirty retry records as deferred (a
    violation, so nothing is masked, but no post-hoc annulment needed)."""
    base = _baseline()
    big = _biggest(base)
    _prime_strike(big)
    cur, confirm = _flag_one(base, big, confirm_ratio=1.9)
    monkeypatch.setattr(bench, "_cpu_confirm", lambda names: dict(confirm))
    calls = []
    monkeypatch.setattr(
        bench, "_cpu_abab",
        _abab_stub_factory(base, [_dirty_box(), _dirty_box()], calls=calls))
    g = bench._cpu_gate(cur)
    row = g["regressions"][big]
    assert calls == [[big], [big]]  # escalation + automatic solo re-run
    assert row["verdict"] == "deferred (dirty window)"
    assert "confirmed" not in row["verdict"]
    assert row["abab_dirty_attempt"]["session_box"]["dirty"] is True
    assert big in g["violations"]  # deferral never hides the flag
    ledger = json.load(open(os.environ["SPARK_GRAFT_FLAG_HISTORY"]))
    assert all("confirmed" not in (r.get("verdict") or "")
               or r.get("baseline_round") == -1
               for r in ledger[big])
    assert ledger[big][-1]["verdict"] == "deferred (dirty window)"


def test_dirty_window_retry_clean_confirms(monkeypatch):
    """A clean solo re-run that still regresses IS a real confirm — the
    defense defers dirty evidence, it does not grant immunity."""
    base = _baseline()
    big = _biggest(base)
    _prime_strike(big)
    cur, confirm = _flag_one(base, big, confirm_ratio=1.9)
    monkeypatch.setattr(bench, "_cpu_confirm", lambda names: dict(confirm))
    monkeypatch.setattr(
        bench, "_cpu_abab",
        _abab_stub_factory(base, [_dirty_box(), _clean_box()]))
    g = bench._cpu_gate(cur)
    row = g["regressions"][big]
    assert row["verdict"] == "confirmed (abab)"
    assert row["abab"]["session_box"]["dirty"] is False  # verdict from clean run
    assert row["abab_dirty_attempt"]["session_box"]["dirty"] is True
    assert big in g["violations"]


def test_dirty_window_retry_clean_reverts(monkeypatch):
    """The r12 agg_approx_stats shape exactly: dirty window reads +90%,
    the solo re-run reads in band -> reverted, no flag, no annulment."""
    base = _baseline()
    big = _biggest(base)
    _prime_strike(big)
    cur, confirm = _flag_one(base, big, confirm_ratio=1.9)
    monkeypatch.setattr(bench, "_cpu_confirm", lambda names: dict(confirm))
    boxes = [_dirty_box(), _clean_box()]
    calls = []

    def fake_abab(names, reps=bench.ABAB_REPS):
        calls.append(list(names))
        box = boxes.pop(0)
        ratio = 1.9 if box["dirty"] else 1.02  # solo re-run reads in band
        return {n: {"samples_s": [], "calibrated_s": [], "reps": 3,
                    "median_calibrated_s": round(base[n] * ratio, 2),
                    "session_box": box}
                for n in names}

    monkeypatch.setattr(bench, "_cpu_abab", fake_abab)
    g = bench._cpu_gate(cur)
    row = g["regressions"][big]
    assert calls == [[big], [big]]
    assert row["verdict"] == "reverted-on-abab (box noise, two-strike)"
    assert big not in g["violations"]


def test_clean_window_confirm_lands_without_retry(monkeypatch):
    """A confirm whose session evidence is in band adjudicates exactly as
    before — one ABAB session, no retry, no deferral."""
    base = _baseline()
    big = _biggest(base)
    _prime_strike(big)
    cur, confirm = _flag_one(base, big, confirm_ratio=1.9)
    monkeypatch.setattr(bench, "_cpu_confirm", lambda names: dict(confirm))
    calls = []
    monkeypatch.setattr(
        bench, "_cpu_abab",
        _abab_stub_factory(base, [_clean_box()], calls=calls))
    g = bench._cpu_gate(cur)
    row = g["regressions"][big]
    assert calls == [[big]]
    assert row["verdict"] == "confirmed (abab)"
    assert "abab_dirty_attempt" not in row


def test_dirty_window_reverted_is_not_deferred(monkeypatch):
    """Deliberate asymmetry: window dirt only inflates readings, so a
    calibrated median that lands in band even in a dirty window is safe
    evidence of noise — no retry burned on it."""
    base = _baseline()
    big = _biggest(base)
    _prime_strike(big)
    cur, confirm = _flag_one(base, big, confirm_ratio=1.9)
    monkeypatch.setattr(bench, "_cpu_confirm", lambda names: dict(confirm))
    calls = []
    monkeypatch.setattr(
        bench, "_cpu_abab",
        _abab_stub_factory(base, [_dirty_box()], ratio=1.02, calls=calls))
    g = bench._cpu_gate(cur)
    assert calls == [[big]]
    assert g["regressions"][big]["verdict"] == (
        "reverted-on-abab (box noise, two-strike)"
    )
    assert big not in g["violations"]


def test_box_dirty_failed_canary_with_baseline_is_indeterminate():
    """r13 ADVICE: a canary that failed to RUN (cpu None) while its
    rotated baseline exists cannot adjudicate the window clean — the
    instrument's own failure mode is most likely in exactly the
    contended windows the defense targets. No-baseline None factors stay
    clean (adjudication rests on the control calibration)."""
    # canary failed, baseline present -> indeterminate -> dirty
    assert bench._box_dirty(
        {"alu_factor": None, "alu_cpu_s": None, "alu_base_cpu_s": 12.44,
         "mem_factor": 1.0, "mem_cpu_s": 35.0, "mem_base_cpu_s": 35.76})
    assert bench._box_dirty(
        {"alu_factor": 1.0, "alu_cpu_s": 12.5, "alu_base_cpu_s": 12.44,
         "mem_factor": None, "mem_cpu_s": None, "mem_base_cpu_s": 35.76})
    # no baseline recorded -> clean by convention (pre-r14 artifacts too)
    assert not bench._box_dirty(
        {"alu_factor": None, "alu_cpu_s": 12.5, "alu_base_cpu_s": None,
         "mem_factor": None, "mem_cpu_s": None, "mem_base_cpu_s": None})
    assert not bench._box_dirty({"alu_factor": None, "mem_factor": None})


def test_abab_box_evidence_carries_canary_baselines(monkeypatch):
    """The evidence dict ships the baselines so _box_dirty can tell
    'canary failed with a baseline' apart from 'no baseline rotated'."""
    monkeypatch.setattr(bench, "_box_canary", lambda s: None)
    monkeypatch.setattr(bench, "_box_canary_mem", lambda s: 36.0)
    ev = bench._abab_box_evidence(
        None, {"box_canary_cpu_s": 12.44, "box_canary_mem_cpu_s": 35.76})
    assert ev["alu_base_cpu_s"] == 12.44 and ev["mem_base_cpu_s"] == 35.76
    assert ev["alu_factor"] is None
    assert bench._box_dirty(ev)  # failed alu canary + baseline = dirty
    ev2 = bench._abab_box_evidence(None, {})
    assert ev2["alu_base_cpu_s"] is None and not bench._box_dirty(ev2)


def _unreadable_abab_stub(boxes, calls=None):
    """fake _cpu_abab whose calibration broke: median None every call."""
    def fake_abab(names, reps=bench.ABAB_REPS):
        if calls is not None:
            calls.append(list(names))
        box = boxes.pop(0)
        return {n: {"samples_s": [None], "calibrated_s": [None], "reps": 3,
                    "median_calibrated_s": None, "session_box": box}
                for n in names}
    return fake_abab


def test_dirty_window_unreadable_confirm_is_retried_and_deferred(monkeypatch):
    """r13 ADVICE (medium): the defense must intercept EVERY confirmed*
    verdict, including 'confirmed (abab unreadable)' — calibration
    breaking is MORE likely in the contention that dirties the box, and
    an unreadable confirm from dirty evidence was skipping the retry and
    landing in the ledger as a confirm from dirty evidence."""
    base = _baseline()
    big = _biggest(base)
    _prime_strike(big)
    cur, confirm = _flag_one(base, big, confirm_ratio=1.9)
    monkeypatch.setattr(bench, "_cpu_confirm", lambda names: dict(confirm))
    calls = []
    monkeypatch.setattr(
        bench, "_cpu_abab",
        _unreadable_abab_stub([_dirty_box(), _dirty_box()], calls=calls))
    g = bench._cpu_gate(cur)
    row = g["regressions"][big]
    assert calls == [[big], [big]]  # retry fired for the unreadable confirm
    assert row["verdict"] == "deferred (dirty window)"
    assert big in g["violations"]  # still a violation, nothing masked
    ledger = json.load(open(os.environ["SPARK_GRAFT_FLAG_HISTORY"]))
    assert ledger[big][-1]["verdict"] == "deferred (dirty window)"


def test_unreadable_confirm_clean_window_stays_flagged(monkeypatch):
    """In a CLEAN window the unreadable verdict keeps its pre-r14
    semantics: flagged (instrumentation gap), no retry burned."""
    base = _baseline()
    big = _biggest(base)
    _prime_strike(big)
    cur, confirm = _flag_one(base, big, confirm_ratio=1.9)
    monkeypatch.setattr(bench, "_cpu_confirm", lambda names: dict(confirm))
    calls = []
    monkeypatch.setattr(
        bench, "_cpu_abab", _unreadable_abab_stub([_clean_box()], calls=calls))
    g = bench._cpu_gate(cur)
    row = g["regressions"][big]
    assert calls == [[big]]
    assert row["verdict"] == "confirmed (abab unreadable)"
    assert big in g["violations"]


def test_malformed_settle_env_does_not_crash_the_gate(monkeypatch):
    """r13 ADVICE (low): a malformed SPARK_GRAFT_ABAB_SETTLE_S must fall
    back to the default settle, not raise ValueError mid-gate after the
    expensive catalog pass."""
    base = _baseline()
    big = _biggest(base)
    _prime_strike(big)
    cur, confirm = _flag_one(base, big, confirm_ratio=1.9)
    monkeypatch.setattr(bench, "_cpu_confirm", lambda names: dict(confirm))
    monkeypatch.setattr(
        bench, "_cpu_abab",
        _abab_stub_factory(base, [_dirty_box(), _clean_box()]))
    monkeypatch.setenv("SPARK_GRAFT_ABAB_SETTLE_S", "not-a-number")
    monkeypatch.setattr(bench, "ABAB_DIRTY_SETTLE_S", 0.0)  # don't sleep 30s
    g = bench._cpu_gate(cur)  # must not raise
    assert g["regressions"][big]["verdict"] == "confirmed (abab)"


def test_repo_ledger_carries_the_annulment():
    """The committed ledger's poisoned r10 'confirmed (abab)' on
    agg_approx_accuracy must carry the r12 annulment so no automated
    escalation or human reader builds on the known-false confirm
    (r11 VERDICT wrong #1 / order #2)."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, bench.FLAG_HISTORY_FILE)) as f:
        ledger = json.load(f)
    # select by the annulment marker itself — a future legitimate row
    # reaching (baseline 10, count 2) via the append-then-bump path must
    # not make this spuriously ambiguous (r12 review)
    rows = [r for r in ledger["agg_approx_accuracy"] if r.get("annulled")]
    assert len(rows) == 1
    row = rows[0]
    assert row["baseline_round"] == 10
    assert "ANNULLED" in row["verdict"]
    ann = row["annulled"]
    assert ann["round"] == 12
    assert ann["original_verdict"] == "confirmed (abab)"
    assert "poisoning" in ann["reason"]
    # raw evidence retained
    assert row["pct"] == 42.2 and row["count"] == 2


def test_repo_ledger_seeded_with_r9_watchlist():
    """The three queries r9 retired on single confirms must escalate on
    any r10 re-flag — the committed ledger carries their r9 strike."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, bench.FLAG_HISTORY_FILE)) as f:
        ledger = json.load(f)
    for q in ("corpus_dup_ngram_profile", "order_burst_components",
              "order_price_distribution"):
        assert any(row["baseline_round"] == 9 for row in ledger[q]), q


def test_missing_control_reading_fails_health_check(monkeypatch):
    """r9 ADVICE: a configured control that never reported used to be
    silently dropped from control_detail, letting the health check pass
    vacuously on exactly the degraded sessions it exists to catch."""
    base = _baseline()
    big = _biggest(base)
    cur = dict(base)
    cur[big] = round(base[big] * 2.0, 2)
    ctl_ok, ctl_missing = bench.CPU_CONFIRM_CONTROLS[:2]

    def fake_confirm(names):
        out = {f"__control__{c}": base[c] * 1.02
               for c in bench.CPU_CONFIRM_CONTROLS}
        out[f"__control__{ctl_missing}"] = None
        out.update({n: cur[n] for n in names})
        return out

    monkeypatch.setattr(bench, "_cpu_confirm", fake_confirm)
    g = bench._cpu_gate(cur)
    assert g["confirm_controls"][ctl_missing]["present"] is False
    assert g["confirm_controls"][ctl_missing]["in_band"] is None
    assert g["confirm_controls_in_band"] is False


def test_out_of_band_control_excluded_from_calibration(monkeypatch):
    """r10 field finding: under a degraded-memory box the scan-bound
    control read 1.22x baseline while the exchange-bound one read 0.53x
    (cache-friendly in a quiet session); their MEAN (0.88) inflated an
    in-band mem-bound candidate into a phantom ABAB confirm. Out-of-band
    control readings are excluded from the calibration (they are not
    measuring session offset — their own in_band field says so); the
    health check still reports the session degraded."""
    base = _baseline()
    big = _biggest(base)
    cur = dict(base)
    cur[big] = round(base[big] * 2.0, 2)
    ctl_a, ctl_b, ctl_py = bench.CPU_CONFIRM_CONTROLS
    confirm = {f"__control__{ctl_a}": round(base[ctl_a] * 1.22, 3),  # in band
               f"__control__{ctl_b}": round(base[ctl_b] * 0.53, 3),  # out
               # third (Python-boundary) control, r10 order 3: the
               # exclusion rule now keeps a QUORUM of two in-band
               # controls instead of hanging on a single reading
               f"__control__{ctl_py}": round(base[ctl_py] * 1.18, 3)}
    confirm[big] = round(base[big] * 1.25, 2)  # slow-box raw, in band once divided
    g = _gate_with_confirm(monkeypatch, cur, confirm)
    # calibration = mean of the two in-band readings (~1.20), never the
    # poisoned all-controls mean (~0.98 here)
    assert 1.17 <= g["confirm_calibration"] <= 1.23
    assert g["regressions"][big]["verdict"] == "reverted-on-confirm (box noise)"
    assert g["confirm_controls_in_band"] is False


def test_all_controls_out_of_band_keeps_clamped_mean(monkeypatch):
    """The r7 anti-masking case must survive the in-band-only rule: when
    EVERY control reads out of band (all-fast quiet session), the clamped
    mean still applies and a genuinely regressed candidate is confirmed."""
    base = _baseline()
    big = _biggest(base)
    cur = dict(base)
    cur[big] = round(base[big] * 2.0, 2)
    ctl = bench.CPU_CONFIRM_CONTROLS
    confirm = {f"__control__{c}": round(base[c] * 0.5, 3) for c in ctl}
    confirm[big] = round(base[big] * 1.4, 2)
    g = _gate_with_confirm(monkeypatch, cur, confirm)
    assert g["confirm_calibration"] == bench.CPU_CONFIRM_CAL_CLAMP[0]
    assert g["regressions"][big]["verdict"] == "confirmed"


def test_three_controls_cover_disjoint_axes():
    """r10 order 3: the control set must include a Python-boundary query
    (the axis neither the scan-bound nor the exchange-bound control
    touches), so a single-axis box degradation can exclude one control
    and still leave a calibration QUORUM of two."""
    assert len(bench.CPU_CONFIRM_CONTROLS) == 3
    assert "robust_outlier_prices_sampled" in bench.CPU_CONFIRM_CONTROLS


# -- _calibrated_median (r10 ADVICE: never let a raw sample adjudicate) --


def test_calibrated_median_excludes_uncalibrated_reps():
    # the None (a rep with no usable calibration) must not count — the
    # old code appended the RAW sample instead, letting an uncalibrated
    # reading adjudicate a two-strike flag
    assert bench._calibrated_median([2.0, None, 3.0, 4.0]) == 3.0
    assert bench._calibrated_median([None, None]) is None
    assert bench._calibrated_median([]) is None
    assert bench._calibrated_median([5.0]) == 5.0


def test_calibrated_median_even_count_averages_middle():
    # a dropped rep can turn the odd rep count even; the upper-middle
    # pick would land the documented hot first rep ON the median —
    # average the two middle values instead
    assert bench._calibrated_median([4.0, 1.0, 2.0, 3.0]) == 2.5
    assert bench._calibrated_median([2.0, None, 4.0]) == 3.0


# -- sf1.0 shape mini-gate (r15, VERDICT r14 order 1) -------------------


def _sf10_baseline() -> dict:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, bench.SF10_BASELINE_FILE)) as f:
        return json.load(f)


def _fake_sf10_run(base: dict, scale: dict | None = None,
                   shuffle_add: dict | None = None) -> dict:
    """Synthesize a _sf10_measure result from the committed baseline:
    per-shape CPU multiplied by ``scale``, shuffle MB shifted by
    ``shuffle_add``; canaries copied so the factor is exactly 1.0."""
    shapes = {}
    for n, s in base["shapes"].items():
        shapes[n] = {
            "wall_min_s": 1.0,
            "cpu_s_per_run": round(
                s["cpu_s_per_run"] * (scale or {}).get(n, 1.0), 2
            ),
            "shuffle_write_mb_per_run": round(
                s["shuffle_write_mb_per_run"] + (shuffle_add or {}).get(n, 0.0),
                2,
            ),
        }
    return {
        "shapes": shapes,
        "box_canary_cpu_s": base["box_canary_cpu_s"],
        "box_canary_mem_cpu_s": base["box_canary_mem_cpu_s"],
    }


class TestSf10Gate:
    """Pure-arithmetic coverage of run_sf10_gate: _sf10_measure is
    monkeypatched, the committed bench_sf10_baseline.json is the ruler
    (exactly what the real gate reads)."""

    def _run(self, monkeypatch, runs: list[dict]) -> dict:
        # Hermetic against a fresh checkout: the real fixture dir
        # (tmp_scale_fixture/sf1.0) is gitignored and built on demand, and
        # _sf10_measure is stubbed below — any existing directory satisfies
        # the gate's isdir guard without touching Spark or the fixture.
        monkeypatch.setenv(
            "SPARK_GRAFT_SF10_DIR", os.path.dirname(os.path.abspath(__file__))
        )
        it = iter(runs)
        monkeypatch.setattr(
            bench, "_sf10_measure", lambda names, sf_dir: next(it)
        )
        return bench.run_sf10_gate()

    def test_clean_run_zero_flags(self, monkeypatch):
        base = _sf10_baseline()
        art = self._run(monkeypatch, [_fake_sf10_run(base)])
        assert art["flags"] == {} and art["violations"] == []
        assert art["box_factor"] == 1.0

    def test_cpu_regression_confirms(self, monkeypatch):
        base = _sf10_baseline()
        bad = {"join_revenue_by_nation": 1.6}
        art = self._run(
            monkeypatch,
            [_fake_sf10_run(base, scale=bad), _fake_sf10_run(base, scale=bad)],
        )
        row = art["flags"]["join_revenue_by_nation"]["cpu"]
        assert row["verdict"] == "confirmed"
        assert art["violations"] == ["join_revenue_by_nation"]

    def test_cpu_flag_reverts_when_confirm_reads_in_band(self, monkeypatch):
        base = _sf10_baseline()
        art = self._run(
            monkeypatch,
            [_fake_sf10_run(base, scale={"dedup_minhash_lsh": 1.6}),
             _fake_sf10_run(base)],  # confirm session reads at baseline
        )
        row = art["flags"]["dedup_minhash_lsh"]["cpu"]
        assert row["verdict"] == "reverted-on-confirm (box noise)"
        assert art["violations"] == []

    def test_shuffle_tripwire_is_a_plan_change_verdict(self, monkeypatch):
        """A reproduced shuffle-byte jump (e.g. a lost broadcast turning
        q9's dim joins into exchanges) lands as a violation even when
        CPU stays in band — the blind spot this gate exists for."""
        base = _sf10_baseline()
        jump = {"q9_product_profit": 50.0}
        art = self._run(
            monkeypatch,
            [_fake_sf10_run(base, shuffle_add=jump),
             _fake_sf10_run(base, shuffle_add=jump)],
        )
        row = art["flags"]["q9_product_profit"]["shuffle"]
        assert row["verdict"] == "confirmed (plan change)"
        assert art["violations"] == ["q9_product_profit"]

    def test_small_shuffle_jitter_not_flagged(self, monkeypatch):
        base = _sf10_baseline()
        art = self._run(
            monkeypatch,
            [_fake_sf10_run(base, shuffle_add={"join_revenue_by_nation": 4.0})],
        )
        assert art["flags"] == {}

    def test_slow_box_normalized_not_flagged(self, monkeypatch):
        """Uniform +30% CPU with the mem canary reading +30% too is box
        state, not a regression — the factor divides it out."""
        base = _sf10_baseline()
        run = _fake_sf10_run(
            base, scale={n: 1.3 for n in base["shapes"]}
        )
        run["box_canary_mem_cpu_s"] = round(
            base["box_canary_mem_cpu_s"] * 1.3, 2
        )
        run["box_canary_cpu_s"] = round(base["box_canary_cpu_s"] * 1.3, 2)
        art = self._run(monkeypatch, [run])
        assert art["flags"] == {} and art["violations"] == []

    def test_missing_fixture_is_loud_not_crash(self, monkeypatch):
        monkeypatch.setenv("SPARK_GRAFT_SF10_DIR", "/nonexistent-sf10")
        art = bench.run_sf10_gate()
        assert "fixture missing" in art["error"]


class TestFreshAdoption:
    """r15 warmth-variance correction: a catalog recording more than
    FRESH_ADOPT_BAND over its own cold-process re-time is replaced by
    the fresh value (the truer fresh-session figure); in-band and
    faster-than-fresh recordings are never touched."""

    def test_inflated_recording_adopts_fresh(self):
        timings = {"a": 2.68, "b": 1.0}
        fresh = {"a": {"recorded_s": 2.68, "fresh_s": 2.20,
                       "recorded_over_fresh": 1.218}}
        adopted = bench._adopt_fresh(timings, fresh)
        assert timings["a"] == 2.20 and timings["b"] == 1.0
        assert adopted["a"]["catalog_recorded_s"] == 2.68

    def test_in_band_and_fast_recordings_untouched(self):
        timings = {"a": 2.0, "b": 3.0}
        fresh = {
            "a": {"fresh_s": 1.9, "recorded_over_fresh": 1.05},
            "b": {"fresh_s": 3.8, "recorded_over_fresh": 0.79},
        }
        assert bench._adopt_fresh(timings, fresh) == {}
        assert timings == {"a": 2.0, "b": 3.0}

    def test_errored_fresh_rows_skipped(self):
        timings = {"a": 2.0}
        fresh = {"a": {"error": "timeout"}}
        assert bench._adopt_fresh(timings, fresh) == {}
        assert timings["a"] == 2.0


# -- headline dirty-window guard + slim line (r16, r15 VERDICT 1-2) -----


class TestHeadlineGuard:
    def test_retry_needed_past_band(self, monkeypatch):
        monkeypatch.delenv("SPARK_GRAFT_HEADLINE_RETRY", raising=False)
        assert bench._headline_retry_needed(bench.HEADLINE_DIRTY_BAND + 0.01)
        # r15's observed dirty reading must trip the guard
        assert bench._headline_retry_needed(1.251)

    def test_no_retry_inside_band_or_unknown(self, monkeypatch):
        monkeypatch.delenv("SPARK_GRAFT_HEADLINE_RETRY", raising=False)
        assert not bench._headline_retry_needed(bench.HEADLINE_DIRTY_BAND)
        assert not bench._headline_retry_needed(1.0)
        # no canary baseline -> no factor -> never retry (prior behavior)
        assert not bench._headline_retry_needed(None)

    def test_env_kill_switch(self, monkeypatch):
        monkeypatch.setenv("SPARK_GRAFT_HEADLINE_RETRY", "0")
        assert not bench._headline_retry_needed(2.0)

    def test_attempt_factors_select_memory_axis(self):
        attempt = {"canary_start": 14.2, "canary_mem_start": 38.46}
        alu, mem, box, src = bench._attempt_factors(attempt, 10.21, 30.75)
        assert alu == 1.391 and mem == 1.251
        assert box == 1.251 and src == "mem"

    def test_attempt_factors_without_baseline(self):
        attempt = {"canary_start": 14.2, "canary_mem_start": 38.46}
        alu, mem, box, src = bench._attempt_factors(attempt, None, None)
        assert (alu, mem, box, src) == (None, None, None, None)


class TestSlimLine:
    def _full(self, timings, **extra):
        full = {
            "metric": "catalog_total_runtime", "value": 142.6, "unit": "sec",
            "n_queries": len(timings), "sf": 0.1,
            "os_loadavg_at_start": [5.27, 11.24, 10.31],
            "executor_sec_total": 181.6, "executor_cpu_sec_total": 105.6,
            "box_canary": {"alu_factor": 1.391},
            "box_canary_mem": {"mem_factor": 1.251},
            "box_factor_source": "mem",
            "cpu_gate": {"total_pct": -10.2, "median_pct": -4.8,
                         "violations": [], "box_factor": 1.251},
        }
        full.update(extra)
        return full

    def test_floor_35_queries_with_every_block_present(self):
        """The r15 failure mode: fresh_adopted + canary dicts ate the
        budget and shrank the printed map to 25. Worst case now (retry
        recorded, adoptions present, realistically long names) must
        still show >= 35 queries inside the 1800-char budget."""
        timings = {f"robust_outlier_prices_sampled_{i:03d}": round(3.7 - i * 0.01, 3)
                   for i in range(165)}
        full = self._full(
            timings,
            fresh_adopted={"a": {}, "b": {}, "c": {}},
            headline_attempts=2,
            dirty_attempt={"value": 150.0, "queries": timings},
        )
        line = bench._build_slim_line(full, timings)
        # the driver parses the FINAL line out of a 2000-char stdout
        # tail; 1900 + newline still fits with headroom
        assert len(json.dumps(line)) <= 1900
        assert line["queries_shown"] >= 35
        assert len(line["queries"]) == line["queries_shown"]

    def test_detail_blocks_become_scalars(self):
        timings = {"q1": 2.0, "q2": 1.0}
        full = self._full(
            timings,
            fresh_adopted={"q1": {"catalog_recorded_s": 4.0}},
            headline_attempts=2,
            dirty_attempt={"value": 150.0, "queries": timings},
        )
        line = bench._build_slim_line(full, timings)
        assert line["fresh_adopted_n"] == 1
        assert line["headline_attempts"] == 2
        assert line["dirty_attempt_value"] == 150.0
        # the dict-valued blocks themselves must NOT be inlined
        assert "fresh_adopted" not in line
        assert "dirty_attempt" not in line
        assert "box_canary" not in line and "box_canary_mem" not in line
        # but their one-scalar summaries are
        assert line["alu_factor"] == 1.391
        assert line["mem_factor"] == 1.251
        assert line["box_factor"] == 1.251

    def test_slowest_queries_listed_first(self):
        timings = {"fast": 0.5, "slow": 9.0, "mid": 3.0}
        line = bench._build_slim_line(self._full(timings), timings)
        assert list(line["queries"]) == ["slow", "mid", "fast"]


class TestPickCleanerAttempt:
    def test_first_live_firing_case(self):
        # the r16 opening run: first attempt 1.175, retry 1.221 — the
        # first attempt's window was cleaner and must win
        assert bench._pick_cleaner_attempt(1.175, 1.221) == 0

    def test_retry_cleaner_wins(self):
        assert bench._pick_cleaner_attempt(1.251, 1.02) == 1

    def test_unreadable_factors(self):
        assert bench._pick_cleaner_attempt(None, None) == 1
        assert bench._pick_cleaner_attempt(None, 1.3) == 1
        assert bench._pick_cleaner_attempt(1.3, None) == 0

    def test_tie_keeps_retry(self):
        assert bench._pick_cleaner_attempt(1.2, 1.2) == 1
