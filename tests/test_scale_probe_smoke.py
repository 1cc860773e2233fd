"""Smoke coverage for the round-11 guard probes in scripts/scale_probe.py.

The probes' recorded numbers live in SCALING.md; these tests only pin
that the probe code keeps RUNNING end-to-end at toy sizes (so the
recorded methodology stays reproducible) and that the analytic
invariants hold: pair-count formulas, identical kept output across
guard modes, and walls that include construction (the round-11
localCheckpoint finding — an action-only timer would read near zero
while these return positive construction-inclusive walls).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)


class TestStarGuardProbe:
    def test_probe_runs_and_counts_match_formulas(self, spark):
        from scale_probe import probe_star_guard

        out = probe_star_guard(spark, m_ab=40, m_big=60)
        # below the auto cap both modes are the full clique
        assert out["clique_pairs"] == 40 * 39 // 2
        assert out["star_pairs"] == out["clique_pairs"]
        assert out["big_star_pairs"] == 60 * 59 // 2
        assert out["big_clique_pairs_analytic"] == 60 * 59 // 2
        assert out["clique_wall_s"] >= 0 and out["star_wall_s"] >= 0


class TestIngestGuardProbe:
    def test_probe_runs_and_guard_modes_agree(self, spark):
        from scale_probe import probe_ingest_guard

        out = probe_ingest_guard(spark, m_ab=30, m_big=60, b=8)
        # every batch doc is a dup of the stored cluster in EVERY mode
        assert out["kept_unbounded"] == out["kept_guarded"] == out["big_kept"] == 0
        assert out["unbounded_probe_rows_per_band"] == 8 * 30
        assert out["big_unbounded_probe_rows_per_band_analytic"] == 8 * 60
        # construction-inclusive walls (the localCheckpoint finding):
        # structural assertion only — positive, finite readings.  An
        # absolute floor (the old 0.5s) would flake on a warm JVM or a
        # faster box without any real regression (r11 ADVICE); the
        # construction-vs-action magnitude evidence lives in SCALING.md,
        # recorded at real probe sizes where it is unambiguous.
        assert 0 < out["unbounded_wall_s"] < float("inf")
        assert 0 < out["guarded_wall_s"] < float("inf")


class TestStopShingleGuardProbe:
    def test_probe_runs_and_recall_accounting_holds(self, spark):
        """Round-12 probe (r11 VERDICT order 7): the stop-shingle cap's
        recall-for-cost trade at toy size. The planted m-cluster's pairs
        are ALL found unbounded, ALL lost under cap < m (with the drop
        quantified by the stats row: 25 over-cap shingles = 6 boilerplate
        + 19 cluster-body, 6n + 19m postings), and near-fully recovered
        by the LSH remedy path on the same fixture."""
        from scale_probe import probe_stop_shingle_guard

        out = probe_stop_shingle_guard(
            spark, n_ab=60, m_ab=12, cap_ab=5, n_big=120, m_big=20
        )
        clique = 12 * 11 // 2
        assert out["true_cluster_pairs_ab"] == clique
        assert out["unbounded"]["pairs_found"] == clique
        assert out["unbounded"]["n_postings_dropped"] == 0
        # cap < cluster: every cluster pair lost, drop quantified
        assert out["capped"]["pairs_found"] == 0
        assert out["capped"]["n_stop_shingles_dropped"] == 25
        assert out["capped"]["n_postings_dropped"] == 6 * 60 + 19 * 12
        assert out["unbounded_join_rows_analytic_ab"] == 6 * 60 * 60 + 19 * 12 * 12
        # the documented remedy keeps the cluster detected
        assert out["lsh"]["cluster_members_detected"] >= 11
        assert out["lsh"]["cluster_pairs"] > 0
        # big mode at toy size: default cap (1000) exceeds every
        # frequency, so nothing is dropped and the clique survives
        assert out["big_capped"]["n_stop_shingles_dropped"] == 0
        assert out["big_capped"]["pairs_found"] == 20 * 19 // 2
        assert out["big_lsh"]["cluster_members_detected"] >= 18


class TestProbeCapsMatchShippedDefaults:
    """r12 VERDICT order 6 (round 13): every guard probe must measure the
    cap the PRODUCT ships. The probes now introspect the operator
    signatures at run time, so they cannot silently diverge; these
    assertions pin the introspection path itself (a renamed parameter or
    a changed default fails HERE, loudly, instead of the probe quietly
    measuring a guard that no longer exists)."""

    def test_star_guard_probe_cap_is_shipped_default(self, spark):
        import inspect

        from etl_complete_with_spark_spark.operators.dedup import (
            lsh_candidate_pairs,
        )
        from scale_probe import probe_star_guard

        out = probe_star_guard(spark, m_ab=6, m_big=8)
        shipped = inspect.signature(lsh_candidate_pairs).parameters[
            "max_bucket"
        ].default
        assert out["guard_cap_default"] == shipped

    def test_ingest_guard_probe_cap_is_shipped_default(self, spark):
        import inspect

        from etl_complete_with_spark_spark.operators.dedup import (
            _resolve_max_bucket,
            incremental_neardup_filter,
        )
        from scale_probe import probe_ingest_guard

        out = probe_ingest_guard(spark, m_ab=6, m_big=8, b=4)
        sig = inspect.signature(incremental_neardup_filter).parameters[
            "max_bucket"
        ].default
        assert out["guard_cap_default"] == sig
        assert out["guarded_probe_rows_per_band"] == 4 * _resolve_max_bucket(sig)

    def test_stop_shingle_probe_big_cap_is_shipped_default(self, spark):
        import inspect

        from etl_complete_with_spark_spark.operators.dedup import (
            ngram_jaccard_pairs,
        )
        from scale_probe import probe_stop_shingle_guard

        shipped = inspect.signature(ngram_jaccard_pairs).parameters[
            "max_shingle_freq"
        ].default
        assert isinstance(shipped, int) and shipped > 0
        out = probe_stop_shingle_guard(
            spark, n_ab=30, m_ab=6, cap_ab=5, n_big=30, m_big=6
        )
        # the big arm ran under the shipped cap: at toy size nothing
        # exceeds it, so zero drops is the signature of the default path
        assert out["big_capped"]["n_stop_shingles_dropped"] == 0

    def test_fuzzy_block_probe_default_cap_is_shipped_default(self):
        """No-Spark pin: the probe's recorded-run mode (cap=None)
        resolves to blocked_fuzzy_pairs' own signature default."""
        import inspect

        from etl_complete_with_spark_spark.operators.dedup import (
            blocked_fuzzy_pairs,
        )
        import scale_probe

        src = inspect.getsource(scale_probe.probe_fuzzy_block_guard)
        shipped = inspect.signature(blocked_fuzzy_pairs).parameters[
            "max_block"
        ].default
        # the probe introspects the same signature the operator ships
        assert 'parameters["max_block"].default' in src
        assert (
            inspect.signature(scale_probe.probe_fuzzy_block_guard)
            .parameters["cap"]
            .default
            is None
        )
        assert shipped == "auto"  # recorded SCALING.md runs measured this


class TestFuzzyBlockGuardProbe:
    def test_probe_runs_and_drop_accounting_holds(self, spark):
        """Round-12 probe: the hot-block cap in blocked_fuzzy_pairs at
        toy size, with cap=16 < m=40 so the drop path engages. The
        planted m/2 distance-1 pairs are all found unbounded, all lost
        when the hot "inc" block exceeds the cap (1 block / m values
        dropped, per the stats row), and all recovered by the
        documented finer-block remedy (first token), whose blocks of 2
        sail under the same cap."""
        from scale_probe import probe_fuzzy_block_guard

        out = probe_fuzzy_block_guard(spark, m_ab=40, m_big=60, cap=16)
        assert out["true_pairs_ab"] == 20
        assert out["unbounded_comparisons_ab"] == 40 * 39 // 2
        assert out["unbounded"]["pairs_found"] == 20
        assert out["unbounded"]["n_values_dropped"] == 0
        assert out["capped"]["pairs_found"] == 0
        assert out["capped"]["n_blocks_dropped"] == 1
        assert out["capped"]["n_values_dropped"] == 40
        assert out["finer_block_remedy"]["pairs_found"] == 20
        assert out["finer_block_remedy"]["n_values_dropped"] == 0
        assert out["big_capped"]["n_values_dropped"] == 60
        assert out["big_finer_block_remedy"]["pairs_found"] == 30
