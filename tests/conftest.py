import os

import pytest

# -- slow tier (r12, round-11 verdict item 2) -------------------------------
#
# The full suite (~1150 tests) outgrew the driver's pytest budget (48+ min;
# the r11 driver run truncated at ~59%). The tests below are the heavy
# GOLDEN tiers — dialect/DDL sweeps, oracle-parity replays, graded-window
# rotation replays, trainer-convergence goldens — whose signal the driver
# already re-derives itself (its correctness pass runs every oracle-backed
# query against DuckDB each round). They carry @pytest.mark.slow, applied
# centrally here, and pytest.ini deselects them by default so the DEFAULT
# `pytest tests/` is the fast tier: every operator and every pinned plan
# shape, minutes not hours. Builders run the full suite with
#   pytest tests/ -m "slow or not slow"     (or SPARK_GRAFT_FULL_TESTS=1)
# before closing a round.

_SLOW_FILES = {
    # ClickHouse dialect/DDL golden sweeps (SQL-surface parity, not
    # operator coverage; every one of these is also exercised by the
    # driver-graded oracle queries that use the dialect layer)
    "test_ch_ddl.py",
    "test_oracle_parity.py",
    "test_functions.py",
}

_SLOW_TESTS = {
    # whole-registry plan sweep (constructs all 87 queries, incl. eager
    # trainers); the per-operator plan pins elsewhere stay fast
    "test_no_python_udfs_in_relational_tier",
    # end-to-end CLI goldens (CLI wiring is not a driver-graded surface)
    "test_cli_end_to_end_and_persistence",
    "test_cli_settings_observably_change_results",
    # index-compaction steady-state goldens (tombstone/optimize basics
    # stay fast)
    "test_minhash_index_compaction_steady_state",
    "test_bm25_index_compaction_steady_state",
    "test_parallel_compaction_matches_sequential",
    "test_bm25_auto_compact_keeps_files_bounded",
    "test_ann_index_compaction_and_file_stats",
    # trainer-convergence goldens (featurization/identity/replay pins stay)
    "test_count_features_learn_a_planted_marker",
    "test_ovr_multiclass_separates_planted_vocab",
    "test_sampled_training_still_separates_marker",
    "test_trained_classifier_separates_planted_labels",
    "test_exact_trainer_learns_the_planted_rule",
    # streaming steady-state goldens (incremental near-dedup stays fast)
    "test_stream_embedding_near_dup_admission",
    "test_stream_bm25_index_maintenance",
    "test_stream_quality_gate_equals_batch",
    # merge/flow equilibrium goldens (collapse-semantics pins stay fast)
    "test_merge_scheduler_bounds_parts_and_preserves_data",
    "test_flow_control_equilibrium_with_and_without_merges",
    "test_harness_with_background_merges_stays_below_throw",
    "test_harness_with_background_merge_pool",
    # hot-cluster guard: the megacluster bound stays fast; these two pin
    # secondary laws of the same guard
    "test_hot_cluster_guard_identical_mass_is_one_component",
    "test_hot_cluster_guard_mixed_keeps_cold_clusters_identical",
}


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return  # builder escape hatch: nothing deselected
    for item in items:
        fname = item.fspath.basename
        name = item.name.split("[")[0]
        if (
            fname.startswith("test_ch_dialect")
            or fname in _SLOW_FILES
            or name in _SLOW_TESTS
            # graded-window rotation replays (round7..round11b): golden
            # re-runs of FORMER oracles the driver no longer grades; the
            # window-shape pin and bare-session contract stay fast
            or (fname == "test_driver_contract.py" and name.startswith("test_contract_round"))
        ):
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from clickhousedatamocker_spark.session import get_spark

    spark = get_spark(app_name="tests", shuffle_partitions=8)
    yield spark


@pytest.fixture()
def tmp_warehouse(tmp_path):
    return str(tmp_path / "warehouse")


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
