import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from updater_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="updater_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    s.sparkContext.setLogLevel("WARN")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture()
def tmp_store(spark, tmp_path):
    from updater_spark.sources.store import TableStore

    return TableStore(spark, str(tmp_path / "store"))


# ---------------------------------------------------------------------------
# Two-tier suite (r12, VERDICT r11 #1a): the full suite grew to ~508
# tests / ~50 min, which overruns the driver's verify budget — the r11
# gate went red on WALL TIME with zero failing tests. The slowest ~114
# tests (every (file, test) whose setup+call time summed >= 6 s in a
# full --durations=0 run; streaming drains, index/state lifecycle,
# property/fuzz suites, the 671 s plan-lint fixture) carry a `slow`
# marker applied here from one list, and pyproject's addopts deselects
# them by default: the default tier is ~394 tests / ~11 min, still
# covering every operator family. Run everything with
#     python -m pytest tests/ -m "slow or not slow"
# (the tier the end-of-round verification uses). New tests that take
# >= ~6 s should be added to the list below.
# ---------------------------------------------------------------------------
_SLOW_TESTS = {
    ("test_abtest.py", "test_welch_matches_hand_math"),
    ("test_ann_index.py", "test_bootstrap_search_matches_oneshot"),
    ("test_ann_index.py", "test_filtered_search_allowed_column_resolution"),
    ("test_ann_index.py", "test_filtered_search_equals_index_over_filtered_corpus"),
    ("test_ann_index.py", "test_identity_sidecar_detects_crashed_bootstrap"),
    ("test_ann_index.py", "test_ivfpq_index_maintained_equals_fresh"),
    ("test_ann_index.py", "test_occupancy_telemetry_and_retrain_trigger"),
    ("test_ann_index.py", "test_remove_and_emptied_cell_dropped"),
    ("test_ann_index.py", "test_upsert_migrating_vector_leaves_old_cell"),
    ("test_ann_stream.py", "test_replayed_batch_is_idempotent"),
    ("test_ann_stream.py", "test_stream_matches_batch_search"),
    ("test_asof.py", "test_asof_fuzz_vs_python"),
    ("test_broadcast_gating.py", "test_cdc_update_runs_unhinted_above_limit"),
    ("test_broadcast_gating.py", "test_partitioned_cdc_unhinted_above_limit"),
    ("test_bucketing.py", "test_engine_bucketed_fingerprints_cycle"),
    ("test_cdc_cycle.py", "test_bootstrap_then_incremental"),
    ("test_cdc_cycle.py", "test_changelog_auto_compaction_policy"),
    ("test_cdc_cycle.py", "test_changelog_epochs_and_compaction"),
    ("test_cdc_cycle.py", "test_post_update_aggregates"),
    ("test_dedup_char.py", "test_char_simhash_drops_null_text_docs"),
    ("test_dedup_char.py", "test_char_unit_contamination_bloom_matches_exact"),
    ("test_dedup_char.py", "test_char_unit_dedup_index_incremental"),
    ("test_dedup_index.py", "test_cdc_epochs_match_one_shot"),
    ("test_dedup_index.py", "test_incremental_equals_one_shot"),
    ("test_dedup_index.py", "test_maybe_reband_measure_act"),
    ("test_dedup_index.py", "test_occupancy_and_needs_retrain"),
    ("test_dedup_index.py", "test_param_identity_guard"),
    ("test_dedup_index.py", "test_reband_equals_fresh_bootstrap"),
    ("test_dedup_index.py", "test_reingest_replaces_state"),
    ("test_dedup_stream.py", "test_first_seen_across_batches"),
    ("test_derived.py", "test_repair_drops_emptied_tribe"),
    ("test_derived.py", "test_repair_equals_full_rebuild_and_prunes_buckets"),
    ("test_derived.py", "test_repair_with_inserts"),
    ("test_dsir.py", "test_corpus_divergence_properties"),
    ("test_dsir.py", "test_select_is_deterministic_and_bounded"),
    ("test_dsir.py", "test_select_salt_changes_sample"),
    ("test_dsir.py", "test_weights_favor_target_like_docs"),
    ("test_dsir_index.py", "test_incremental_equals_rebuild"),
    ("test_dsir_stream.py", "test_stream_matches_batch_weights"),
    ("test_join_stream.py", "test_left_outer_emits_null_after_horizon"),
    ("test_join_stream.py", "test_restart_resumes_from_checkpoint"),
    ("test_join_stream.py", "test_stream_matches_batch_and_reslicing_invariant"),
    ("test_join_stream.py", "test_watermark_evicts_state_deterministically"),
    ("test_joinview_cdc.py", "test_cdc_feed_drives_join_view"),
    ("test_multimodal.py", "test_simhash_banding_warns_on_uniform_blowup"),
    ("test_partitioned_cdc.py", "test_partitioned_and_bucketed_fingerprints_compose"),
    ("test_partitioned_cdc.py", "test_partitioned_matches_full_rewrite"),
    ("test_partitioned_cdc.py", "test_partitioned_update_rewrites_only_touched_buckets"),
    ("test_plan_lint.py", "test_no_cartesian_products"),
    ("test_property_cdc.py", "test_cdc_invariants"),
    ("test_property_cdc.py", "test_schema_evolution_invariants"),
    ("test_property_sampling.py", "test_budget_select_any_granularity_matches_naive"),
    ("test_property_sampling.py", "test_classifier_eval_auc_matches_pair_counting"),
    ("test_property_sampling.py", "test_domain_quota_strategies_agree_on_any_data"),
    ("test_property_text.py", "test_byte_bpe_roundtrips_any_unicode"),
    ("test_rangejoin.py", "test_interval_join_fuzz_vs_naive"),
    ("test_rangejoin.py", "test_interval_join_matches_naive"),
    ("test_replay.py", "test_engine_replay_full_fidelity"),
    ("test_retrain.py", "test_ivf_retrain_lifecycle"),
    ("test_retrain.py", "test_ivfpq_retrain_matches_fresh_bootstrap"),
    ("test_retrain.py", "test_semantic_retrain_replaces_pair_feed"),
    ("test_rollup_stream.py", "test_incremental_merge_applies_per_batch"),
    ("test_rollup_stream.py", "test_repair_after_update_delete"),
    ("test_rollup_stream.py", "test_repair_drops_fully_deleted_day"),
    ("test_rollup_stream.py", "test_stream_drains_drops_to_exact_state"),
    ("test_rollup_stream.py", "test_write_is_partition_pruned"),
    ("test_sampling.py", "test_weighted_sample_matches_reference_and_favors_weight"),
    ("test_schema_evolution.py", "test_added_column_epoch_lands_on_source"),
    ("test_schema_evolution.py", "test_dedup_index_consistent_across_boundary_epoch"),
    ("test_schema_evolution.py", "test_drop_rebase_with_normalize_col_falls_back_to_full_churn"),
    ("test_schema_evolution.py", "test_dropped_column_epoch_lands_on_source"),
    ("test_schema_evolution.py", "test_evolution_with_bucketed_fingerprint_cache"),
    ("test_schema_evolution.py", "test_partitioned_full_changelog_replay_across_boundary"),
    ("test_schema_evolution.py", "test_partitioned_mode_schema_epoch_full_rewrite_then_prunes"),
    ("test_schema_evolution.py", "test_reorder_only_rebase_is_zero_churn"),
    ("test_schema_evolution.py", "test_replay_across_schema_boundary"),
    ("test_schema_evolution.py", "test_replay_mask_survives_pre_sidecar_tables"),
    ("test_schema_evolution.py", "test_simultaneous_add_and_drop_rebase"),
    ("test_schema_evolution.py", "test_type_change_epoch_lands_on_source"),
    ("test_semantic_index.py", "test_append_log_compaction_preserves_state"),
    ("test_semantic_index.py", "test_append_log_crash_retry_is_safe"),
    ("test_semantic_index.py", "test_append_log_equals_overwrite_lifecycle"),
    ("test_semantic_index.py", "test_apply_cdc_epoch_mirrors_replica"),
    ("test_semantic_index.py", "test_arrow_mode_equals_catalyst_lifecycle"),
    ("test_semantic_index.py", "test_cap_crossing_emits_owed_pairs"),
    ("test_semantic_index.py", "test_cap_crossing_via_update_migration"),
    ("test_semantic_index.py", "test_compact_crash_window_keeps_updated_rows_live"),
    ("test_semantic_index.py", "test_epochs_match_one_shot"),
    ("test_semantic_index.py", "test_update_scan_equals_join_path"),
    ("test_semantic_stream.py", "test_admitted_only_state_grows_with_unique_content"),
    ("test_semantic_stream.py", "test_arrow_assignment_matches_catalyst"),
    ("test_semantic_stream.py", "test_arrow_assignment_past_catalyst_cell_ceiling"),
    ("test_semantic_stream.py", "test_matches_batch_truth_and_slicing_invariant"),
    ("test_semantic_stream.py", "test_max_cell_caps_state_hot_cell"),
    ("test_semantic_stream.py", "test_state_survives_restart"),
    ("test_semantic_stream.py", "test_ttl_expires_idle_cell_state"),
    ("test_session_stream.py", "test_restart_emits_each_session_once"),
    ("test_session_stream.py", "test_stream_matches_batch_and_merges_across_drops"),
    ("test_sessionize.py", "test_update_many_concurrent"),
    ("test_shards.py", "test_shards_are_contiguous_deterministic_slabs"),
    ("test_similarity.py", "test_ivf_beats_random_and_finds_planted"),
    ("test_similarity.py", "test_ivf_kmeans_parallel_init"),
    ("test_similarity.py", "test_kmeans_lloyd_deterministic_and_inertia_decreases"),
    ("test_similarity.py", "test_semantic_dedup_arrow_equals_catalyst"),
    ("test_similarity.py", "test_semantic_dedup_max_cell_guards_degenerate_codebook"),
    ("test_sq8.py", "test_sq_topk_arrow_matches_catalyst"),
    ("test_sq8.py", "test_sq_topk_recall_vs_exact"),
    ("test_streaming.py", "test_cdc_stream_continuous_rate_limited"),
    ("test_streaming.py", "test_cdc_stream_two_snapshots"),
    ("test_text.py", "test_bm25_champion_list_prune"),
    ("test_text.py", "test_chunk_text_fuzz_coverage"),
    ("test_tokenizer.py", "test_arrow_twin_matches_catalyst_8k_vocab"),
    ("test_tokenizer.py", "test_bpe_train_matches_reference_trainer"),
    ("test_tokenizer_unigram8k.py", "test_unigram_8k_vocab_arrow_equals_catalyst"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.nodeid.split("::")[0].split("/")[-1]
        name = item.name.split("[")[0]
        if (base, name) in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
