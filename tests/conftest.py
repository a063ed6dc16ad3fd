from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from lwetl_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8"))
    s = get_spark(app_name="lwetl_spark_tests", cpus=cpus)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_CORRECT}/{t}.parquet')"
        )
    return con


#: r12 (VERDICT r11 #2b): node ids measured >= 4 s per test on a quiet
#: local[8] run (112 tests, ~22 min of the ~33 min suite) — the deep
#: lifecycle/equivalence integrations.  They are auto-marked `slow` and
#: DESELECTED BY DEFAULT (pyproject addopts -m "not slow") so a
#: time-bounded flat `pytest tests/` completes well inside the driver's
#: window; run the full suite with `-m "slow or not slow"`, or just the
#: slow set with `-m slow`.  Every test remains runnable and is run in
#: full before each round lands (OPTIMIZATION_r12.md "Final
#: verification").
SLOW_NODE_IDS = {
    "tests/test_cli.py::test_cli_curate_end_to_end",
    "tests/test_cli.py::test_cli_curate_quality_model_stage",
    "tests/test_cli.py::test_cli_validate_end_to_end",
    "tests/test_dedup_quality.py::test_ppjoin_equals_naive_jaccard",
    "tests/test_dedup_quality.py::test_two_phase_cc_matches_label_propagation",
    "tests/test_driver_contract.py::test_query_schema_is_scalar_typed[x_auto_maintain]",
    "tests/test_driver_contract.py::test_query_schema_is_scalar_typed[x_campaign_pq]",
    "tests/test_driver_contract.py::test_query_schema_is_scalar_typed[x_campaign_tombstones]",
    "tests/test_driver_contract.py::test_query_schema_is_scalar_typed[x_campaign_vectors]",
    "tests/test_driver_contract.py::test_query_schema_is_scalar_typed[x_hybrid_filtered]",
    "tests/test_driver_contract.py::test_query_schema_is_scalar_typed[x_hybrid_search]",
    "tests/test_driver_contract.py::test_query_schema_is_scalar_typed[x_imgtext_pairs]",
    "tests/test_driver_contract.py::test_query_schema_is_scalar_typed[x_index_incremental]",
    "tests/test_driver_contract.py::test_query_schema_is_scalar_typed[x_ingest_campaign]",
    "tests/test_driver_contract.py::test_query_schema_is_scalar_typed[x_ivf_incremental]",
    "tests/test_driver_contract.py::test_query_schema_is_scalar_typed[x_ivfpq_incremental]",
    "tests/test_driver_contract.py::test_query_schema_is_scalar_typed[x_ivfpq_index_roundtrip]",
    "tests/test_driver_contract.py::test_query_schema_is_scalar_typed[x_lsh_incremental]",
    "tests/test_driver_contract.py::test_query_schema_is_scalar_typed[x_pdf_ingest]",
    "tests/test_driver_contract.py::test_query_schema_is_scalar_typed[x_pq_incremental]",
    "tests/test_driver_contract.py::test_query_schema_is_scalar_typed[x_pq_index_roundtrip]",
    "tests/test_driver_contract.py::test_query_schema_is_scalar_typed[x_warc_ingest]",
    "tests/test_driver_contract.py::test_query_schema_is_scalar_typed[x_webdataset_campaign]",
    "tests/test_driver_contract.py::test_timestamp_outputs_are_pandas_canonicalizable",
    "tests/test_examples.py::test_example_runs[daily_increment]",
    "tests/test_examples.py::test_example_runs[dataset_release]",
    "tests/test_examples.py::test_example_runs[hybrid_search]",
    "tests/test_functions.py::test_bpe_incremental_train_regex_pass",
    "tests/test_functions.py::test_bpe_train_apply_composed",
    "tests/test_grouped.py::test_pagerank_checkpoint_every_same_values_20_iters",
    "tests/test_ivfpq.py::test_ivfpq_incremental_lifecycle_matches_rebuild",
    "tests/test_ivfpq.py::test_ivfpq_index_build_then_query_matches_inline",
    "tests/test_ivfpq.py::test_ivfpq_noop_safety",
    "tests/test_ivfpq.py::test_ivfpq_remove_everything_keeps_index_readable",
    "tests/test_ivfpq.py::test_ivfpq_retrain_preserves_geometry",
    "tests/test_ivfpq.py::test_opq_lifecycle_roundtrip_retrain_and_retirement",
    "tests/test_joins.py::test_interval_overlap_join_equals_naive",
    "tests/test_joins.py::test_range_join_banded_equals_naive",
    "tests/test_maintain.py::test_auto_maintain_ivf_imbalance_dry_run_and_fire",
    "tests/test_maintain.py::test_auto_maintain_lsh_overload_resizes_planes",
    "tests/test_maintain.py::test_auto_maintain_pq_growth_trigger_matches_rebuild",
    "tests/test_maintain.py::test_auto_maintain_preserves_opq_family",
    "tests/test_maintain.py::test_detect_index_kind",
    "tests/test_media.py::test_null_payload_never_kills_any_media_op",
    "tests/test_media_r10.py::test_tiff_multistrip_lzw_predictor_decode",
    "tests/test_oracle_parity.py::test_oracle_match[x_auto_maintain]",
    "tests/test_oracle_parity.py::test_oracle_match[x_campaign_pq]",
    "tests/test_oracle_parity.py::test_oracle_match[x_campaign_tombstones]",
    "tests/test_oracle_parity.py::test_oracle_match[x_campaign_vectors]",
    "tests/test_oracle_parity.py::test_oracle_match[x_dedup_clusters]",
    "tests/test_oracle_parity.py::test_oracle_match[x_embed_near_dups]",
    "tests/test_oracle_parity.py::test_oracle_match[x_hybrid_filtered]",
    "tests/test_oracle_parity.py::test_oracle_match[x_hybrid_search]",
    "tests/test_oracle_parity.py::test_oracle_match[x_index_incremental]",
    "tests/test_oracle_parity.py::test_oracle_match[x_ingest_campaign]",
    "tests/test_oracle_parity.py::test_oracle_match[x_ivf_incremental]",
    "tests/test_oracle_parity.py::test_oracle_match[x_ivfpq_incremental]",
    "tests/test_oracle_parity.py::test_oracle_match[x_ivfpq_index_roundtrip]",
    "tests/test_oracle_parity.py::test_oracle_match[x_lsh_incremental]",
    "tests/test_oracle_parity.py::test_oracle_match[x_pdf_ingest]",
    "tests/test_oracle_parity.py::test_oracle_match[x_pq_incremental]",
    "tests/test_oracle_parity.py::test_oracle_match[x_pq_index_roundtrip]",
    "tests/test_oracle_parity.py::test_oracle_match[x_soft_dedup]",
    "tests/test_oracle_parity.py::test_oracle_match[x_theil_sen]",
    "tests/test_oracle_parity.py::test_oracle_match[x_warc_ingest]",
    "tests/test_oracle_parity.py::test_oracle_match[x_webdataset_campaign]",
    "tests/test_plans.py::test_composed_curate_shuffle_text_ratio_ci_gate",
    "tests/test_plans.py::test_cosine_topk_autoswitches_to_blocked_above_threshold",
    "tests/test_properties.py::test_bm25_properties",
    "tests/test_properties.py::test_has_near_duplicate_matches_pair_join",
    "tests/test_properties.py::test_ivf_incremental_lifecycle_matches_rebuild",
    "tests/test_properties.py::test_ivf_retrain_preserves_geometry",
    "tests/test_properties.py::test_lsh_incremental_lifecycle_matches_rebuild",
    "tests/test_properties.py::test_lsh_index_build_then_query_matches_inline",
    "tests/test_properties.py::test_pq_incremental_lifecycle_matches_rebuild",
    "tests/test_properties.py::test_pq_index_build_then_query_matches_inline",
    "tests/test_properties.py::test_semantic_dedup_invariants",
    "tests/test_properties.py::test_triangle_census_relabel_invariance",
    "tests/test_properties.py::test_winsorize_properties",
    "tests/test_retrieval.py::test_ann_filtered_probe_guarantees_k_from_filtered_pool",
    "tests/test_retrieval.py::test_bm25_hand_checked",
    "tests/test_retrieval.py::test_campaign_positional_index_serves_phrases",
    "tests/test_retrieval.py::test_campaign_vector_auto_maintain",
    "tests/test_retrieval.py::test_campaign_vector_kind_dispatch[ivfpq]",
    "tests/test_retrieval.py::test_campaign_vector_kind_dispatch[lsh]",
    "tests/test_retrieval.py::test_compact_deferred_threshold_policy",
    "tests/test_retrieval.py::test_compact_text_index_replaces_changed_docs",
    "tests/test_retrieval.py::test_docbuckets_sidecar_consistency_and_legacy_fallback",
    "tests/test_retrieval.py::test_hybrid_topk_over_persisted_indexes",
    "tests/test_retrieval.py::test_ingest_campaign_dual_index_lifecycle",
    "tests/test_retrieval.py::test_ingest_increment_campaign_equals_rebuild",
    "tests/test_retrieval.py::test_ingest_increment_delta_mode",
    "tests/test_retrieval.py::test_ingest_increment_readded_after_snapshot_gap",
    "tests/test_retrieval.py::test_ingest_increment_retire_removed",
    "tests/test_retrieval.py::test_ingest_tombstones_delta_mode_retirement",
    "tests/test_retrieval.py::test_positional_index_lifecycle_phrase_parity",
    "tests/test_retrieval.py::test_proximity_topk_hand_checked",
    "tests/test_retrieval.py::test_remove_everything_keeps_text_index_readable",
    "tests/test_retrieval.py::test_text_and_hybrid_filtered_probe",
    "tests/test_retrieval.py::test_text_index_roundtrip_equals_inline",
    "tests/test_retrieval.py::test_update_text_index_equals_rebuild",
    "tests/test_sinks.py::test_xlsx_multi_sheet_roundtrip",
    "tests/test_sinks.py::test_xml_multi_sheet_excel_and_plain",
    "tests/test_streaming.py::test_stream_crawl_frontier_admits_each_urlkey_once",
    "tests/test_streaming.py::test_stream_dedup_against_corpus_admits_each_fp_once",
    "tests/test_streaming.py::test_stream_dhash_neardup_admits_one_per_cluster",
    "tests/test_streaming.py::test_stream_event_pattern_totals_match_batch",
    "tests/test_streaming.py::test_stream_ingest_cdc_upserts_and_tombstones",
    "tests/test_streaming.py::test_stream_ingest_increment_continuous_campaign",
    "tests/test_streaming.py::test_stream_ingest_increment_dual_index",
    "tests/test_streaming.py::test_stream_markov_totals_match_batch",
    "tests/test_streaming.py::test_stream_sessionize_matches_batch",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.nodeid in SLOW_NODE_IDS:
            item.add_marker(pytest.mark.slow)
