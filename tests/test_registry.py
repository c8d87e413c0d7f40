"""Driver-contract invariants: every queries() entry has an oracle,
and the registries import without a Ray session."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod  # noqa: E402


# queries whose result is not SQL-expressible (the driver records a
# rows-only check for these — keep the list EXPLICIT so a forgotten
# oracle still fails this test)
ROWS_ONLY = {
    "image_features_pnm",  # decoded-pixel math
    "audio_features_wav",  # decoded-sample math
}


def test_every_query_has_an_oracle():
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert set(qs) - ROWS_ONLY == set(osql), (
        (set(qs) - ROWS_ONLY) ^ set(osql)
    )
    assert len(qs) >= 75


# The driver samples queries()[:50] for its CORRECTNESS cross-check
# (CORRECTNESS_r01-r04 each cover exactly that prefix). Round 5
# deliberately leads with the 28 entries that never got a driver row
# (block A), then the exact/near-dup core (block B) — see the
# ORDERING NOTE in __ray_entry__.queries(). Pin the prefix so an
# accidental reorder can't silently change what the driver verifies.
DRIVER_PREFIX_BLOCK_A = [
    "tfidf_top_terms_docs", "fuzzy_match_parts", "fuzzy_match_parts_jw",
    "snm_pairs_parts", "entity_resolution_parts", "user_event_sequences",
    "pivot_user_event_counts", "rollup_event_value", "hash_sample_docs",
    "dup_rate_by_lang", "funnel_click_to_purchase", "normalized_dedup_docs",
    "label_centroids_embeddings", "events_quartile_buckets",
    "bottomk_sample_docs", "corr_value_hour_by_type",
    "histogram_event_values", "image_features_pnm", "audio_features_wav",
    "latest_event_per_user", "running_value_per_user",
    "moving_avg_value_per_type", "mode_event_type_per_user",
    "substring_overlap_docs", "customers_no_urgent_order",
    "value_stats_by_type", "deterministic_shuffle_docs",
    "token_shard_assignment",
]
DRIVER_PREFIX_BLOCK_B = [
    "dedup_target_docs", "dedup_dupes_langsrc", "dedup_hashes_docs",
    "seen_filter_docs", "sample_hash_docs", "neardup_clusters_docs",
    "incremental_neardup_docs", "simhash_docs", "ngram_jaccard_pairs_docs",
    "containment_pairs_docs", "simhash_neardup_docs",
    "dedup_keep_best_docs", "window_dedup_events", "curate_docs",
    "chunk_dedupe_docs", "decontaminate_docs", "sessionize_events",
    "distinct_event_types", "q1_pricing_summary", "join_orders_customers",
    "ann_topk_embeddings", "semantic_dedupe_embeddings",
]


def test_driver_sampling_prefix_is_pinned():
    keys = list(entrymod.queries().keys())
    assert keys[:28] == DRIVER_PREFIX_BLOCK_A
    assert keys[28:50] == DRIVER_PREFIX_BLOCK_B
    assert len(keys) == len(set(keys))


def test_oracle_sql_mentions_only_registered_tables():
    tables = {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    }
    import re

    for name, sql in entrymod.oracle_sql().items():
        froms = re.findall(r"(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)", sql)
        for t in froms:
            # CTE names and derived aliases are allowed; real tables
            # must come from the registered views
            assert t in tables or t in sql.lower(), (name, t)
