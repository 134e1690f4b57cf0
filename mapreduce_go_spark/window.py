"""Driver-window seats — GENERATED, do not hand-edit.

Regenerate with `python tools/rotation.py --write` as the
FIRST act of each round. The policy lives in
tools/rotation.py; the registry re-exports these names and
tests/test_registry.py asserts the window is the policy's
fixpoint over the CORRECTNESS history up to _WINDOW_AS_OF.
"""

_WINDOW_AS_OF = 12

_PRIORITY: list[str] = [
    "wc",  # PERM greens=12
    "indexer",  # PERM greens=12
    "crash_payload",  # PERM greens=12
    "join_inner_bucketed",  # ANCH greens=11
    "pretrain_corpus",  # ANCH greens=8
    "sessionize",  # ANCH greens=10
    "winnow_overlap_pairs",  # ANCH greens=8
    "warc_extract",  # HOLD greens=3
    "zscore_pandas",  # HOLD greens=3
    "user_recent_events",  # HOLD greens=1
    "idle_user_flush",  # HOLD greens=1
    "dsir_importance_sample",  # HOLD greens=1
    "ann_ivf_sampled_topk",  # FILL greens=0
    "ann_binary_hamming_topk",  # FILL greens=0
    "matryoshka_two_stage_topk",  # FILL greens=0
    "hybrid_rrf_topk",  # FILL greens=0
    "sentence_split_udtf_arrow",  # FILL greens=0
    "ngram_jaccard_pairs_prefix",  # FILL greens=0
    "bpe_subword_tokens",  # FILL greens=0
    "ann_recall_dashboard",  # FILL greens=0
    "hybrid_rrf_ann_topk",  # FILL greens=0
    "q4_order_priority",  # FILL greens=4
    "q6_forecast_revenue",  # FILL greens=4
    "q7_volume_shipping",  # FILL greens=4
    "q9_product_type_profit",  # FILL greens=4
    "q10_returned_items_bucketed",  # FILL greens=2
    "q11_important_stock",  # FILL greens=4
    "q12_shipmode_priority",  # FILL greens=4
    "q13_order_count_distribution",  # FILL greens=4
    "q14_promo_effect",  # FILL greens=4
    "q15_top_supplier",  # FILL greens=4
    "q16_part_supplier_counts",  # FILL greens=4
    "q17_small_quantity",  # FILL greens=4
    "q18_large_orders_bucketed",  # FILL greens=2
    "q19_discounted_revenue",  # FILL greens=4
    "q20_top_suppliers",  # FILL greens=4
    "q21_waiting_orders_bucketed",  # FILL greens=2
    "q22_global_sales_opportunity",  # FILL greens=4
    "purchase_click_attribution_outer",  # FILL greens=2
    "token_chunks_overlap",  # FILL greens=2
    "domain_mix_sample",  # FILL greens=1
    "audio_features",  # FILL greens=2
    "user_type_profile",  # FILL greens=2
    "partition_pruned_daily",  # FILL greens=3
    "scd2_user_dim",  # FILL greens=3
    "jsonl_roundtrip",  # FILL greens=3
    "contrastive_pairs",  # FILL greens=3
    "skew_join_stats",  # FILL greens=3
    "observed_pipeline_filter",  # FILL greens=3
    "recursive_ancestor_depth",  # FILL greens=3
]
