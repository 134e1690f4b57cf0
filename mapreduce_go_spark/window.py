"""Driver-window seats — GENERATED, do not hand-edit.

Regenerate with `python tools/rotation.py --write` as the
FIRST act of each round. The policy lives in
tools/rotation.py; the registry re-exports these names and
tests/test_registry.py asserts the window is the policy's
fixpoint over the CORRECTNESS history up to _WINDOW_AS_OF.
"""

_WINDOW_AS_OF = 13

_PRIORITY: list[str] = [
    "wc",  # PERM greens=13
    "indexer",  # PERM greens=13
    "crash_payload",  # PERM greens=13
    "join_inner_bucketed",  # ANCH greens=12
    "pretrain_corpus",  # ANCH greens=9
    "sessionize",  # ANCH greens=11
    "winnow_overlap_pairs",  # ANCH greens=9
    "ann_ivf_sampled_topk",  # HOLD greens=1
    "ann_binary_hamming_topk",  # HOLD greens=1
    "matryoshka_two_stage_topk",  # HOLD greens=1
    "hybrid_rrf_topk",  # HOLD greens=1
    "sentence_split_udtf_arrow",  # HOLD greens=1
    "ngram_jaccard_pairs_prefix",  # HOLD greens=1
    "bpe_subword_tokens",  # HOLD greens=1
    "ann_recall_dashboard",  # HOLD greens=1
    "hybrid_rrf_ann_topk",  # HOLD greens=1
    "q10_returned_items_bucketed",  # HOLD greens=3
    "q18_large_orders_bucketed",  # HOLD greens=3
    "q21_waiting_orders_bucketed",  # HOLD greens=3
    "domain_mix_sample",  # HOLD greens=2
    "audio_features",  # HOLD greens=3
    "ann_ivf_hamming_topk",  # FILL greens=0
    "q4_order_priority",  # FILL greens=5
    "q6_forecast_revenue",  # FILL greens=5
    "q7_volume_shipping",  # FILL greens=5
    "q9_product_type_profit",  # FILL greens=5
    "q11_important_stock",  # FILL greens=5
    "q12_shipmode_priority",  # FILL greens=5
    "q13_order_count_distribution",  # FILL greens=5
    "q14_promo_effect",  # FILL greens=5
    "q15_top_supplier",  # FILL greens=5
    "q16_part_supplier_counts",  # FILL greens=5
    "q17_small_quantity",  # FILL greens=5
    "q19_discounted_revenue",  # FILL greens=5
    "q20_top_suppliers",  # FILL greens=5
    "q22_global_sales_opportunity",  # FILL greens=5
    "purchase_click_attribution",  # FILL greens=2
    "token_chunks_overlap",  # FILL greens=3
    "user_type_profile",  # FILL greens=3
    "warc_source_extract",  # FILL greens=2
    "zscore_arrow",  # FILL greens=2
    "dpp_enriched_revenue",  # FILL greens=3
    "merge_upsert_customers",  # FILL greens=3
    "orc_roundtrip",  # FILL greens=3
    "contrastive_pairs",  # FILL greens=4
    "skew_join_stats",  # FILL greens=4
    "observed_pipeline_filter",  # FILL greens=4
    "recursive_ancestor_depth",  # FILL greens=4
    "q10_returned_items",  # FILL greens=4
    "q18_large_orders",  # FILL greens=4
]
