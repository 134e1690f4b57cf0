"""Driver-window seats — GENERATED, do not hand-edit.

Regenerate with `python tools/rotation.py --write` as the
FIRST act of each round. The policy lives in
tools/rotation.py; the registry re-exports these names and
tests/test_registry.py asserts the window is the policy's
fixpoint over the CORRECTNESS history up to _WINDOW_AS_OF.
"""

_WINDOW_AS_OF = 14

_PRIORITY: list[str] = [
    "wc",  # PERM greens=14
    "indexer",  # PERM greens=14
    "crash_payload",  # PERM greens=14
    "join_inner_bucketed",  # ANCH greens=13
    "pretrain_corpus",  # ANCH greens=10
    "sessionize",  # ANCH greens=12
    "winnow_overlap_pairs",  # ANCH greens=10
    "ann_ivf_hamming_topk",  # HOLD greens=1
    "purchase_click_attribution",  # HOLD greens=3
    "warc_source_extract",  # HOLD greens=3
    "zscore_arrow",  # HOLD greens=3
    "dpp_enriched_revenue",  # HOLD greens=4
    "merge_upsert_customers",  # HOLD greens=4
    "orc_roundtrip",  # HOLD greens=4
    "q10_returned_items",  # HOLD greens=5
    "q18_large_orders",  # HOLD greens=5
    "ann_recall_dashboard",  # FILL greens=0
    "ann_ivf_pq_topk",  # FILL greens=0
    "join_left_outer",  # FILL greens=0
    "join_full_outer",  # FILL greens=0
    "q4_order_priority",  # FILL greens=6
    "q6_forecast_revenue",  # FILL greens=6
    "q7_volume_shipping",  # FILL greens=6
    "q9_product_type_profit",  # FILL greens=6
    "q11_important_stock",  # FILL greens=6
    "q12_shipmode_priority",  # FILL greens=6
    "q13_order_count_distribution",  # FILL greens=6
    "q14_promo_effect",  # FILL greens=6
    "q15_top_supplier",  # FILL greens=6
    "q16_part_supplier_counts",  # FILL greens=6
    "q17_small_quantity",  # FILL greens=6
    "q19_discounted_revenue",  # FILL greens=6
    "q20_top_suppliers",  # FILL greens=6
    "q21_waiting_orders_bucketed",  # FILL greens=4
    "q22_global_sales_opportunity",  # FILL greens=6
    "token_stats",  # FILL greens=3
    "domain_mix_temperature",  # FILL greens=2
    "audio_fingerprint_pairs",  # FILL greens=2
    "user_type_profile",  # FILL greens=4
    "contrastive_pairs",  # FILL greens=5
    "skew_join_stats",  # FILL greens=5
    "observed_pipeline_filter",  # FILL greens=5
    "recursive_ancestor_depth",  # FILL greens=5
    "q21_waiting_orders",  # FILL greens=4
    "ann_ivf_topk",  # FILL greens=4
    "audio_resample",  # FILL greens=4
    "jpeg_resize",  # FILL greens=2
    "dup_span_stats",  # FILL greens=2
    "bm25_top_terms",  # FILL greens=2
    "pii_stats",  # FILL greens=2
]
