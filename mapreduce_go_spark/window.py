"""Driver-window seats — GENERATED, do not hand-edit.

Regenerate with `python tools/rotation.py --write` as the
FIRST act of each round. The policy lives in
tools/rotation.py; the registry re-exports these names and
tests/test_registry.py asserts the window is the policy's
fixpoint over the CORRECTNESS history up to _WINDOW_AS_OF.
"""

_WINDOW_AS_OF = 15

_PRIORITY: list[str] = [
    "wc",  # PERM greens=15
    "indexer",  # PERM greens=15
    "crash_payload",  # PERM greens=15
    "join_inner_bucketed",  # ANCH greens=14
    "pretrain_corpus",  # ANCH greens=11
    "sessionize",  # ANCH greens=13
    "winnow_overlap_pairs",  # ANCH greens=11
    "ann_recall_dashboard",  # HOLD greens=1
    "ann_ivf_pq_topk",  # HOLD greens=1
    "join_left_outer",  # HOLD greens=1
    "join_full_outer",  # HOLD greens=1
    "token_stats",  # HOLD greens=4
    "domain_mix_temperature",  # HOLD greens=3
    "audio_fingerprint_pairs",  # HOLD greens=3
    "q21_waiting_orders",  # HOLD greens=5
    "ann_ivf_topk",  # HOLD greens=5
    "audio_resample",  # HOLD greens=5
    "jpeg_resize",  # HOLD greens=3
    "dup_span_stats",  # HOLD greens=3
    "bm25_top_terms",  # HOLD greens=3
    "pii_stats",  # HOLD greens=3
    "q4_order_priority",  # FILL greens=7
    "q6_forecast_revenue",  # FILL greens=7
    "q7_volume_shipping",  # FILL greens=7
    "q9_product_type_profit",  # FILL greens=7
    "q10_returned_items_bucketed",  # FILL greens=4
    "q11_important_stock",  # FILL greens=7
    "q12_shipmode_priority",  # FILL greens=7
    "q13_order_count_distribution",  # FILL greens=7
    "q14_promo_effect",  # FILL greens=7
    "q15_top_supplier",  # FILL greens=7
    "q16_part_supplier_counts",  # FILL greens=7
    "q17_small_quantity",  # FILL greens=7
    "q18_large_orders_bucketed",  # FILL greens=4
    "q19_discounted_revenue",  # FILL greens=7
    "q20_top_suppliers",  # FILL greens=7
    "q22_global_sales_opportunity",  # FILL greens=7
    "purchase_click_attribution_outer",  # FILL greens=3
    "user_type_profile",  # FILL greens=5
    "warc_sink_roundtrip",  # FILL greens=2
    "grouped_agg_mad",  # FILL greens=3
    "partition_pruned_daily",  # FILL greens=4
    "scd2_user_dim",  # FILL greens=4
    "csv_roundtrip",  # FILL greens=3
    "contrastive_pairs",  # FILL greens=6
    "skew_join_stats",  # FILL greens=6
    "observed_pipeline_filter",  # FILL greens=6
    "recursive_ancestor_depth",  # FILL greens=6
    "q10_returned_items",  # FILL greens=6
    "q18_large_orders",  # FILL greens=6
]
