"""Driver-window seats — GENERATED, do not hand-edit.

Regenerate with `python tools/rotation.py --write` as the
FIRST act of each round. The policy lives in
tools/rotation.py; the registry re-exports these names and
tests/test_registry.py asserts the window is the policy's
fixpoint over the CORRECTNESS history up to _WINDOW_AS_OF.
"""

_WINDOW_AS_OF = 16

_PRIORITY: list[str] = [
    "wc",  # PERM greens=16
    "indexer",  # PERM greens=16
    "crash_payload",  # PERM greens=16
    "join_inner_bucketed",  # ANCH greens=15
    "pretrain_corpus",  # ANCH greens=12
    "sessionize",  # ANCH greens=14
    "winnow_overlap_pairs",  # ANCH greens=12
    "q10_returned_items_bucketed",  # HOLD greens=5
    "q18_large_orders_bucketed",  # HOLD greens=5
    "purchase_click_attribution_outer",  # HOLD greens=4
    "warc_sink_roundtrip",  # HOLD greens=3
    "grouped_agg_mad",  # HOLD greens=4
    "partition_pruned_daily",  # HOLD greens=5
    "scd2_user_dim",  # HOLD greens=5
    "csv_roundtrip",  # HOLD greens=4
    "q4_order_priority",  # FILL greens=8
    "q6_forecast_revenue",  # FILL greens=8
    "q7_volume_shipping",  # FILL greens=8
    "q9_product_type_profit",  # FILL greens=8
    "q11_important_stock",  # FILL greens=8
    "q12_shipmode_priority",  # FILL greens=8
    "q13_order_count_distribution",  # FILL greens=8
    "q14_promo_effect",  # FILL greens=8
    "q15_top_supplier",  # FILL greens=8
    "q16_part_supplier_counts",  # FILL greens=8
    "q17_small_quantity",  # FILL greens=8
    "q19_discounted_revenue",  # FILL greens=8
    "q20_top_suppliers",  # FILL greens=8
    "q21_waiting_orders_bucketed",  # FILL greens=5
    "q22_global_sales_opportunity",  # FILL greens=8
    "ann_recall_dashboard",  # FILL greens=2
    "token_chunks_overlap",  # FILL greens=4
    "domain_mix_sample",  # FILL greens=3
    "audio_fingerprint_pairs",  # FILL greens=4
    "user_type_profile",  # FILL greens=6
    "contrastive_pairs",  # FILL greens=7
    "skew_join_stats",  # FILL greens=7
    "observed_pipeline_filter",  # FILL greens=7
    "recursive_ancestor_depth",  # FILL greens=7
    "q10_returned_items",  # FILL greens=7
    "q18_large_orders",  # FILL greens=7
    "q21_waiting_orders",  # FILL greens=6
    "ann_ivf_topk",  # FILL greens=6
    "audio_resample",  # FILL greens=6
    "jpeg_resize",  # FILL greens=4
    "dup_span_stats",  # FILL greens=4
    "bm25_top_terms",  # FILL greens=4
    "pii_stats",  # FILL greens=4
    "cdc_dup_chunks",  # FILL greens=3
    "local_supplier_volume_bucketed",  # FILL greens=2
]
