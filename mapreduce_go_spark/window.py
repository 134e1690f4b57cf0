"""Driver-window seats — GENERATED, do not hand-edit.

Regenerate with `python tools/rotation.py --write` as the
FIRST act of each round. The policy lives in
tools/rotation.py; the registry re-exports these names and
tests/test_registry.py asserts the window is the policy's
fixpoint over the CORRECTNESS history up to _WINDOW_AS_OF.
"""

_WINDOW_AS_OF = 11

_PRIORITY: list[str] = [
    "wc",  # PERM greens=11
    "indexer",  # PERM greens=11
    "crash_payload",  # PERM greens=11
    "join_inner_bucketed",  # ANCH greens=10
    "pretrain_corpus",  # ANCH greens=7
    "sessionize",  # ANCH greens=9
    "winnow_overlap_pairs",  # ANCH greens=7
    "token_chunks_overlap",  # HOLD greens=1
    "domain_mix_temperature",  # HOLD greens=1
    "purchase_click_attribution_outer",  # HOLD greens=1
    "ann_lsh_multiprobe_topk",  # HOLD greens=1
    "ann_ivf_trained_topk",  # HOLD greens=1
    "user_type_profile",  # HOLD greens=1
    "q4_order_priority",  # HOLD greens=3
    "q6_forecast_revenue",  # HOLD greens=3
    "q7_volume_shipping",  # HOLD greens=3
    "q9_product_type_profit",  # HOLD greens=3
    "q10_returned_items",  # HOLD greens=3
    "q11_important_stock",  # HOLD greens=3
    "q12_shipmode_priority",  # HOLD greens=3
    "q13_order_count_distribution",  # HOLD greens=3
    "q14_promo_effect",  # HOLD greens=3
    "q15_top_supplier",  # HOLD greens=3
    "q16_part_supplier_counts",  # HOLD greens=3
    "q17_small_quantity",  # HOLD greens=3
    "q18_large_orders",  # HOLD greens=3
    "q19_discounted_revenue",  # HOLD greens=3
    "q20_top_suppliers",  # HOLD greens=3
    "q21_waiting_orders",  # HOLD greens=3
    "q22_global_sales_opportunity",  # HOLD greens=3
    "ann_ivf_topk",  # HOLD greens=3
    "audio_resample",  # HOLD greens=3
    "warc_extract",  # FILL greens=2
    "arrow_text_stats",  # FILL greens=2
    "partition_pruned_daily",  # FILL greens=2
    "dpp_enriched_revenue",  # FILL greens=2
    "zscore_pandas",  # FILL greens=2
    "scd2_user_dim",  # FILL greens=2
    "merge_upsert_customers",  # FILL greens=2
    "jsonl_roundtrip",  # FILL greens=2
    "orc_roundtrip",  # FILL greens=2
    "csv_roundtrip",  # FILL greens=2
    "contrastive_pairs",  # FILL greens=2
    "skew_join_stats",  # FILL greens=2
    "grouped_agg_mad",  # FILL greens=2
    "observed_pipeline_filter",  # FILL greens=2
    "recursive_ancestor_depth",  # FILL greens=2
    "user_recent_events",  # FILL greens=0
    "idle_user_flush",  # FILL greens=0
    "dsir_importance_sample",  # FILL greens=0
]
