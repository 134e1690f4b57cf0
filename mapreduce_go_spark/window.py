"""Driver-window seats — GENERATED, do not hand-edit.

Regenerate with `python tools/rotation.py --write` as the
FIRST act of each round. The policy lives in
tools/rotation.py; the registry re-exports these names and
tests/test_registry.py asserts the window is the policy's
fixpoint over the CORRECTNESS history up to _WINDOW_AS_OF.
"""

_WINDOW_AS_OF = 10

_PRIORITY: list[str] = [
    "wc",  # PERM greens=10
    "indexer",  # PERM greens=10
    "crash_payload",  # PERM greens=10
    "join_inner_bucketed",  # ANCH greens=9
    "pretrain_corpus",  # ANCH greens=6
    "sessionize",  # ANCH greens=8
    "winnow_overlap_pairs",  # ANCH greens=6
    "warc_source_extract",  # HOLD greens=1
    "arrow_text_stats",  # HOLD greens=1
    "warc_sink_roundtrip",  # HOLD greens=1
    "partition_pruned_daily",  # HOLD greens=1
    "dpp_enriched_revenue",  # HOLD greens=1
    "zscore_arrow",  # HOLD greens=1
    "scd2_user_dim",  # HOLD greens=1
    "merge_upsert_customers",  # HOLD greens=1
    "jsonl_roundtrip",  # HOLD greens=1
    "contrastive_pairs",  # HOLD greens=1
    "skew_join_stats",  # HOLD greens=1
    "grouped_agg_mad",  # HOLD greens=1
    "orc_roundtrip",  # HOLD greens=1
    "observed_pipeline_filter",  # HOLD greens=1
    "recursive_ancestor_depth",  # HOLD greens=1
    "csv_roundtrip",  # HOLD greens=1
    "purchase_click_attribution",  # HOLD greens=1
    "ann_ivf_nprobe_topk",  # HOLD greens=1
    "token_chunks_overlap",  # FILL greens=0
    "domain_mix_temperature",  # FILL greens=0
    "purchase_click_attribution_outer",  # FILL greens=0
    "ann_lsh_multiprobe_topk",  # FILL greens=0
    "ann_ivf_trained_topk",  # FILL greens=0
    "user_type_profile",  # FILL greens=0
    "q4_order_priority",  # FILL greens=2
    "q6_forecast_revenue",  # FILL greens=2
    "q7_volume_shipping",  # FILL greens=2
    "q9_product_type_profit",  # FILL greens=2
    "q10_returned_items",  # FILL greens=2
    "q11_important_stock",  # FILL greens=2
    "q12_shipmode_priority",  # FILL greens=2
    "q13_order_count_distribution",  # FILL greens=2
    "q14_promo_effect",  # FILL greens=2
    "q15_top_supplier",  # FILL greens=2
    "q16_part_supplier_counts",  # FILL greens=2
    "q17_small_quantity",  # FILL greens=2
    "q18_large_orders",  # FILL greens=2
    "q19_discounted_revenue",  # FILL greens=2
    "q20_top_suppliers",  # FILL greens=2
    "q21_waiting_orders",  # FILL greens=2
    "q22_global_sales_opportunity",  # FILL greens=2
    "ann_ivf_topk",  # FILL greens=2
    "audio_resample",  # FILL greens=2
]
