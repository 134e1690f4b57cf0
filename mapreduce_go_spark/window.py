"""Driver-window seats — GENERATED, do not hand-edit.

Regenerate with `python tools/rotation.py --write` as the
FIRST act of each round. The policy lives in
tools/rotation.py; the registry re-exports these names and
tests/test_registry.py asserts the window is the policy's
fixpoint over the CORRECTNESS history up to _WINDOW_AS_OF.
"""

_WINDOW_AS_OF = 9

_PRIORITY: list[str] = [
    "wc",  # PERM greens=9
    "indexer",  # PERM greens=9
    "crash_payload",  # PERM greens=9
    "join_inner_bucketed",  # ANCH greens=8
    "pretrain_corpus",  # ANCH greens=5
    "sessionize",  # ANCH greens=7
    "winnow_overlap_pairs",  # ANCH greens=5
    "bpe_token_stats",  # HOLD greens=1
    "multimodal_pack",  # HOLD greens=1
    "bmp_resize",  # HOLD greens=1
    "sliding_window",  # HOLD greens=1
    "dedup_first_event",  # HOLD greens=1
    "symspell_typo_pairs",  # HOLD greens=1
    "typo_corrections",  # HOLD greens=1
    "q18_large_orders_bucketed",  # HOLD greens=1
    "q21_waiting_orders_bucketed",  # HOLD greens=1
    "bloom_decontaminate",  # HOLD greens=1
    "boilerplate_line_stats",  # HOLD greens=1
    "strip_boilerplate_lines",  # HOLD greens=1
    "quality_probe",  # HOLD greens=1
    "url_canonicalize",  # HOLD greens=1
    "url_dedup",  # HOLD greens=1
    "unigram_logprob_filter",  # HOLD greens=1
    "triangle_counts",  # HOLD greens=1
    "graph_degree_stats",  # HOLD greens=1
    "q3_shipping_priority_bucketed",  # HOLD greens=1
    "q10_returned_items_bucketed",  # HOLD greens=1
    "hll_distinct_by_source",  # HOLD greens=1
    "window_navigation",  # HOLD greens=1
    "cms_heavy_hitters",  # HOLD greens=1
    "weighted_sample_per_source",  # HOLD greens=1
    "variant_extract",  # HOLD greens=1
    "warc_source_extract",  # FILL greens=0
    "arrow_text_stats",  # FILL greens=0
    "warc_sink_roundtrip",  # FILL greens=0
    "partition_pruned_daily",  # FILL greens=0
    "dpp_enriched_revenue",  # FILL greens=0
    "zscore_arrow",  # FILL greens=0
    "scd2_user_dim",  # FILL greens=0
    "merge_upsert_customers",  # FILL greens=0
    "jsonl_roundtrip",  # FILL greens=0
    "contrastive_pairs",  # FILL greens=0
    "skew_join_stats",  # FILL greens=0
    "grouped_agg_mad",  # FILL greens=0
    "orc_roundtrip",  # FILL greens=0
    "observed_pipeline_filter",  # FILL greens=0
    "recursive_ancestor_depth",  # FILL greens=0
    "csv_roundtrip",  # FILL greens=0
    "purchase_click_attribution",  # FILL greens=0
    "ann_ivf_nprobe_topk",  # FILL greens=0
]
