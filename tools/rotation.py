"""Driver-window rotation policy — generates registry._PRIORITY.

The driver's per-round differential check covers only the FIRST 50
entries of registry.all_queries(); with 148+ registered queries the
50 seats are a scarce verification resource. This tool reads the
CORRECTNESS_r*.json history and applies the written policy below, so
the window is generated, not hand-curated (VERDICT r6 item 8).

POLICY (applied in order; deterministic):
  P1. PERMANENT seats: the reference's own apps (wc, indexer,
      crash_payload) — they are the reference test suite's analog
      (/root/reference/main/test-mr.sh) and never rotate out.
  P2. HOLD seats: any query whose driver-green streak is exactly 1
      keeps its seat — a first green must be confirmed by a second
      consecutive green before the seat is releasable (guards
      against flaky first greens). A seat that was RED in the latest
      round also holds: it must be fixed and re-proven green before
      it may rotate out (a red row never silently disappears from
      the window).
  P3. ANCHOR seats: named exceptions that stay regardless of streak
      because they pin a scale property no sibling covers
      (zero-Exchange bucketed join, the pipeline capstone, one
      streaming twin, one fingerprinting family).
  P4. DEMOTE: every other seat with >= 2 cumulative greens is
      releasable. Demoted queries keep their oracles and the full
      differential in tests/test_queries.py — only the driver
      window rotates.
  P5. FILL, debt first (r13 — VERDICT r12 item 1): open seats go
      FIRST to registered-but-never-driver-verified queries
      (FILL_QUEUE order, then newest registrations) — the
      registration budget bounds this debt to the seats freed per
      round, so all of it always fits. Never-verified count is the
      debt metric; it only shrinks via FILL.
  P6. FAMILY REPRESENTATION: every curated family (FAMILIES below —
      the same tuple tests/test_registry.py pins) keeps at least one
      seat. Once the never-verified debt hits zero, P5's greens-pool
      refill would otherwise concentrate seats in whichever families
      head FILL_QUEUE (the r12 round-open regeneration dropped 14
      families this way); P6 fills missing families after the debt,
      picking the family member with the fewest cumulative greens
      (registry order tie-break) so the freshest evidence rotates
      in. Remaining seats refill from the greens pool in FILL_QUEUE
      order.

Run:  python tools/rotation.py          (prints the proposed window)
      python tools/rotation.py --write  (regenerates
          mapreduce_go_spark/window.py — the generated module the
          registry imports _PRIORITY/_WINDOW_AS_OF from; the r1-r9
          flow was manual paste into registry.py, a recurring
          round-open error source)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PERMANENT = ["wc", "indexer", "crash_payload"]

# P2 refinement (r15, VERDICT r14 item 1): a query whose RESULT SCHEMA
# changed in round N is, for hold purposes, a new first green — greens
# recorded before N verified a shape that no longer exists, so they
# must not count toward releasing the seat. name -> first round whose
# green covers the current schema.
SCHEMA_RESETS = {
    # "Schema" here means the RESULT SHAPE — columns OR row set: the
    # driver's canonical compare hashes both, so a green only speaks
    # for the shape it hashed. r14 added the oracle-backed
    # n_probed_cells column (VERDICT r13 item 7) — the r13 green
    # verified the 11-variant dashboard without it; r15 adds the
    # 13th variant row (ann_ivf_pq_topk), so the r14 green verified a
    # row set that no longer exists either. Reset follows the latest
    # shape change: zero-green debt seat this round, then the normal
    # P2 first-green/confirming-green discipline on the new shape.
    "ann_recall_dashboard": 15,
    # r15 de-vacuified both outer joins (the fb12460 class): the full
    # outer moved to (user, day) error-vs-signup counts (new columns
    # AND rows) and the left outer scoped orders to 1995 so the
    # zero-fill branch carries real rows — every prior green verified
    # the old, inner-join-degenerate shapes.
    "join_full_outer": 15,
    "join_left_outer": 15,
}

# P3 anchors, each with the property it pins:
ANCHORS = [
    "join_inner_bucketed",    # zero-Exchange co-located join+agg plan
    "pretrain_corpus",        # the five-stage pipeline capstone
    "sessionize",             # stateful-session batch twin (D21)
    "winnow_overlap_pairs",   # MOSS winnowing — no sibling covers it
]

# P5(b)+(c) fill order: the r7 window drew the TPC-H backlog, the
# r6-queued rotation names and the bucketed Q5 twin from the head of
# this list; the tail queues the operators REGISTERED during r7 (all
# oracle-backed, all green in tests/test_queries.py) for the r8
# window — P5(d) would find them anyway, this pins the order.
FILL_QUEUE = [
    "q4_order_priority", "q6_forecast_revenue", "q7_volume_shipping",
    "q9_product_type_profit", "q10_returned_items",
    "q11_important_stock", "q12_shipmode_priority",
    "q13_order_count_distribution", "q14_promo_effect",
    "q15_top_supplier", "q16_part_supplier_counts",
    "q17_small_quantity", "q18_large_orders", "q19_discounted_revenue",
    "q20_top_suppliers", "q21_waiting_orders",
    "q22_global_sales_opportunity",
    "ann_ivf_topk", "audio_resample", "jpeg_resize", "dup_span_stats",
    "bm25_top_terms", "pii_stats", "cdc_dup_chunks",
    "local_supplier_volume_bucketed",
    # registered in r7 (r8 candidates):
    "image_phash_pairs", "audio_fingerprint_pairs", "video_phash_pairs",
    "phash_dup_flags", "hll_distinct_tokens", "hist_quantiles",
    "kmeans_clusters", "zscore_pandas",
    # adjudicated r8 tail -> seated r8 via P5(d) order, pinned here:
    "salted_skew_agg", "train_test_split", "dq_profile",
    "topk_per_group", "ngram_jaccard_pairs", "minhash_signatures",
    "minhash_jaccard_estimate", "simhash", "cdc_chunks",
    "winnow_fingerprints",
    # r9 candidates (the rest of the adjudicated tail; every one
    # oracle-backed and green in tests/test_queries.py):
    "bpe_token_stats", "multimodal_pack", "bmp_resize",
    "sliding_window", "dedup_first_event",
    "symspell_typo_pairs", "typo_corrections", "q18_large_orders_bucketed",
    "q21_waiting_orders_bucketed",
    # registered late in r8 (corpus-hygiene family; all oracle-backed
    # and green in tests/test_queries.py + test_corpus.py):
    "bloom_decontaminate", "boilerplate_line_stats",
    "strip_boilerplate_lines", "quality_probe", "url_canonicalize",
    "url_dedup", "unigram_logprob_filter", "triangle_counts",
    "graph_degree_stats", "q3_shipping_priority_bucketed",
    "q10_returned_items_bucketed", "hll_distinct_by_source",
    "window_navigation", "cms_heavy_hitters",
    "weighted_sample_per_source", "variant_extract",
    "warc_source_extract", "arrow_text_stats",
    "warc_sink_roundtrip", "partition_pruned_daily",
    "dpp_enriched_revenue", "zscore_arrow",
    # registered late in r8 (warehouse-maintenance family + training
    # negative sampling; oracle-backed, green in tests/test_queries.py):
    "scd2_user_dim", "merge_upsert_customers", "jsonl_roundtrip",
    "contrastive_pairs",
    # registered in r9 (6 new vs 25 freed — inside the budget below):
    "skew_join_stats", "grouped_agg_mad", "orc_roundtrip",
    "observed_pipeline_filter", "recursive_ancestor_depth",
    "csv_roundtrip",
    # registered in r10 (6 new vs 18 freed — inside the budget): the
    # stream-stream join batch anchors (inner + left-outer), the
    # multi-probe IVF and multi-probe LSH variants, the RAG
    # sliding-window chunker, and temperature domain mixing
    "purchase_click_attribution", "ann_ivf_nprobe_topk",
    "token_chunks_overlap", "domain_mix_temperature",
    "purchase_click_attribution_outer", "ann_lsh_multiprobe_topk",
    # registered in r11 (vs 25 freed — inside the budget): the
    # trained-coarse-quantizer IVF (kmeans-derived cells replace the
    # fixture-label cells — VERDICT r10 item 2) and the batch anchor
    # of the transformWithState job (VERDICT r10 item 3; the
    # streaming twin is protobuf-gated in this container —
    # streaming/jobs.tws_available)
    "ann_ivf_trained_topk", "user_type_profile",
    # registered in r12 (8 new vs 18 freed at round open — inside the
    # budget). Only 3 seats remain after the P6 family fills, so the
    # order below picks which 3 seat NOW and which carry one round of
    # never-verified debt to r13 (when the 17 r11-first-green TPC-H
    # holds confirm and release). Seated first: the transformWithState
    # ListState / event-time-timer anchors (the round's new streaming
    # surface — nothing else driver-checks it) and DSIR (new operator
    # family in pipeline.py). Queued: the ANN trio + hybrid RRF,
    # whose module already has 7 driver-green siblings sharing the
    # same _topk / grid-cosine scaffolding, and the Arrow-UDTF twin
    # of an already-green query — the seats that add the least new
    # signal.
    "user_recent_events", "idle_user_flush", "dsir_importance_sample",
    "ann_ivf_sampled_topk", "ann_binary_hamming_topk",
    "matryoshka_two_stage_topk", "hybrid_rrf_topk",
    "sentence_split_udtf_arrow", "ngram_jaccard_pairs_prefix",
    # registered in r13 (3 new vs 12 freed at round open — inside the
    # budget): bpe_subword_tokens graduates off the rows-only
    # exemption (LAZY oracle), the ANN recall dashboard makes a
    # recall regression a CORRECTNESS failure (VERDICT r12 item 7),
    # and the ANN-densed hybrid exercises hybrid_rrf_topk's
    # documented swap-in point (binary-Hamming dense pool)
    "bpe_subword_tokens", "ann_recall_dashboard",
    "hybrid_rrf_ann_topk",
    # registered in r14 (1 new vs the r13-cohort releases — inside
    # the budget): binary-Hamming composed with the trained-IVF cell
    # layout (VERDICT r13 item 1) — the cell-pruned coarse scan that
    # retires the last full-table dense scan; hybrid_rrf_ann_topk's
    # dense pool swaps onto its candidates the same round
    "ann_ivf_hamming_topk",
    # registered in r15 (1 new vs 13 freed at round open — inside the
    # budget): the FAISS-standard IVF-PQ composition (VERDICT r14's
    # named successor to ann_pq_topk's full ADC scan) — ADC gathers
    # only inside the probed cells of the shared layout table
    "ann_ivf_pq_topk",
]

# P6: the curated family prefixes — every family keeps >= 1 window
# seat (tests/test_registry.py::test_driver_window_is_curated imports
# this tuple; one source of truth). A prefix names a capability
# family, not a single query: any member seats it. An entry may be a
# TUPLE of prefixes — one capability with several query spellings
# (r13: the Python-DataSource format roundtrips jsonl/orc/csv are one
# connector capability, and SCD2 + MERGE are one warehouse-
# maintenance capability; the min-greens pick rule then rotates the
# family's single seat among its members round-robin, which verifies
# each spelling periodically instead of pinning three near-identical
# seats forever).
FAMILIES = (
    "wc", "indexer", "crash_",
    "q4_", "q6_", "q7_", "q9_", "q10_", "q11_", "q12_",
    "q13_", "q14_", "q15_", "q16_", "q17_", "q18_",
    "q19_", "q20_", "q21_", "q22_",
    "join_inner_bucketed", "winnow_", "sessionize",
    "pretrain_", "purchase_", "ann_", "token_",
    "domain_", "audio_", "user_type_profile",
    # static + dynamic partition pruning are ONE SURVEY operator row
    # (§2 D2) — one capability family, two query spellings; likewise
    # the pandas scalar UDF / mapInArrow / applyInArrow / pandas
    # GROUPED_AGG UDAF kernels are one §2.3 vectorized-Python
    # surface
    "warc_", ("zscore_", "arrow_", "grouped_agg_"),
    ("partition_", "dpp_"),
    ("scd2_", "merge_"), ("jsonl_", "orc_", "csv_"),
    "contrastive_", "skew_",
    "observed_", "recursive_",
)


def family_prefixes(fam) -> tuple:
    """Normalize a FAMILIES entry to its tuple of prefixes."""
    return fam if isinstance(fam, tuple) else (fam,)


def in_family(name: str, fam) -> bool:
    return any(name.startswith(p) for p in family_prefixes(fam))

# REGISTRATION BUDGET (VERDICT r8 item 4): per round, register at
# most as many NEW oracle-backed queries as the round frees seats
# (demotions), so the never-verified debt is monotonically
# non-increasing. r8 registered 30 vs 26 freed and the debt grew
# 26 -> 35; r9 seated 25 of it, freed 25 and registered 6, leaving a
# 16-name queue for r10 against the ~18 seats the r8-first-green
# holds release on their second green. Check before registering:
# len(new) <= len(demoted).

# Deliberate NON-WINDOW queries (VERDICT r7 item 3): each line is a
# written exemption — the query is registered, runs in pytest, but a
# driver seat would add no verification signal. These do NOT count
# toward the never-verified debt metric.
EXEMPT = {
    "approx_distinct": "engine-internal HLL++ sketch, rows-only by "
        "design; its register-exact oracle-checked twin is "
        "hll_distinct_tokens (seated r8)",
    "approx_quantile": "engine-internal GK sketch, rows-only by "
        "design; its deterministic oracle-checked twin is "
        "hist_quantiles (seated r8); accuracy pinned vs exact_median "
        "in tests/test_approx.py",
    # bpe_subword_tokens GRADUATED r13 (VERDICT r12 item 3): the
    # trained merge table is deterministic, so textstats'
    # _bpe_oracle_lazy embeds the per-word subtoken counts as SQL
    # literals — the kmeans/PQ LAZY_ORACLES pattern. The approx pair
    # above stays: engine-internal sketch RNG is genuinely
    # un-oracle-able.
}

WINDOW = 50


def latest_round() -> int:
    """Highest N among CORRECTNESS_r{N}.json files on disk."""
    ns = [int(m.group(1)) for f in
          glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
          if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", f))]
    return max(ns) if ns else 0


def history(as_of: int | None = None,
            ) -> tuple[dict[str, int], dict[str, int], set[str], int]:
    """(cumulative greens, consecutive-green streak, names red in the
    latest round, n_rounds). `as_of` truncates the history to rounds
    <= that number — the judge-time fixpoint check uses it because the
    driver writes CORRECTNESS after the end-of-round snapshot, so the
    committed window always lags the on-disk history by one round."""
    greens: dict[str, int] = {}
    rounds = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if as_of is not None:
        rounds = [f for f in rounds
                  if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", f))
                  and int(m.group(1)) <= as_of]
    per_round: list[set[str]] = []
    latest_red: set[str] = set()
    for f in rounds:
        # guarded like latest_round(): the glob also matches
        # non-canonical names (CORRECTNESS_r14_backup.json) — skip
        # them instead of AttributeError-ing the whole policy
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        n = int(m.group(1))
        d = json.load(open(f))
        ok_raw = {k for k, v in d.items()
                  if v.get("rows_match") and v.get("schema_match")
                  and v.get("hash_match") in (True, None)}
        # a green recorded before the query's schema reset verified a
        # result shape that no longer exists — VOID for greens/streak,
        # but NOT a red: latest_red means "ran and mismatched" (the
        # P2 never-rotate-a-red rule), and a reset-filtered green did
        # not mismatch
        ok = {k for k in ok_raw if n >= SCHEMA_RESETS.get(k, 0)}
        per_round.append(ok)
        latest_red = set(d) - ok_raw
        for k in ok:
            greens[k] = greens.get(k, 0) + 1
    streak: dict[str, int] = {}
    for name in greens:
        s = 0
        for ok in reversed(per_round):
            if name in ok:
                s += 1
            else:
                break
        streak[name] = s
    return greens, streak, latest_red, len(rounds)


def propose(current_window: list[str],
            as_of: int | None = None) -> tuple[list[str], list[str]]:
    from mapreduce_go_spark import registry

    all_names = list(registry.all_queries())
    oracled = set(registry.all_oracles())
    greens, streak, latest_red, _ = history(as_of)

    keep = list(PERMANENT)
    keep += [n for n in current_window
             if n not in keep and n in ANCHORS]
    keep += [n for n in current_window  # P2: red rows never rotate out
             if n not in keep and n in latest_red]
    keep += [n for n in current_window
             if n not in keep and streak.get(n, 0) == 1]  # P2 holds
    demoted = [n for n in current_window if n not in keep]

    fills: list[str] = []
    seats = WINDOW - len(keep)
    # DEBT FIRST (r13, VERDICT r12 item 1): never-driver-verified
    # names are the hard verification debt — the registration budget
    # bounds their count to seats freed per round, so seating ALL of
    # them before family re-representation both drains the debt in
    # one round and still leaves P6 enough seats (the r12 order — P6
    # before debt — left 3 of 6 zero-green registrations unseated
    # while re-seating greens=4 TPC-H rows).
    debt = [n for n in FILL_QUEUE if n in all_names and n in oracled
            and greens.get(n, 0) == 0 and n not in keep]
    debt += [n for n in all_names  # newest registrations not queued
             if n in oracled and greens.get(n, 0) == 0
             and n not in keep and n not in debt]
    fills += debt[:seats]
    # P6 second: a missing curated family outranks every green pool
    # name — seat its least-verified oracle-backed member
    # (registry-order tie-break). Deterministic in (keep, history,
    # registry) only, so propose() stays idempotent (the fixpoint
    # test re-runs it on its own output).
    for fam in FAMILIES:
        if len(fills) >= seats:
            break
        seated = keep + fills
        if any(in_family(n, fam) for n in seated):
            continue
        cands = [n for n in all_names
                 if in_family(n, fam) and n in oracled
                 and n not in seated]
        if cands:
            fills.append(min(
                cands,
                key=lambda n: (greens.get(n, 0), all_names.index(n))))
    pool = [n for n in FILL_QUEUE if n in all_names and n in oracled
            and greens.get(n, 0) == 0 and n not in keep
            and n not in fills]
    # cdc_dup_chunks has a prior green but was queued by r6 — allow
    # queued names with greens as the tail of the pool
    pool += [n for n in FILL_QUEUE if n in all_names and n in oracled
             and greens.get(n, 0) > 0 and n not in keep
             and n not in fills and n not in pool]
    pool += [n for n in all_names  # P5(d): newest registrations
             if n in oracled and greens.get(n, 0) == 0
             and n not in keep and n not in fills and n not in pool]
    fills += pool[:seats - len(fills)]
    window = keep + fills
    # report only true exits (a P6 family pick may re-seat a name the
    # keep-set released — that's a hold, not a demotion)
    demoted = [n for n in demoted if n not in window]
    return window, demoted


def render_window(window: list[str], greens: dict[str, int],
                  streak: dict[str, int], as_of: int) -> str:
    """The generated mapreduce_go_spark/window.py source."""
    lines = [
        '"""Driver-window seats — GENERATED, do not hand-edit.',
        "",
        "Regenerate with `python tools/rotation.py --write` as the",
        "FIRST act of each round. The policy lives in",
        "tools/rotation.py; the registry re-exports these names and",
        "tests/test_registry.py asserts the window is the policy's",
        "fixpoint over the CORRECTNESS history up to _WINDOW_AS_OF.",
        '"""',
        "",
        f"_WINDOW_AS_OF = {as_of}",
        "",
        "_PRIORITY: list[str] = [",
    ]
    for n in window:
        tag = ("PERM" if n in PERMANENT else
               "ANCH" if n in ANCHORS else
               "HOLD" if streak.get(n, 0) == 1 else "FILL")
        lines.append(f"    \"{n}\",  # {tag} greens={greens.get(n, 0)}")
    lines.append("]")
    lines.append("")
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true",
                    help="regenerate mapreduce_go_spark/window.py")
    args = ap.parse_args()

    from mapreduce_go_spark import registry

    current = list(registry.all_queries())[:WINDOW]
    window, demoted = propose(current)
    greens, streak, _red, n_rounds = history()
    never = [n for n in registry.all_queries()
             if greens.get(n, 0) == 0 and n not in EXEMPT]
    print(f"# rounds seen: {n_rounds}; never-verified now: "
          f"{len(never)} (+ {len(EXEMPT)} written exemptions)")
    print(f"# window as-of round: {latest_round()}")
    print(f"# proposed window ({len(window)} seats):")
    for n in window:
        tag = ("PERM" if n in PERMANENT else
               "ANCH" if n in ANCHORS else
               "HOLD" if streak.get(n, 0) == 1 else "FILL")
        print(f"    \"{n}\",  # {tag} greens={greens.get(n, 0)}")
    if args.write:
        path = os.path.join(REPO, "mapreduce_go_spark", "window.py")
        with open(path, "w") as f:
            f.write(render_window(window, greens, streak,
                                  latest_round()))
        print(f"# wrote {path}")
    if window == current:
        # registry._PRIORITY already IS the fixpoint — the "demoted"
        # list would just echo this window's own fill seats (they are
        # in the current window but not in `keep`), which misled a
        # post-regen reading in r9; say the true thing instead
        print("# current window == proposal (fixpoint; nothing to "
              "demote)")
    else:
        print(f"# demoted ({len(demoted)}):")
        for n in demoted:
            print(f"#   {n} (greens={greens.get(n, 0)})")
    after = [n for n in never if n not in window]
    print(f"# never-verified after this round if 50/50: {len(after)}")


if __name__ == "__main__":
    main()
