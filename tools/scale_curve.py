"""Empirical scale curve for the production dedup/similarity paths.

The sub-quadratic claims in SCALE.md (capped-LSH candidates -> exact
verify; blocked embedding near-dup) are argued from plan shape; this
tool MEASURES them: it synthesizes a ~10x corpus from the sf0.1
fixtures (deterministic perturbation — copies are NOT near-dups of
each other, so the dup-rate and bucket-size distribution stay
realistic instead of creating degenerate 10-doc buckets) and times
the operators at 1x and 10x. A quadratic pipeline would show ~100x;
the measured ratios go into SCALE.md.

Usage: python tools/scale_curve.py [--base /root/testdata/sf0.1]
       [--out /tmp/scale_curve] [--factor 10]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHIFT = 10_000_000  # doc_id/vec_id offset per synthetic copy


def build_corpora(spark, base: str, out: str, factor: int,
                  with_events: bool = True) -> tuple[str, str]:
    """Write x1 (pass-through) and x<factor> scaled dirs with
    documents.parquet + embeddings.parquet, plus events.parquet when
    `with_events` (skipped for documents/embeddings-only --only runs
    — the events union+write is pure wasted wall there)."""
    from pyspark.sql import functions as F

    from mapreduce_go_spark import tables

    x1 = os.path.join(out, "x1")
    xn = os.path.join(out, f"x{factor}")
    shutil.rmtree(out, ignore_errors=True)

    docs = tables.load(spark, base, "documents")
    emb = spark.read.parquet(os.path.join(base, "embeddings.parquet"))

    docs.coalesce(2).write.parquet(os.path.join(x1, "documents.parquet"))
    emb.coalesce(1).write.parquet(os.path.join(x1, "embeddings.parquet"))

    if with_events:
        # events scale as NEW USERS (user_id shifted per copy), the
        # way a clickstream actually grows — shifting only event_id
        # would pile k copies into the same (user, hour) neighborhoods
        # and inflate any per-user join/session state k-fold per key
        # (quadratic pair growth): a skew experiment, not a scale
        # curve.
        ev = tables.load(spark, base, "events")
        ev.coalesce(2).write.parquet(os.path.join(x1, "events.parquet"))
        ev_parts = [ev] + [
            ev.select(
                (F.col("event_id") + k * SHIFT).alias("event_id"),
                "ts",
                (F.col("user_id") + k * SHIFT).alias("user_id"),
                "event_type", "value", "props",
            )
            for k in range(1, factor)
        ]
        big_ev = ev_parts[0]
        for e in ev_parts[1:]:
            big_ev = big_ev.unionByName(e)
        big_ev.repartition(4).write.parquet(
            os.path.join(xn, "events.parquet"))

    doc_parts, emb_parts = [], []
    for k in range(factor):
        if k == 0:
            doc_parts.append(docs)
            emb_parts.append(emb)
            continue
        # perturb ~25% of words (word -> word||letter — a LETTER
        # suffix: the shingle tokenizer splits on non-letters, so a
        # digit suffix would be invisible to it, measured as exactly
        # 10x-inflated buckets): ~58% of 3-gram shingles change, so
        # copies fall below the 0.5 Jaccard threshold and do NOT form
        # giant LSH buckets. Past k=26 the single-char suffix would
        # leave a-z and become a separator (the same invisibility
        # trap) — switch to a two-LETTER suffix there; k<=26 keeps
        # the original spelling so 10x corpora are bit-identical to
        # the r12 runs.
        suffix = (chr(96 + k) if k <= 26 else
                  chr(96 + (k - 1) // 26) + chr(97 + (k - 1) % 26))
        toks = F.split(F.col("text"), " ")
        perturbed = F.array_join(
            F.transform(
                toks,
                lambda x, i: F.when((i + F.lit(k)) % 4 == 0,
                                    F.concat(x, F.lit(suffix)))
                .otherwise(x),
            ),
            " ",
        )
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + k * SHIFT).alias("doc_id"),
                perturbed.alias("text"),
                *[c for c in docs.columns if c not in ("doc_id", "text")],
            )
        )
        # decorrelate copies: rotate dimensions by k and flip signs
        # deterministically (norm-preserving). A small jitter would NOT
        # flip sign-projection bits — the 10 copies would pile into the
        # same LSH buckets, trip the degenerate-bucket cap and make the
        # 10x run artificially cheap (measured: 0 candidates). Past
        # k=63 rotate-by-k repeats mod dim and any linear-in-k parity
        # term is blind to +64 (even), so an EXTRA sign pattern keyed
        # on k//64 flips half the dimensions for the second lap —
        # copies k and k+64 share a rotation only when their lap
        # patterns differ, so no two of the 100 copies are identical
        # (the r13 review caught the first fix, k + 32*(k//64), still
        # colliding k+32 with k+64: rotation ≡ mod 64 and parity both
        # matched). k<64 is bit-identical to the r12 corpora.
        lap = k // 64
        dim = F.size(F.col("embedding"))
        jit = F.transform(
            F.col("embedding"),
            lambda x, j: (
                F.element_at(F.col("embedding"),
                             ((j + F.lit(k)) % dim) + 1)
                * F.when((j + F.col("vec_id") + F.lit(k)) % 2 == 0,
                         F.lit(-1.0)).otherwise(F.lit(1.0))
                * F.when(F.lit(lap) % 2 == 1,
                         F.when(j % 4 < 2, F.lit(-1.0))
                         .otherwise(F.lit(1.0)))
                .otherwise(F.lit(1.0))
            ).cast("float"),
        )
        emb_parts.append(
            emb.select((F.col("vec_id") + k * SHIFT).alias("vec_id"),
                       jit.alias("embedding"), "label")
        )
    big_docs, big_emb = doc_parts[0], emb_parts[0]
    for d in doc_parts[1:]:
        big_docs = big_docs.unionByName(d)
    for e2 in emb_parts[1:]:
        big_emb = big_emb.unionByName(e2)
    big_docs.repartition(8).write.parquet(os.path.join(xn, "documents.parquet"))
    big_emb.repartition(4).write.parquet(os.path.join(xn, "embeddings.parquet"))
    return x1, xn


def time_query(fn, spark, sf_dir: str, runs: int = 2) -> tuple[float, int]:
    best, rows = float("inf"), 0
    for _ in range(runs):
        t0 = time.time()
        rows = fn(spark, sf_dir).count()
        best = min(best, time.time() - t0)
    return best, rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/scale_curve")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--only", default="",
                    help="comma-separated query names (default: all)")
    args = ap.parse_args()

    from mapreduce_go_spark.session import get_spark
    from mapreduce_go_spark.operators.audio import (audio_features,
                                                    audio_fingerprint_pairs)
    from mapreduce_go_spark.operators.dedup import (
        dedup_verified_pairs, ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix, simhash_neardup_pairs_capped,
        strip_dup_spans)
    from mapreduce_go_spark.operators.multimodal import (image_phash_pairs,
                                                         phash_dup_flags)
    from mapreduce_go_spark.operators.pipeline import pretrain_corpus
    from mapreduce_go_spark.operators.quality import (
        bm25_search, cms_heavy_hitters, decontaminate,
        hll_distinct_by_source, hll_distinct_tokens, repetition_stats)
    from mapreduce_go_spark.operators.similarity import (
        ann_binary_hamming_topk, ann_ivf_hamming_topk, ann_ivf_nprobe_topk,
        ann_ivf_pq_topk, ann_ivf_sampled_topk, ann_ivf_trained_topk,
        ann_lsh_multiprobe_topk, ann_pq_topk,
        embedding_neardup_pairs_blocked, hybrid_rrf_ann_topk,
        hybrid_rrf_topk, matryoshka_two_stage_topk)
    from mapreduce_go_spark.operators.streaming_batch import (
        idle_user_flush, purchase_click_attribution,
        purchase_click_attribution_outer, user_recent_events,
        user_type_profile)
    from mapreduce_go_spark.operators.corpus import (
        bloom_decontaminate, quality_probe, strip_boilerplate_lines,
        unigram_logprob_filter, url_dedup)
    from mapreduce_go_spark.operators.graph import triangle_counts
    from mapreduce_go_spark.operators.advanced import recursive_ancestor_depth
    from mapreduce_go_spark.operators.pipeline import (
        dsir_importance_sample, observed_pipeline_filter,
        token_chunks_overlap)
    from mapreduce_go_spark.operators.quality import domain_mix_temperature
    from mapreduce_go_spark.operators.video import (mjpeg_frame_sample,
                                                    video_phash_pairs)

    spark = get_spark("scale_curve")
    only = {n for n in args.only.split(",") if n}
    # the only curve queries reading events; skip the events
    # union+write for documents/embeddings-only runs
    needs_events = (not only) or bool(
        only & {"purchase_click_attribution",
                "purchase_click_attribution_outer",
                "user_type_profile", "user_recent_events",
                "idle_user_flush"})
    x1, xn = build_corpora(spark, args.base, args.out, args.factor,
                           with_events=needs_events)
    result = {"factor": args.factor, "base": args.base, "queries": {}}
    for name, fn in [("dedup_verified_pairs", dedup_verified_pairs),
                     ("embedding_neardup_pairs_blocked",
                      embedding_neardup_pairs_blocked),
                     ("simhash_neardup_pairs_capped",
                      simhash_neardup_pairs_capped),
                     ("repetition_stats", repetition_stats),
                     ("decontaminate", decontaminate),
                     ("ann_pq_topk", ann_pq_topk),
                     ("strip_dup_spans", strip_dup_spans),
                     ("ngram_jaccard_pairs", ngram_jaccard_pairs),
                     ("ngram_jaccard_pairs_prefix",
                      ngram_jaccard_pairs_prefix),
                     ("audio_features", audio_features),
                     ("mjpeg_frame_sample", mjpeg_frame_sample),
                     ("image_phash_pairs", image_phash_pairs),
                     ("phash_dup_flags", phash_dup_flags),
                     ("audio_fingerprint_pairs", audio_fingerprint_pairs),
                     ("video_phash_pairs", video_phash_pairs),
                     ("hll_distinct_tokens", hll_distinct_tokens),
                     ("bloom_decontaminate", bloom_decontaminate),
                     ("strip_boilerplate_lines", strip_boilerplate_lines),
                     ("quality_probe", quality_probe),
                     ("url_dedup", url_dedup),
                     ("unigram_logprob_filter", unigram_logprob_filter),
                     ("triangle_counts", triangle_counts),
                     ("hll_distinct_by_source", hll_distinct_by_source),
                     ("cms_heavy_hitters", cms_heavy_hitters),
                     ("recursive_ancestor_depth", recursive_ancestor_depth),
                     ("observed_pipeline_filter", observed_pipeline_filter),
                     ("purchase_click_attribution",
                      purchase_click_attribution),
                     ("ann_ivf_nprobe_topk", ann_ivf_nprobe_topk),
                     ("token_chunks_overlap", token_chunks_overlap),
                     ("domain_mix_temperature", domain_mix_temperature),
                     ("purchase_click_attribution_outer",
                      purchase_click_attribution_outer),
                     ("ann_lsh_multiprobe_topk", ann_lsh_multiprobe_topk),
                     ("ann_ivf_trained_topk", ann_ivf_trained_topk),
                     ("ann_ivf_sampled_topk", ann_ivf_sampled_topk),
                     ("ann_binary_hamming_topk", ann_binary_hamming_topk),
                     ("ann_ivf_hamming_topk", ann_ivf_hamming_topk),
                     ("ann_ivf_pq_topk", ann_ivf_pq_topk),
                     ("bm25_search", bm25_search),
                     ("matryoshka_two_stage_topk", matryoshka_two_stage_topk),
                     ("dsir_importance_sample", dsir_importance_sample),
                     ("hybrid_rrf_topk", hybrid_rrf_topk),
                     ("hybrid_rrf_ann_topk", hybrid_rrf_ann_topk),
                     ("user_type_profile", user_type_profile),
                     ("user_recent_events", user_recent_events),
                     ("idle_user_flush", idle_user_flush),
                     ("pretrain_corpus", pretrain_corpus)]:
        if only and name not in only:
            continue
        t1, r1 = time_query(fn, spark, x1)
        tn, rn = time_query(fn, spark, xn)
        result["queries"][name] = {
            "t_x1_sec": round(t1, 3), "rows_x1": r1,
            f"t_x{args.factor}_sec": round(tn, 3),
            f"rows_x{args.factor}": rn,
            "ratio": round(tn / t1, 2),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
