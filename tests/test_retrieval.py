"""chunk_retrieval_topk support tests (the value differential itself
runs in tests/test_queries.py like every oracle-backed query): the
driver-side query-vector twin must match the Spark featurizer, the
locally-pinned dimension must track quality.FH_DIM, retrieval must
actually retrieve (a chunk containing the query words ranks first),
and the two-phase top-k must equal a single global ranking.
"""

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_go_spark.operators import pipeline, quality


def test_fh_dim_pin_matches_quality():
    assert pipeline._FH_DIM == quality.FH_DIM


def test_qvec_twin_matches_spark_featurizer(spark):
    """_fh_qvec (hashlib, driver-side) must equal fh_bucket/fh_sign
    (Spark md5 expressions) summed over the same tokens."""
    for _, qtext in pipeline.RETRIEVAL_QUERIES:
        want = pipeline._fh_qvec(qtext)
        df = spark.createDataFrame([(0, qtext)], "doc_id long, text string")
        vec = quality.feature_hash_embed_df(df).collect()[0].vec
        assert list(vec) == want, qtext


def test_retrieval_finds_planted_chunk(spark, sf_dir):
    """Every fixed query's words come from the corpus vocabulary, so
    the top hit must share tokens with the query — and its score must
    be positive and <= 1 (cosine over exact integers)."""
    rows = pipeline.chunk_retrieval_topk(spark, sf_dir).collect()
    assert len(rows) == len(pipeline.RETRIEVAL_QUERIES) * \
        pipeline.RETRIEVAL_K
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    for qid, qrows in by_q.items():
        ranks = sorted(r.rank for r in qrows)
        assert ranks == list(range(1, pipeline.RETRIEVAL_K + 1))
        top = min(qrows, key=lambda r: r.rank)
        assert 0 < float(top.score) <= 1.0


def test_two_phase_topk_equals_global(spark, sf_dir):
    """The salted local-then-global ranking must return exactly the
    rows a single global row_number would — local top-K per salt
    bucket is a superset of the global top-K by construction."""
    got = sorted(map(tuple,
                     pipeline.chunk_retrieval_topk(spark, sf_dir)
                     .select("qid", "rank", "doc_id", "chunk_no")
                     .collect()))
    # independent single-window formulation over the same scores
    import math

    from mapreduce_go_spark import tables
    from mapreduce_go_spark.operators.dedup import cdc_chunks_df
    from mapreduce_go_spark.operators.quality import (FH_DIM, fh_bucket,
                                                      fh_sign)

    docs = tables.load(spark, sf_dir, "documents")
    ch = cdc_chunks_df(docs, with_text=True)
    tok = (ch.select("doc_id", "chunk_no",
                     F.explode(F.split("chunk_text", "[^a-zA-Z]+"))
                     .alias("tok"))
           .where(F.col("tok") != ""))
    sums = (tok.select("doc_id", "chunk_no",
                       fh_bucket(F.col("tok")).alias("b"),
                       fh_sign(F.col("tok")).alias("s"))
            .groupBy("doc_id", "chunk_no")
            .agg(*[F.expr(f"sum(if(b = {d}, s, 0L))").alias(f"v{d}")
                   for d in range(FH_DIM)]))
    n2 = " + ".join(f"v{d} * v{d}" for d in range(FH_DIM))
    want = []
    for qid, qtext in pipeline.RETRIEVAL_QUERIES:
        q = pipeline._fh_qvec(qtext)
        qn = math.sqrt(sum(x * x for x in q))
        dot = " + ".join(f"v{d} * ({q[d]}L)"
                         for d in range(FH_DIM) if q[d] != 0) or "0L"
        scored = sums.selectExpr(
            "doc_id", "chunk_no", f"({n2}) AS n2",
            f"cast(({dot}) AS double)"
            f" / (sqrt(cast(({n2}) AS double))"
            f" * cast({qn!r} AS double)) AS score").where("n2 > 0")
        w = Window.orderBy(F.desc("score"), "doc_id", "chunk_no")
        top = (scored.withColumn("rank", F.row_number().over(w))
               .where(F.col("rank") <= pipeline.RETRIEVAL_K)
               .select(F.lit(qid).alias("qid"), "rank",
                       "doc_id", "chunk_no"))
        want.extend(map(tuple, top.collect()))
    assert got == sorted(want)
