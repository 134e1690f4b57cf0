"""Observable-metrics surface (df.observe): the metrics must be the
EXACT aggregates over the rows the action produced — computed in the
same pass, no second scan — and attaching the observation must not
perturb the result rows."""

import duckdb

from pyspark.sql import Observation

from mapreduce_go_spark.operators.pipeline import (
    OBS_MIN_CHARS, observed_pipeline_filter)


def test_observed_metrics_match_independent_aggregate(spark, sf_dir):
    obs = Observation("pipeline_test")
    df = observed_pipeline_filter(spark, sf_dir, observation=obs)
    rows = df.collect()
    got = obs.get
    con = duckdb.connect()
    want = con.execute(
        f"""SELECT count(*), sum(n_chars),
                   count(DISTINCT lang), min(n_chars)
            FROM '{sf_dir}/documents.parquet'
            WHERE n_chars >= {OBS_MIN_CHARS}"""
    ).fetchone()
    assert got["rows_kept"] == want[0] == len(rows)
    assert got["chars_kept"] == want[1]
    assert got["langs_kept"] == want[2]
    assert got["min_chars"] == want[3]


def test_observation_does_not_change_rows(spark, sf_dir):
    from mapreduce_go_spark import tables
    from pyspark.sql import functions as F

    plain = (
        tables.load(spark, sf_dir, "documents")
        .where(F.col("n_chars") >= OBS_MIN_CHARS)
        .select("doc_id", "lang", "source", "n_chars")
    )
    observed = observed_pipeline_filter(spark, sf_dir)
    assert sorted(map(tuple, observed.collect())) == \
        sorted(map(tuple, plain.collect()))
