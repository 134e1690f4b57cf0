"""applyInPandas grouped-map must agree with the JVM expression plan
(tolerance-based: pandas reductions aren't bit-portable)."""

from mapreduce_go_spark.operators import grouped_map


def test_pandas_zscore_matches_jvm(spark, sf_dir):
    jvm = {r.event_id: r.z
           for r in grouped_map.grouped_zscore(spark, sf_dir).collect()}
    pnd = {r.event_id: r.z
           for r in grouped_map.zscore_pandas(spark, sf_dir).collect()}
    assert set(jvm) == set(pnd)
    for k, v in jvm.items():
        assert abs(v - pnd[k]) < 1e-6, (k, v, pnd[k])
