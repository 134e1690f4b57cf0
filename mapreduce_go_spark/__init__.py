"""mapreduce_go_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
MapReduce engine (s09g/mapreduce-go, surveyed in /root/repo/SURVEY.md)
as idiomatic PySpark: DataFrame/SQL plans optimized by Catalyst, plus
the LLM-data-pipeline operator set (dedup, similarity search,
multimodal columns, text analysis) mandated by BASELINE.json.

Layout:
    session.py    — SparkSession factory (AQE, Arrow, UTC, tuned shuffle)
    tables.py     — fixture table loaders (parquet star schema + docs/events/embeddings)
    registry.py   — the query registry: name -> (callable, oracle SQL)
    operators/    — query/operator implementations (SURVEY §2)
    functions/    — reusable column-expression helpers (tokenize, cosine, hashing)
    streaming/    — Structured Streaming twins of the windowed operators
"""

from mapreduce_go_spark.session import get_spark

__all__ = ["get_spark"]
