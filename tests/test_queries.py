"""Differential tests: every registered query with an oracle must match
DuckDB on the sf0.01 fixtures; oracle-less queries get a rows/schema
smoke check (the driver applies the same two-tier policy)."""

import pytest

from mapreduce_go_spark import registry

from .helpers import compare

_QUERIES = registry.all_queries()
_ORACLES = registry.all_oracles()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_match(spark, duck, sf_dir, name):
    df = _QUERIES[name](spark, sf_dir)
    rel = duck.execute(_ORACLES[name])
    compare(df, rel, name)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only(spark, sf_dir, name):
    df = _QUERIES[name](spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert df.columns


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
