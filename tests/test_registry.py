"""Registry invariants: every query must at least build a valid plan
(analysis passes — catches schema drift instantly without executing),
names are stable identifiers, and every oracle references registered
fixture tables only."""

import re

import pytest

from mapreduce_go_spark import registry, tables

_QUERIES = registry.all_queries()
_ORACLES = registry.all_oracles()


def test_names_are_identifiers():
    for name in _QUERIES:
        assert re.fullmatch(r"[a-z][a-z0-9_]*", name), name


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_plan_builds(spark, name):
    # sf0.001: cheapest fixtures; .schema forces full analysis
    df = _QUERIES[name](spark, "/root/testdata/sf0.001")
    assert df.schema.fields, name


def test_no_vacuous_oracles(duck):
    """Every oracle query must return rows on the fixtures — a 0-row
    result 'matches' trivially and verifies nothing (three queries
    shipped vacuous before this audit existed)."""
    for name, sql in _ORACLES.items():
        n = duck.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0]
        assert n > 0, f"{name} returns 0 rows on the fixtures"


def test_oracles_reference_known_tables_only(duck):
    # DuckDB's own binder is the checker: EXPLAIN each oracle against
    # the registered views; unknown tables/functions fail here.
    for name, sql in _ORACLES.items():
        duck.execute(f"EXPLAIN {sql}")
