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


def test_variant_malformed_derivation_aligned(spark, tmp_path):
    """The SCALE.md r11 latent, closed: `malformed` must mean "the
    parse failed" on BOTH engines — Spark v.isNull(), DuckDB
    json_valid over the SAME grafted body — not the generator's
    event_id % 97 shortcut. Pins the cases the fixture can't reach:
    props missing $.k (NULL graft -> NULL body) and a non-numeric
    $.k (graft becomes invalid JSON). Differential over a crafted
    events table through the real query + real oracle."""
    import duckdb

    from mapreduce_go_spark import registry, tables
    from .helpers import compare

    rows = [
        (1, '{"k": 7}'),          # healthy
        (97, '{"k": 7}'),         # %97 marker row -> '{bad'
        (2, '{"x": 1}'),          # $.k missing -> NULL body
        (3, '{"k": "abc"}'),      # non-numeric -> invalid graft JSON
        (4, '{"k": 12}'),         # healthy, odd flags/depth branches
    ]
    pq = str(tmp_path / "events.parquet")
    con = duckdb.connect()
    con.execute(
        "COPY (SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{p}')".replace("'{", "$${").replace("}'", "}$$")
                   for i, p in rows)
        + ") t(event_id, props)) TO '" + pq + "' (FORMAT parquet)")
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{pq}'")

    orig = tables.load

    def crafted_load(spark_, sf_dir_, name):
        assert name == "events"
        return spark_.read.parquet(pq)

    tables.load = crafted_load
    try:
        df = registry.all_queries()["variant_extract"](spark, "unused")
        got = {r.event_id: r.malformed for r in df.collect()}
        # the parse-failure rows, by cause
        assert got == {1: False, 97: True, 2: True, 3: True, 4: False}
        compare(df, con.execute(
            registry.all_oracles()["variant_extract"]),
            "variant_extract_crafted")
    finally:
        tables.load = orig
        con.close()
