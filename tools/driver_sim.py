"""Full-window driver simulation — de-risks CORRECTNESS_r{N} before
round close by running exactly what the driver runs: a VANILLA
SparkSession (no repo confs — catches session-dependency bugs), the
FIRST 50 registry queries at sf0.01, each compared to its DuckDB
oracle with the name-sorted column canonicalization the driver uses
(tests/helpers.canonical_rows). Prior rounds did this ad hoc in a
heredoc each time; this pins the recipe (verify SKILL + memory note).

Run:  python tools/driver_sim.py            (all 50 window seats)
      python tools/driver_sim.py name1,...  (subset)

Exit 0 = every seat green. Run it from a FRESH process — a session
with repo confs already applied in the same JVM would mask vanilla-
session bugs (Spark reuses the first session per process).
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.01")
WINDOW = 50


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    from mapreduce_go_spark import registry
    from tests.helpers import canonical_rows

    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("driver-sim").getOrCreate())
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{SF_DIR}/{t}.parquet'")

    queries = registry.all_queries()
    oracles = registry.all_oracles()
    names = list(queries)[:WINDOW]
    if len(sys.argv) > 1 and sys.argv[1]:
        names = [n for n in sys.argv[1].split(",") if n]

    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, SF_DIR)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                status = f"rows-only ({len(s_rows)} rows)"
                if not s_rows:
                    raise AssertionError("0 rows on rows-only query")
            else:
                rel = con.execute(oracles[name])
                d_cols = [d[0] for d in rel.description]
                d_rows = rel.fetchall()
                assert sorted(s_cols) == sorted(d_cols), (
                    f"schema: spark={sorted(s_cols)} duck={sorted(d_cols)}")
                assert len(s_rows) == len(d_rows), (
                    f"rows: spark={len(s_rows)} duck={len(d_rows)}")
                _, sc = canonical_rows(s_cols, s_rows)
                _, dc = canonical_rows(d_cols, d_rows)
                assert sc == dc, "value hash mismatch"
                status = f"match ({len(s_rows)} rows)"
        except Exception as ex:
            status = f"FAIL: {type(ex).__name__}: {ex}"
            failures.append(name)
            traceback.print_exc()
        print(f"{name:40s} {status}  [{time.time() - t0:.1f}s]",
              flush=True)
    print(f"\n{len(names) - len(failures)}/{len(names)} green"
          + (f"; FAILURES: {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
