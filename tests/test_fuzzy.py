"""SymSpell fuzzy-matching contracts beyond the differential oracle:
ground-truth typo recovery, the degenerate-key cap actually firing,
and the no-all-pairs plan shape."""

import os

from pyspark.sql import functions as F

from mapreduce_go_spark.operators import fuzzy


def _expected_typo_pairs(sf_dir):
    """Spark-free re-derivation of the synthesized (clean, typo)
    ground truth from the parquet fixture."""
    import re

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    pairs = set()
    for doc_id, text in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
        ws = re.split(r"[^a-z]+", text.lower())
        w = ws[doc_id % len(ws)]
        if not (fuzzy.FUZZY_MIN_LEN <= len(w) <= fuzzy.FUZZY_MAX_LEN):
            continue
        p = doc_id % len(w)  # 0-based here; SQL is 1-based
        c = ws[doc_id % len(ws)][p]
        nc = chr(97 + ((ord(c) - 97) + 1 + doc_id % 25) % 26)
        typo = w[:p] + nc + w[p + 1:]
        pairs.add(tuple(sorted((w, typo))))
    return pairs


def test_symspell_recovers_injected_typos(spark, sf_dir):
    """Every emitted pair must be a true distance-<=1 pair, and the
    injected (clean, typo) ground truth must be recovered above a
    calibrated floor (the cap legitimately drops pairs whose delete
    keys are degenerate — that loss is the documented trade, bounded
    here)."""
    got = {tuple(sorted((r.w1, r.w2)))
           for r in fuzzy.symspell_typo_pairs(spark, sf_dir).collect()}
    assert got
    expected = _expected_typo_pairs(sf_dir)
    assert expected
    recovered = expected & got
    recall = len(recovered) / len(expected)
    assert recall >= 0.8, (recall, len(expected), len(got))


def test_symspell_key_cap_exercised(spark, sf_dir):
    """FUZZY_KEY_CAP must drop >= 1 over-cap deletion key on the
    fixtures — otherwise the capped path is vacuously green (the
    LSH_BUCKET_CAP calibration discipline)."""
    vocab = fuzzy._all_words(spark, sf_dir)
    variants = vocab.selectExpr(
        "w",
        "explode(array_union(array(w), "
        " transform(sequence(1, length(w)), i ->"
        "  concat(substring(w, 1, i - 1), substring(w, i + 1))))) AS v")
    over = (variants.groupBy("v").count()
            .where(F.col("count") > fuzzy.FUZZY_KEY_CAP).count())
    assert over >= 1, over


def test_symspell_no_allpairs_join(spark, sf_dir):
    """The candidate join must be an equi-join on the deletion key —
    never a cartesian / nested-loop product over the vocabulary."""
    import contextlib
    import io

    p_df = fuzzy.symspell_typo_pairs(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        p_df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan


def test_typo_corrections_recover_sources(spark, sf_dir):
    """Every OOV token must receive a correction on the fixtures (all
    synthesized typos are distance-1 from a clean word by
    construction — the NULL miss path is a completeness guarantee,
    not a fixture feature), every correction must be a genuine
    distance-<=1 clean word, and the chosen correction must be the
    typo's true SOURCE word for the clear majority (the argmax-
    frequency rule may legitimately pick a more frequent neighbor)."""
    rows = fuzzy.typo_corrections(spark, sf_dir).collect()
    assert rows
    assert all(r.corrected is not None for r in rows)

    def lev1(a, b):
        if a == b:
            return True
        if abs(len(a) - len(b)) > 1:
            return False
        if len(a) == len(b):
            return sum(x != y for x, y in zip(a, b)) == 1
        s, t = (a, b) if len(a) < len(b) else (b, a)
        for i in range(len(t)):
            if t[:i] + t[i + 1:] == s:
                return True
        return False

    assert all(lev1(r.w, r.corrected) for r in rows)

    source = {}
    for w1, w2 in _expected_typo_pairs(sf_dir):
        # pair is sorted; the noisy member is the one fuzzy reports
        source.setdefault(w1, set()).add(w2)
        source.setdefault(w2, set()).add(w1)
    hits = sum(1 for r in rows
               if r.corrected in source.get(r.w, set()))
    assert hits / len(rows) >= 0.8, (hits, len(rows))
