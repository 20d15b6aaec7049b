"""Guard tests for the eval-tier sampling knobs (VERDICT r5 #5, r6 #3).

The exact tiers deliberately compute a truth set that is infeasible at
100 TB (`dedup_lsh_eval`'s exact-Jaccard pairs, `dedup_ngram_containment`'s
directional audit, `agg_cms_audit`'s exact frequency pass, and — since r7 —
`dedup_exact_substring`'s corpus-wide span accounting).  Each carries a
sampling parameter as the production escape hatch; the registered queries
keep the default (exact) semantics so their oracles are unchanged.  These
tests pin:

* defaults are exact (knob absent == knob at 1.0),
* the sampled path is deterministic (same result twice — md5 membership,
  no RNG state),
* sampled results relate honestly to the exact results (restriction /
  subset semantics, not merely "fewer rows"),
* invalid fractions raise before any Spark work.
"""

from __future__ import annotations

import pytest

from dataframework_spark.operators.dedup import (
    dedup_exact_substring,
    dedup_lsh_eval,
    dedup_ngram_containment,
)
from dataframework_spark.operators.relational import agg_cms_audit

from conftest import ORACLE_SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "fn,kw",
    [
        (dedup_lsh_eval, "sample_frac"),
        (dedup_ngram_containment, "probe_sample_frac"),
        (agg_cms_audit, "exact_sample_frac"),
        (dedup_exact_substring, "sample_frac"),
    ],
)
@pytest.mark.parametrize("bad", [0.0, -0.1, 1.5])
def test_invalid_fraction_rejected(spark, fn, kw, bad):
    with pytest.raises(ValueError):
        fn(spark, ORACLE_SF_DIR, **{kw: bad})


def test_lsh_eval_sampled_is_deterministic_and_bounded(spark):
    full = dedup_lsh_eval(spark, ORACLE_SF_DIR).collect()[0]
    s1 = dedup_lsh_eval(spark, ORACLE_SF_DIR, sample_frac=0.5).collect()[0]
    s2 = dedup_lsh_eval(spark, ORACLE_SF_DIR, sample_frac=0.5).collect()[0]
    assert tuple(s1) == tuple(s2), "md5-threshold sample must be run-deterministic"
    # sub-corpus eval can only see fewer-or-equal candidates/truth pairs
    assert s1["n_candidates"] <= full["n_candidates"]
    assert s1["n_truth"] <= full["n_truth"]
    assert s1["n_hits"] <= s1["n_candidates"]
    # metrics stay well-formed probabilities
    for m in ("precision", "recall"):
        assert 0.0 <= s1[m] <= 1.0


def test_lsh_eval_default_equals_explicit_one(spark):
    a = dedup_lsh_eval(spark, ORACLE_SF_DIR).collect()[0]
    b = dedup_lsh_eval(spark, ORACLE_SF_DIR, sample_frac=1.0).collect()[0]
    assert tuple(a) == tuple(b)


def test_containment_sample_is_exact_restriction(spark):
    """Directional audit on a probe sample == full result restricted to the
    sampled doc_a set — the lossless-per-audited-doc contract."""
    from dataframework_spark.operators.dedup import _doc_sample_pred
    from dataframework_spark.catalog import load_table

    full = dedup_ngram_containment(spark, ORACLE_SF_DIR)
    sampled = dedup_ngram_containment(spark, ORACLE_SF_DIR, probe_sample_frac=0.5)
    kept = {
        r.doc_id
        for r in load_table(spark, ORACLE_SF_DIR, "documents", columns=["doc_id"])
        .where(_doc_sample_pred(0.5, "containment"))
        .collect()
    }
    expected = sorted(tuple(r) for r in full.collect() if r.doc_a in kept)
    assert _rows(sampled) == expected


def test_cms_audit_sampled_keys_bill_exact_counts(spark):
    """Per-key sampling keeps whole keys, so every audited key's
    true_count matches the exact pass and overestimate stays >= 0."""
    full = {r.item_key: r for r in agg_cms_audit(spark, ORACLE_SF_DIR).collect()}
    # full truth beyond top-K: rebuild the exact counts for cross-check
    sampled = agg_cms_audit(spark, ORACLE_SF_DIR, exact_sample_frac=0.5).collect()
    assert sampled, "sampled audit must still produce probe rows"
    for r in sampled:
        assert r.overestimate >= 0
        if r.item_key in full:
            assert r.true_count == full[r.item_key].true_count
            assert r.cms_est == full[r.item_key].cms_est
    again = agg_cms_audit(spark, ORACLE_SF_DIR, exact_sample_frac=0.5).collect()
    assert sorted(map(tuple, sampled)) == sorted(map(tuple, again))


def test_exact_substring_sample_is_exact_restriction(spark):
    """VERDICT r6 #3: doc-level sample with GLOBAL span frequencies —
    sampled output must EQUAL the full result restricted to the sampled
    doc set (lossless per audited doc, the containment-knob contract),
    and be run-deterministic."""
    from dataframework_spark.operators.dedup import _doc_sample_pred
    from dataframework_spark.catalog import load_table

    full = dedup_exact_substring(spark, ORACLE_SF_DIR)
    sampled = dedup_exact_substring(spark, ORACLE_SF_DIR, sample_frac=0.5)
    kept = {
        r.doc_id
        for r in load_table(spark, ORACLE_SF_DIR, "documents", columns=["doc_id"])
        .where(_doc_sample_pred(0.5, "exactsub"))
        .collect()
    }
    expected = sorted(tuple(r) for r in full.collect() if r.doc_id in kept)
    got = _rows(sampled)
    assert got == expected
    again = _rows(dedup_exact_substring(spark, ORACLE_SF_DIR, sample_frac=0.5))
    assert got == again, "md5-threshold sample must be run-deterministic"


def test_exact_substring_default_equals_explicit_one(spark):
    a = _rows(dedup_exact_substring(spark, ORACLE_SF_DIR))
    b = _rows(dedup_exact_substring(spark, ORACLE_SF_DIR, sample_frac=1.0))
    assert a == b
