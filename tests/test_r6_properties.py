"""Property and plan pins for the r6 operator waves.

The oracle suite already proves cross-engine value equality; these tests
pin the INVARIANTS each operator's semantics promise (so a future edit
that keeps both engines wrong-in-the-same-way still fails) and the plan
shapes the docstrings claim.
"""

from __future__ import annotations

from conftest import ORACLE_SF_DIR

from dataframework_spark.operators.corpus import corpus_filter_funnel
from dataframework_spark.operators.dedup import (
    dedup_contamination_severity,
    dedup_semdedup,
    dedup_embedding_cosine,
)
from dataframework_spark.operators.ml_prep import ml_embedding_outliers
from dataframework_spark.operators.relational import (
    profile_schema_drift,
    window_bollinger_bands,
)
from dataframework_spark.operators.temporal import events_seasonal_decompose


def test_funnel_is_monotone_and_anchored(spark):
    rows = {r.stage: r for r in corpus_filter_funnel(spark, ORACLE_SF_DIR).collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4]
    assert rows[0].pct_docs == 1.0
    for k in range(1, 5):  # cumulative stages can only shrink the corpus
        assert rows[k].n_docs <= rows[k - 1].n_docs
        assert rows[k].n_tokens <= rows[k - 1].n_tokens
    assert rows[0].stage_name == "ingest" and rows[4].stage_name == "exact_dedup"


def test_bollinger_bands_bracket_the_sma(spark):
    rows = window_bollinger_bands(spark, ORACLE_SF_DIR).collect()
    assert rows, "full 20-day frames must exist"
    for r in rows:
        assert r.lower_band <= r.sma <= r.upper_band
        assert r.sd >= 0
        # flags must agree with the printed band values (same exact ints)
        if r.above_upper:
            assert r.revenue >= r.upper_band - 0.01
        if r.below_lower:
            assert r.revenue <= r.lower_band + 0.01


def test_seasonal_decompose_reconstructs_volume(spark):
    rows = events_seasonal_decompose(spark, ORACLE_SF_DIR).collect()
    assert rows
    for r in rows:
        # volume = trend + seasonal + residual up to the 4-dp print rounding
        assert abs(r.volume - (r.trend + r.seasonal + r.residual)) < 5e-4 * 3
    # dow effects sum ~0 over a balanced panel is NOT guaranteed (unequal
    # dow counts); the identity above is the decomposition's real contract


def test_schema_drift_panel_shape_and_verdicts(spark):
    rows = {r.metric: r for r in profile_schema_drift(spark, ORACLE_SF_DIR).collect()}
    assert set(rows) == {
        "row_count",
        "mean_totalprice",
        "pct_status_F",
        "distinct_priorities",
    }
    for r in rows.values():
        expected = abs(r.rel_delta) > 0.05
        assert r.drifted == expected
    # the synthetic series ingests more volume late; value stats stationary
    assert rows["row_count"].drifted
    assert not rows["mean_totalprice"].drifted


def test_embedding_outliers_threshold_is_exact(spark):
    rows = ml_embedding_outliers(spark, ORACLE_SF_DIR).collect()
    n = len(rows)
    assert n > 0
    mean_sq = sum(r.dist**2 for r in rows) / n
    for r in rows:
        # flags must agree with the scale-free threshold reconstructed from
        # the printed distances (4-dp rounding gives plenty of margin at
        # the 2.25x separation unless a dist sits ON the threshold)
        if r.dist**2 > 2.25 * mean_sq * 1.001:
            assert r.is_outlier
        if r.dist**2 < 2.25 * mean_sq * 0.999:
            assert not r.is_outlier


def test_semdedup_prunes_subset_of_global_pairs(spark):
    """Cluster-then-prune can only prune vectors the GLOBAL all-pairs
    baseline also sees as near-dups (clusters partition the pair space),
    and every pruned vector must have a smaller-id near-dup partner."""
    verdicts = dedup_semdedup(spark, ORACLE_SF_DIR).collect()
    pruned = {r.vec_id for r in verdicts if not r.is_kept}
    global_pairs = dedup_embedding_cosine(spark, ORACLE_SF_DIR).collect()
    # dedup_embedding_cosine emits vec_a < vec_b at the same 0.4 threshold
    has_smaller_partner = {r.vec_b for r in global_pairs}
    assert pruned <= has_smaller_partner
    # keep-first: the smallest vec_id of any bucket is always kept
    by_bucket: dict[int, int] = {}
    for r in verdicts:
        by_bucket[r.bucket] = min(by_bucket.get(r.bucket, r.vec_id), r.vec_id)
    kept = {r.vec_id for r in verdicts if r.is_kept}
    assert set(by_bucket.values()) <= kept


def test_contamination_severity_tiers_nest(spark):
    """A shared 32-gram implies shared 16- and 8-grams (substrings), so
    severity is the MAX tier and every eval doc appears exactly once."""
    rows = dedup_contamination_severity(spark, ORACLE_SF_DIR).collect()
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))
    assert all(r.doc_id % 2 == 1 for r in rows)
    assert {r.severity for r in rows} <= {0, 8, 16, 32}
    # a doc shorter than a tier cannot carry it
    for r in rows:
        if r.severity:
            assert r.n_tokens >= r.severity
