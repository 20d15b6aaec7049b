"""Guard tests for the five r7 ADVICE items closed in round 8.

1. text_chi2_keywords excludes the single-source degenerate corpus
   (ns == n makes margin b+d = 0 for every cell → engine-divergent
   0/0) deterministically on both engines, mirroring the df < n guard.
2. corpus_epoch_plan excludes zero/NULL-token sources BEFORE the
   normalizer, so epochs/over_exposed can never be a non-ANSI x/0 NULL.
3. sink_xml_roundtrip now stamps every written name with ALL five
   XML-escapable characters, so entity escaping is exercised on every
   row INSIDE the graded query (the oracle computes the same decorated
   length from the original parquet).
4. test_bm25_score_matches_reference_formula's driver recompute now
   emulates Spark F.round HALF_UP (math.floor(c*1e6 + 0.5)), not
   Python's banker's round — asserted here on a .5-micro boundary.
5. _bm25_scored no longer pins F.broadcast on the vocabulary-sized df
   table (Catalyst/AQE chooses) — pinned by a plan-text assertion that
   no broadcast HINT survives on that join input (AQE may still CHOOSE
   broadcast; the point is the operator stopped demanding it).

Plus the r7 VERDICT's sink-family fixed-point migration: the
incremental-agg persisted state stores integer cents, and the
cents-sum is partitioning-invariant by construction.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from conftest import ORACLE_SF_DIR

from dataframework_spark.operators.corpus import corpus_epoch_plan
from dataframework_spark.operators.text import text_chi2_keywords
from dataframework_spark.sources.io import _XML_SPECIALS, sink_incremental_agg, _scratch


def _write_documents(spark, tmp_path, rows):
    """Materialize a minimal documents table under a temp sf_dir."""
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_chi2_single_source_corpus_is_empty_not_null_ranked(spark, tmp_path):
    """One source holding EVERY document: margin b+d = 0 for every
    (term, source) cell.  Pre-fix, chi2 went NULL via non-ANSI x/0 and
    NULL ordering decided the top-k; post-fix the degenerate corpus is
    excluded deterministically → zero rows."""
    rows = [
        # 25 docs share 'apple' (df=25 >= _CHI2_DF_MIN, df < n) so the
        # cell would survive every OTHER filter; 5 docs break df == n
        (i, "apple banana" if i < 25 else "cherry", "en", "only_source", 12)
        for i in range(30)
    ]
    sf = _write_documents(spark, tmp_path, rows)
    out = text_chi2_keywords(spark, sf)
    assert out.count() == 0


def test_chi2_real_corpus_has_no_null_scores(spark):
    """The new ns < n guard must not disturb the real multi-source
    corpus: non-empty output, every chi2 defined."""
    out = text_chi2_keywords(spark, ORACLE_SF_DIR)
    rows = out.collect()
    assert rows
    assert all(r.chi2 is not None for r in rows)


def test_epoch_plan_null_token_source_excluded(spark, tmp_path):
    """A source whose docs all have NULL text aggregates to NULL
    n_tokens; pre-fix epochs = planned/NULL propagated NULL into
    over_exposed.  Post-fix the source is excluded BEFORE the
    normalizer and every surviving row has a concrete verdict."""
    rows = [(i, "alpha beta gamma", "en", "good", 16) for i in range(10)] + [
        (100 + i, None, "en", "ghost", 0) for i in range(3)
    ]
    sf = _write_documents(spark, tmp_path, rows)
    out = corpus_epoch_plan(spark, sf).collect()
    assert {r.source for r in out} == {"good"}
    for r in out:
        assert r.epochs is not None
        assert r.over_exposed is not None
    # single surviving source ⇒ its normalized weight is exactly 1
    assert out[0].weight == 1.0


def test_epoch_plan_real_corpus_verdicts_all_defined(spark):
    out = corpus_epoch_plan(spark, ORACLE_SF_DIR).collect()
    assert out
    assert all(r.over_exposed is not None for r in out)


def test_xml_specials_cover_every_escapable_character(spark):
    """The stamped suffix must contain all five XML-escapable chars so
    the graded roundtrip exercises escaping on every row."""
    assert {"&", "<", ">", '"', "'"} <= set(_XML_SPECIALS)


def test_bm25_recompute_rounding_is_half_up():
    """Python round() is banker's (2.5 -> 2); Spark F.round is HALF_UP
    (2.5 -> 3).  The r7 property test's driver recompute now uses the
    half-up form — pin the exact boundary where they differ."""
    c = 2.5e-6  # contribution landing exactly on a .5-micro boundary
    assert round(c * 1_000_000) == 2  # banker's would under-count
    assert math.floor(c * 1_000_000 + 0.5) == 3  # the operator's HALF_UP


def test_bm25_df_join_has_no_broadcast_hint(spark):
    """The vocabulary-sized df table must not carry a user broadcast
    HINT (a 100 TB vocabulary exceeds driver limits); Catalyst/AQE
    stays free to choose.  The query-term table keeps its hint — it is
    query-sized at any corpus scale."""
    from dataframework_spark.operators.text import _bm25_scored

    plan = _bm25_scored(spark, ORACLE_SF_DIR)._jdf.queryExecution().logical().toString()
    hint_lines = [ln for ln in plan.splitlines() if "UnresolvedHint broadcast" in ln or "ResolvedHint" in ln]
    # exactly the qterm + stats hints survive; none may feed the df agg
    assert all("count(1) AS df" not in ln for ln in hint_lines)


def test_incremental_agg_state_parquet_is_integer_cents(spark):
    """The persisted MV state must carry the sum as BIGINT cents — the
    merge algebra is then exact by construction (r7 VERDICT residual
    note 1: the sink family was the last float-sum-before-compare)."""
    sink_incremental_agg(spark, ORACLE_SF_DIR).collect()
    state = spark.read.parquet(_scratch(ORACLE_SF_DIR, "orders_agg_state"))
    assert dict(state.dtypes)["s"] == "bigint"


def test_cents_sum_is_partitioning_invariant(spark):
    """The fixed-point discipline's whole point: integer-cents sums are
    identical under any partitioning, so Spark partial-aggregate order
    can never flip a verification hash."""
    from dataframework_spark.catalog import load_table

    orders = load_table(spark, ORACLE_SF_DIR, "orders", columns=["o_totalprice"])
    cents = F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
    one = orders.coalesce(1).agg(cents.alias("s")).collect()[0].s
    many = orders.repartition(32).agg(cents.alias("s")).collect()[0].s
    assert one == many
