"""r13 optimization-round pins: wired scale hatches + restructured shapes.

VERDICT r12 #5 asked for the locally-reverted caches to become selectable
knobs (duplicate passes are free on an idle local box but real resources
at 100 TB): each knob must (a) default to the locally-measured winner,
(b) change the plan's duplicate-pass count when flipped, and (c) never
change the result.
"""

from __future__ import annotations

import pytest

from dataframework_spark.plans.explain import plan_string
from tests.conftest import ORACLE_SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "fn_name,module,knob",
    [
        ("corpus_mixture_sample_bpe", "corpus", "cache_doc_totals"),
        ("ml_auc_rank", "ml_prep", "cache_scores"),
        ("text_backoff_lm_score", "text", "cache_unigrams"),
    ],
)
def test_cache_hatch_knobs(spark, fn_name, module, knob):
    import importlib

    mod = importlib.import_module(f"dataframework_spark.operators.{module}")
    fn = getattr(mod, fn_name)
    # plan + rows of the DEFAULT mode first, then drop the cache registry —
    # CacheManager substitutes any registered cached subtree into later
    # plans, which would erase the off/on plan difference
    off = fn(spark, ORACLE_SF_DIR)
    p_off = plan_string(off)
    rows_off = _rows(off)
    spark.catalog.clearCache()
    on = fn(spark, ORACLE_SF_DIR, **{knob: True})
    p_on = plan_string(on)
    rows_on = _rows(on)
    # the knob adds a materialization point the default plan does not have
    assert p_on.count("InMemoryRelation") > p_off.count("InMemoryRelation"), (
        fn_name,
        knob,
    )
    # and the result is identical under both modes
    assert rows_off == rows_on, f"{fn_name}({knob}=True) changed the result"


def test_exact_substring_broadcast_hatch(spark):
    """broadcast_dups=False falls back to a shuffled dup join (no broadcast
    build of the >=2x hash set) with identical output."""
    from dataframework_spark.operators.dedup import dedup_exact_substring

    on = dedup_exact_substring(spark, ORACLE_SF_DIR)
    off = dedup_exact_substring(spark, ORACLE_SF_DIR, broadcast_dups=False)
    assert _rows(on) == _rows(off)


def test_rfm_boundary_buckets_match_global_ntile(spark):
    """The boundary-broadcast quartiles must equal the chained
    with_global_ntile assignment on every metric (same closed-form
    positions, total order => tuple comparison == rank comparison)."""
    from pyspark.sql import functions as F

    from dataframework_spark.catalog import load_table
    from dataframework_spark.functions.ranking import with_global_ntile
    from dataframework_spark.operators.relational import window_rfm_segments

    new = window_rfm_segments(spark, ORACLE_SF_DIR)

    orders = load_table(
        spark, ORACLE_SF_DIR, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )
    cust = load_table(spark, ORACLE_SF_DIR, "customer", columns=["c_custkey"])
    per_cust = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey")
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("_spend"),
        )
    )
    r = with_global_ntile(
        per_cust, 4, [F.col("_last").desc(), F.col("c_custkey")], "r_quartile"
    )
    r = with_global_ntile(
        r, 4, [F.col("n_orders").desc(), F.col("c_custkey")], "f_quartile"
    )
    r = with_global_ntile(
        r, 4, [F.col("_spend").desc(), F.col("c_custkey")], "m_quartile"
    )
    old = r.select(
        "c_custkey",
        "r_quartile",
        "f_quartile",
        "m_quartile",
        "n_orders",
        F.round("_spend", 2).alias("total_spend"),
    )
    assert _rows(new) == _rows(old)
