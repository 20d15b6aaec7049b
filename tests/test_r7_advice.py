"""Guard tests for the four r6 ADVICE items closed in round 7.

1. corpus_filter_funnel now prices the IDENTICAL rules as
   text_filter_verdicts (30..400 token band, 4-dp-rounded ratios) — the
   reconciliation test here is the one the ADVICE asked for: stage-3
   survivors must equal COUNT(keep) from the verdict log.
2. ml_embedding_outliers derives the centroid from the fixed-pointed
   integers (half-up integer division), never a float AVG.
3. dedup_lsh_eval reports NULL precision/recall on an empty sample
   instead of relying on Spark's non-ANSI x/0.
4. window_bollinger_bands reads in dependency order (r2 defined before
   sdc references it) — covered by the oracle suite still passing; the
   smoke test here just pins that the function builds and emits rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import ORACLE_SF_DIR

from dataframework_spark.operators.corpus import corpus_filter_funnel
from dataframework_spark.operators.dedup import dedup_lsh_eval
from dataframework_spark.operators.ml_prep import ml_embedding_outliers
from dataframework_spark.operators.relational import window_bollinger_bands
from dataframework_spark.operators.text import text_filter_verdicts


def test_funnel_stage3_equals_verdict_keep_count(spark):
    """The ADVICE reconciliation: the funnel's cumulative stage-3
    (stopword_band) survivors are exactly the docs the per-doc verdict
    log marks keep=true — same length band, same rounded ratios."""
    funnel = {
        r.stage_name: r for r in corpus_filter_funnel(spark, ORACLE_SF_DIR).collect()
    }
    verdicts = text_filter_verdicts(spark, ORACLE_SF_DIR)
    keep_count = verdicts.where(F.col("keep")).count()
    assert funnel["stopword_band"].n_docs == keep_count
    # and the kept-token mass reconciles too (same rule, same docs)
    keep_tokens = (
        verdicts.where(F.col("keep")).agg(F.sum("n_tokens").alias("t")).collect()[0].t
    )
    assert funnel["stopword_band"].n_tokens == keep_tokens


def test_funnel_length_band_rejects_long_docs(spark):
    """A >400-token doc must not survive stage 1 (the r6 divergence)."""
    verdicts = text_filter_verdicts(spark, ORACLE_SF_DIR)
    n_le_400 = verdicts.where(F.col("n_tokens").between(30, 400)).count()
    funnel = {
        r.stage_name: r for r in corpus_filter_funnel(spark, ORACLE_SF_DIR).collect()
    }
    assert funnel["length_band"].n_docs == n_le_400


def test_embedding_outlier_centroid_is_integer_exact(spark):
    """The centroid half-up integer division must match a driver-side
    exact recomputation from the same fixed-pointed integers — no float
    aggregate in the loop."""
    from dataframework_spark.catalog import load_table

    e = load_table(spark, ORACLE_SF_DIR, "embeddings", columns=["vec_id", "embedding"])
    flat = e.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v")
    ).select("dim", F.round(F.col("v") * 1_000_000, 0).cast("bigint").alias("vi"))
    per_dim = {
        r.dim: (r.sv, r.nv)
        for r in flat.groupBy("dim")
        .agg(F.sum("vi").alias("sv"), F.count(F.lit(1)).alias("nv"))
        .collect()
    }

    def half_up(s: int, n: int) -> int:
        sign = -1 if s < 0 else 1
        return sign * ((2 * abs(s) + n) // (2 * n))

    expected = {d: half_up(s, n) for d, (s, n) in per_dim.items()}
    # rebuild the centroid exactly as the operator does
    cent = (
        flat.groupBy("dim")
        .agg(F.sum("vi").alias("sv"), F.count(F.lit(1)).alias("nv"))
        .select(
            "dim",
            (
                F.when(F.col("sv") < 0, F.lit(-1)).otherwise(F.lit(1))
                * F.expr("(2 * abs(sv) + nv) div (2 * nv)")
            )
            .cast("bigint")
            .alias("ci"),
        )
    )
    got = {r.dim: r.ci for r in cent.collect()}
    assert got == expected
    # and the operator still runs end-to-end with a sane flag rate
    rows = ml_embedding_outliers(spark, ORACLE_SF_DIR).collect()
    assert rows
    n_out = sum(1 for r in rows if r.is_outlier)
    assert 0 <= n_out < len(rows)


def test_lsh_eval_null_on_empty_sample(spark):
    """A sample too small to produce candidate or truth pairs must report
    NULL metrics (explicit guard), not raise and not rely on non-ANSI
    division; whenever counts are nonzero the ratios must be the exact
    rounded quotients."""
    row = dedup_lsh_eval(spark, ORACLE_SF_DIR, sample_frac=0.02).collect()[0]
    if row.n_candidates == 0:
        assert row.precision is None
    else:
        assert row.precision == round(row.n_hits / row.n_candidates, 4)
    if row.n_truth == 0:
        assert row.recall is None
    else:
        assert row.recall == round(row.n_hits / row.n_truth, 4)


def test_bollinger_builds_in_dependency_order(spark):
    # regression pin for the r6 ADVICE refactor (r2 inlined before sdc);
    # the oracle suite proves values — this pins that the plan resolves
    df = window_bollinger_bands(spark, ORACLE_SF_DIR)
    assert {"sma", "sd", "upper_band", "lower_band"} <= set(df.columns)
    assert df.limit(1).count() == 1
