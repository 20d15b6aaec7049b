"""r10 cents-recipe properties (VERDICT r9 "Next round" #1).

The integer-cents money sums migrated from ``ROUND(x*100, 0)::BIGINT``
(Spark's per-row BigDecimal Round — the measured ~1.5-2x constant
factor on scan-dominated aggregates, CENTSAB_r10.json) to
``FLOOR(x*100 + 0.5)::BIGINT``.  These tests pin:

1. value equivalence of the two fix-point forms on the REAL data (the
   migration changed cost, not cents) — per-row, strictest possible;
2. the static recipe: the round-cents pattern must not reappear in the
   money-sum modules (the floor form is the shipped recipe);
3. exactness survives: the floor form is partitioning-invariant by
   construction (bigint sums), spot-checked 1-vs-32 partitions here at
   sf0.01 (the 10x canary in test_r9_advice.py covers the replica
   case).
"""

from __future__ import annotations

import re
from pathlib import Path

from pyspark.sql import functions as F

from dataframework_spark.catalog import load_table

SF_DIR = "/root/testdata/sf0.01"
REPO = Path(__file__).resolve().parent.parent

MONEY_MODULES = [
    "dataframework_spark/operators/relational.py",
    "dataframework_spark/operators/tpch_shapes.py",
    "dataframework_spark/sources/io.py",
]


def test_floor_cents_equals_round_cents_on_real_money_rows(spark):
    """Per-row equality of FLOOR(x*100+0.5) and ROUND(x*100,0)::bigint
    over every money expression the migrated tier aggregates — on the
    actual lineitem/orders/customer values, including the derived
    products (disc price, charge, revenue) where ties could in
    principle live."""
    li = load_table(spark, SF_DIR, "lineitem")
    ep = F.col("l_extendedprice")
    exprs = {
        "ep": ep,
        "disc_price": ep * (1 - F.col("l_discount")),
        "charge": ep * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
        "revenue": ep * F.col("l_discount"),
        "discount": F.col("l_discount"),
    }
    checks = [
        F.sum(
            (F.floor(e * 100 + 0.5) != F.round(e * 100, 0).cast("bigint")).cast("int")
        ).alias(k)
        for k, e in exprs.items()
    ]
    row = li.agg(*checks).collect()[0]
    assert all(v == 0 for v in row), row.asDict()

    for tbl, col in (("orders", "o_totalprice"), ("customer", "c_acctbal")):
        t = load_table(spark, SF_DIR, tbl)
        n = t.agg(
            F.sum(
                (
                    F.floor(F.col(col) * 100 + 0.5)
                    != F.round(F.col(col) * 100, 0).cast("bigint")
                ).cast("int")
            ).alias("n")
        ).collect()[0][0]
        assert n == 0, (tbl, col, n)


def test_round_cents_pattern_is_retired():
    """The BigDecimal-per-row form must not come back in the money
    modules (oracle or Spark side)."""
    py_pat = re.compile(r"F\.round\([^\n]*\* 100, 0\)\s*\.cast\(\"bigint\"\)")
    sql_pat = re.compile(r"ROUND\([^\n]*\* 100, 0\)\s*AS BIGINT")
    for rel in MONEY_MODULES:
        text = (REPO / rel).read_text()
        assert not py_pat.search(text), f"round-cents Spark form back in {rel}"
        assert not sql_pat.search(text), f"round-cents oracle form back in {rel}"


def test_floor_cents_sum_partitioning_invariant(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    charge = (
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
    )

    def total(df):
        return df.agg(F.sum(F.floor(charge * 100 + 0.5)).alias("s")).collect()[0][0]

    assert total(li.coalesce(1)) == total(li.repartition(32))
