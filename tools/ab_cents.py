"""Idle-box A/B of the integer-cents money-sum formulations (VERDICT r9
"Next round" #1).

The r9 canary flip forced every unbounded-group TPC-H money sum from
``ROUND(SUM(double), 2)`` to per-row integer cents, and the judge
measured a real ~1.5x constant factor on the scan-dominated tier (q1
2.21x).  The suspected cost center: Spark's ``Round`` on DoubleType
allocates a ``java.math.BigDecimal`` PER ROW (BigDecimal.valueOf +
setScale), so four round-mul-cast pipelines per row dominate a
scan-bound aggregate.

Formulations timed here, per query, median of ``--reps`` (default 5)
through the noop sink on the bench session config:

  float      r8's ROUND(SUM(double), 2)      (inexact: canary-flipping)
  round      shipped r9 ROUND(x*100,0)::bigint per row (BigDecimal/row)
  floor      FLOOR(x*100 + 0.5)::bigint per row (pure FP + one cast;
             == half-up for positive x up to FP-boundary ties, and both
             engines evaluate the identical IEEE expression)
  decimal    SUM(CAST(x AS DECIMAL(12,2))) (exact; sum precision 22 >
             18 forces Spark's non-compact Decimal accumulator)

Emits one JSON line; artifact: CENTSAB_r10.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from dataframework_spark.catalog import load_table  # noqa: E402
from dataframework_spark.session import get_spark  # noqa: E402


def _money(kind: str, col: F.Column) -> F.Column:
    """SUM-ready per-row money expression for one formulation."""
    if kind == "float":
        return col
    if kind == "round":
        return F.round(col * 100, 0).cast("bigint")
    if kind == "floor":
        return F.floor(col * 100 + 0.5)
    if kind == "decimal":
        return col.cast("decimal(12,2)")
    raise ValueError(kind)


def _sum_money(kind: str, col: F.Column) -> F.Column:
    s = F.sum(_money(kind, col))
    if kind == "float":
        return F.round(s, 2)
    if kind == "decimal":
        return F.round(s.cast("double"), 2)
    return F.round(s / 100.0, 2)


def q1(spark: SparkSession, sf_dir: str, kind: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ep = F.col("l_extendedprice")
    disc_price = ep * (1 - F.col("l_discount"))
    n = F.count(F.lit(1))

    def div_n(c: F.Column, scale: int) -> F.Column:
        s = F.sum(_money(kind, c))
        if kind == "float":
            return F.round(s / n, scale)
        if kind == "decimal":
            return F.round(s.cast("double") / n, scale)
        return F.round(s / 100.0 / n, scale)

    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            _sum_money(kind, ep).alias("sum_base_price"),
            _sum_money(kind, disc_price).alias("sum_disc_price"),
            _sum_money(kind, disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            div_n(ep, 2).alias("avg_price"),
            div_n(F.col("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q6(spark: SparkSession, sf_dir: str, kind: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.02, 0.06))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _sum_money(kind, F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            )
        )
    )


def join_inner_agg(spark: SparkSession, sf_dir: str, kind: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _sum_money(kind, F.col("o_totalprice")).alias("total_spend"),
        )
    )


def q17(spark: SparkSession, sf_dir: str, kind: str) -> DataFrame:
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_brand"]).where(
        F.col("p_brand") == "Brand#3"
    )
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("qty_threshold")
    )
    s = F.sum(_money(kind, F.col("l_extendedprice")))
    if kind == "float":
        rev = F.round(s / 7.0, 2)
    elif kind == "decimal":
        rev = F.round(s.cast("double") / 7.0, 2)
    else:
        rev = F.round(s / 100.0 / 7.0, 2)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(thresholds, li.l_partkey == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(rev.alias("avg_yearly"))
    )


QUERIES = {"q1": q1, "q6": q6, "join_inner_agg": join_inner_agg, "q17": q17}
KINDS = ["float", "round", "floor", "decimal"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("AB_REPS", "5"))
    spark = get_spark(app_name="dfx-ab-cents", cpus=os.cpu_count())
    spark.range(1000).selectExpr("sum(id)").collect()
    q6(spark, sf_dir, "float").write.format("noop").mode("overwrite").save()

    times: dict[str, dict[str, list[float]]] = {
        q: {k: [] for k in KINDS} for q in QUERIES
    }
    for rep in range(reps):
        for qname, fn in QUERIES.items():
            for kind in KINDS:
                t0 = time.perf_counter()
                fn(spark, sf_dir, kind).write.format("noop").mode("overwrite").save()
                times[qname][kind].append(round(time.perf_counter() - t0, 4))
        spark.catalog.clearCache()

    out = {
        "metric": "cents_ab_median",
        "unit": "sec",
        "sf_dir": sf_dir,
        "reps": reps,
        "medians": {
            q: {k: round(statistics.median(v), 4) for k, v in kinds.items()}
            for q, kinds in times.items()
        },
        "spread": {
            q: {k: [min(v), max(v)] for k, v in kinds.items()}
            for q, kinds in times.items()
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
