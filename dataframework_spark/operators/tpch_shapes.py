"""Remaining TPC-H query shapes, adapted to the driver's synthetic schema.

The reference has no joins or subqueries at all (SURVEY.md §2.3 — verified
by full read of ``/root/reference/DFW/preprocess.py`` and ``tools.py``), so
TPC-H coverage is pure north-star surface.  ``relational.py`` carries
q1/q3/q4/q5/q6/q13/q14/q18/q19; this module adds every remaining shape —
all 22 TPC-H queries are covered.

The test data has no ``partsupp`` table and lacks
``l_shipmode``/``l_commitdate``/``l_receiptdate``/``c_phone``
(TESTDATA.md), so q2/q11/q12/q16/q20/q21 cannot run verbatim.  Each such
query implements the *query shape* (correlated min, global-fraction
threshold, two-category CASE counting, NOT IN exclusion + count-distinct,
nested semi-joins over derived aggregates, EXISTS + NOT EXISTS pair) on
the columns that exist, and the docstring names the adaptation.

Scale notes: every dim join is broadcast-hinted; fact-fact joins shuffle on
their key once; all correlated subqueries are written (or rewritten by
Catalyst) as aggregate-then-join, never per-row re-execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dataframework_spark.catalog import load_table
from dataframework_spark.registry import register


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             ROUND(AVG(l_extendedprice / l_quantity), 2) AS unit_cost
      FROM lineitem GROUP BY 1, 2)
    SELECT p.p_partkey, s.s_name, ps.unit_cost
    FROM ps
    JOIN part p     ON p.p_partkey = ps.partkey
    JOIN supplier s ON s.s_suppkey = ps.suppkey
    WHERE p.p_size <= 10
      AND ps.unit_cost = (SELECT MIN(ps2.unit_cost) FROM ps ps2
                          WHERE ps2.partkey = ps.partkey)
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier per part (TPC-H Q2 shape: correlated MIN
    subquery; adapted — no ``partsupp`` table, so per-(part, supplier)
    unit cost is derived from shipped lineitems).

    Executed decorrelated: one aggregate builds the cost table, a second
    tiny aggregate finds each part's minimum, and an equi-join keeps the
    argmin rows (ties kept, as in SQL).  Two shuffles on partkey total —
    the plan Catalyst would produce for the correlated form, made
    explicit."""
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
    )
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_size"])
    supp = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    # r12 opt (guide §2.4, the q20/q21 pattern): partition by partkey
    # once — the (part, supp) groupBy reuses it (subset-key clustering)
    # and the per-part minimum becomes a whole-partition window, removing
    # the re-agg and the ps⨝min_cost join exchange.
    ps = (
        li.repartition("l_partkey")
        .groupBy(
            F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
        )
        .agg(F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 2).alias("unit_cost"))
    )
    return (
        ps.withColumn("min_cost", F.min("unit_cost").over(Window.partitionBy("partkey")))
        .where(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(part.where(F.col("p_size") <= 10)), F.col("partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "s_name", "unit_cost")
    )


@register(
    "q7_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
           ROUND(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) / 100.0, 2) AS revenue
    FROM supplier
    JOIN lineitem  ON s_suppkey = l_suppkey
    JOIN orders    ON o_orderkey = l_orderkey
    JOIN customer  ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between a nation pair (TPC-H Q7 shape): the
    disjunction ranges over *both* sides of the join, so neither branch can
    be pushed to a single table — it must sit above the supplier-nation ×
    customer-nation join.  Both nation copies are broadcast; the ship-date
    range pushes to the lineitem scan."""
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_suppkey", "l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    supp = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            # unbounded rows per (nation-pair, year) group: integer cents
            # (r9 canary evidence on q1)
            F.round(
                F.sum(
                    F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5)
                )
                / 100.0,
                2,
            ).alias("revenue")
        )
    )


@register(
    "q8_market_share",
    oracle="""
    WITH all_volume AS (
      SELECT CAST(YEAR(o_orderdate) AS BIGINT)     AS o_year,
             CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
                                                   AS volume_c,
             n2.n_name                             AS supp_nation
      FROM part
      JOIN lineitem  ON p_partkey = l_partkey
      JOIN orders    ON o_orderkey = l_orderkey
      JOIN customer  ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN supplier  ON s_suppkey = l_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY')
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume_c ELSE 0 END)
                 / SUM(volume_c), 4) AS mkt_share
    FROM all_volume GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): one nation's fraction of
    regional order volume per year — a CASE-guarded numerator over the
    same aggregate pass as the denominator (never two scans).  Seven-table
    join; every dimension side is broadcast, so the only shuffles are the
    two fact-fact exchanges (lineitem⋈orders on orderkey, then the final
    per-year aggregate)."""
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_type"]).where(
        F.col("p_type") == "ECONOMY"
    )
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    cust = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    supp = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    # integer-cents volumes: both the numerator and denominator sum
    # unboundedly many rows per year, and the RATIO of two exact bigints
    # is a deterministic double on both engines (r9 canary evidence on q1)
    volume_c = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", volume_c).otherwise(
                        F.lit(0).cast("bigint")
                    )
                )
                / F.sum(volume_c),
                4,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
           ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(38, 12))), 2)::DOUBLE AS amount
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-line revenue by supplier nation and order year (TPC-H Q9
    shape; adapted — no ``partsupp.ps_supplycost`` in the test data, so
    "profit" is gross discounted revenue).  The LIKE filter lands on the
    broadcast part side and prunes the probe early; fact tables join on
    orderkey once.

    The revenue sum runs in DECIMAL(38,12): one group's double sum landed
    exactly on a half-cent (…5.435) where the engines' summation orders
    rounded apart — decimal accumulation is exact and order-independent,
    so both engines round the same value."""
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_name"]).where(
        F.col("p_name").like("%widget%")
    )
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"],
    )
    supp = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    nation = load_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"])
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(38,12)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("amount")
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           ROUND(c_acctbal, 2) AS acctbal,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): customers who returned
    the most revenue in one quarter, top 20.  Quarter filter pushes to the
    orders scan and the returnflag filter to lineitem *before* the join;
    the top-k runs as TakeOrderedAndProject with a key tiebreak."""
    cust = load_table(
        spark, sf_dir, "customer",
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"],
    )
    orders = load_table(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).where(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"])
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) / 100.0, 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY 1)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (TPC-H Q15 shape): max over an aggregated view, then
    an equality filter back against the view — the view is computed once
    and reused for both the max and the join (ties all kept).  The global
    max is a one-row broadcast, not a driver-side collect."""
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        # integer cents: total_revenue feeds an EQUALITY against the global
        # max, so cross-engine cent drift would change the selected rows,
        # not just a value (r9 canary evidence on q1)
        F.round(
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5)
            )
            / 100.0,
            2,
        ).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_qty_revenue",
    oracle="""
    SELECT ROUND(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                 / 100.0 / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): correlated AVG
    scalar subquery per part, decorrelated into a per-part aggregate +
    join.  Quantities are integral doubles, so per-part sums are exact and
    the 0.5·avg threshold is bit-identical across engines — no rounding
    needed before the comparison."""
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
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(thresholds, li.l_partkey == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            # single unbounded group: integer cents (r9 canary on q1)
            F.round(
                F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5))
                / 100.0
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


@register(
    "q22_idle_customers",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           ROUND(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0, 2)
                                    AS totacctbal
    FROM customer c
    WHERE c_nationkey BETWEEN 10 AND 24
      AND c_acctbal > (SELECT ROUND(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
                                    / 100.0 / COUNT(*), 2) FROM customer
                       WHERE c_acctbal > 0 AND c_nationkey BETWEEN 10 AND 24)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '1998-01-01')
    GROUP BY c_nationkey
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-sales-opportunity (TPC-H Q22 shape; adapted — no ``c_phone``
    in the test data, so the country-code prefix list becomes a nationkey
    band): above-average-balance customers in selected nations with no
    RECENT order (none since 1998 — the synthetic orders table covers
    every custkey, so the literal "never ordered" predicate is empty at
    every SF; the recency cutoff keeps the anti-join semantics exercised
    on real rows).  Three shapes in one query: selective pushdown,
    uncorrelated scalar threshold (rounded on both sides, broadcast as a
    one-row join), and NOT EXISTS as a left-anti join with a pushed
    residual date filter."""
    cust = load_table(
        spark, sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    ).where(F.col("c_nationkey").between(10, 24))
    orders = load_table(spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate"]).where(
        F.col("o_orderdate") >= "1998-01-01"
    )
    # integer cents throughout: the AVG threshold feeds a FILTER, so
    # cross-engine drift there changes the row SET, not just a value.
    # NOTE (r10 ADVICE): FLOOR(x*100 + 0.5) is half-UP (toward +inf),
    # not ROUND's half-away-from-zero, so the two forms differ exactly
    # on NEGATIVE exact half-cents — acctbal is the one signed money
    # column, so q1's non-negative-domain equivalence claim does NOT
    # cover it; the equivalence here is data-dependent and pinned
    # per-row at every local SF including sf0.1 by
    # test_floor_cents_equals_round_cents_on_real_money_rows
    bal_c = F.floor(F.col("c_acctbal") * 100 + 0.5)
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.round(F.sum(bal_c) / 100.0 / F.count(F.lit(1)), 2).alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(bal_c) / 100.0, 2).alias("totacctbal"),
        )
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH val AS (
      SELECT l_partkey AS partkey,
             SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS value_c
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      GROUP BY 1)
    SELECT partkey, ROUND(value_c / 100.0, 2) AS value FROM val
    WHERE 500 * value_c > (SELECT SUM(value_c) FROM val)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock identification (TPC-H Q11 shape; adapted — no
    ``partsupp``, so per-part "stock value" is shipped revenue from the
    selected nations' suppliers).  The shape under test: a grouped
    aggregate filtered by an UNCORRELATED scalar fraction of its own
    global total.

    Plan: one shuffle builds ``val``; the global threshold is a one-row
    aggregate of the (already partkey-sized) result, broadcast back as a
    cross join — the fact table is scanned once, never twice."""
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    supp = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nat = load_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"]).where(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    val = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        # integer-cents values so the value > 0.2%-of-total comparison is
        # EXACT integer arithmetic (value_c·500 > Σvalue_c) — a float
        # global sum here could flip set membership across engines (r9
        # canary evidence on q1)
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5)
            ).alias("value_c")
        )
        # partkey-sized; cached so the threshold branch does not re-scan the
        # fact table (both consumers read the materialized aggregate)
        .cache()
    )
    threshold = val.agg(F.sum("value_c").alias("total_c"))
    return (
        val.join(F.broadcast(threshold), F.col("value_c") * 500 > F.col("total_c"))
        .select("partkey", F.round(F.col("value_c") / 100.0, 2).alias("value"))
    )


@register(
    "q12_priority_shipping",
    oracle="""
    SELECT CAST(YEAR(l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
    GROUP BY 1
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority audit (TPC-H Q12 shape; adapted — no
    ``l_shipmode``/``l_commitdate``/``l_receiptdate``, so "late" =
    shipped ≥60 days after order date and the shipmode grouping becomes
    ship year).  The shape: fact-fact equi-join with a residual
    inter-column theta predicate, then the classic two-sided CASE
    counting aggregate — one shuffle for the join keyed on orderkey, one
    map-side-combinable count."""
    li = load_table(
        spark, sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"]
    )
    orders = load_table(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.year("l_shipdate").cast("bigint").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q16_supplier_diversity",
    oracle="""
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_size IN (1, 5, 10, 15, 20, 25)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2
    """,
)
def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship count (TPC-H Q16 shape; adapted — no
    ``partsupp``, supplier "complaints" become negative account balance).
    The shape: NOT IN exclusion subquery (a broadcast left-anti join over
    the tiny bad-supplier set — supplier keys are never NULL here, so
    NOT IN ≡ anti join), a selective IN-list pushed to the part scan, and
    COUNT(DISTINCT) over the surviving pairs."""
    li = load_table(spark, sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    part = load_table(
        spark, sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"]
    ).where(F.col("p_size").isin(1, 5, 10, 15, 20, 25))
    bad = load_table(
        spark, sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"]
    ).where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_excess_share_suppliers",
    oracle="""
    WITH per AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
      FROM lineitem GROUP BY 1, 2),
    tot AS (SELECT l_partkey, SUM(qty) AS total FROM per GROUP BY 1)
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey IN (
      SELECT per.l_suppkey FROM per JOIN tot ON per.l_partkey = tot.l_partkey
      WHERE per.qty > 0.5 * tot.total)
    """,
)
def q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant-share suppliers (TPC-H Q20 shape; adapted — no
    ``partsupp``/``availqty``, so "excess stock" becomes: supplier shipped
    more than half of some part's total shipped quantity).  The shape:
    nested IN semi-joins over a derived per-(part,supplier) aggregate.

    Plan: ``per`` is one partkey+suppkey shuffle; ``tot`` re-aggregates
    the already-small ``per`` (no second fact scan); the qualifying
    supplier set is distinct-projected and semi-joined into supplier."""
    li = load_table(
        spark, sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_quantity"]
    )
    supp = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    # r12 opt (guide §2.4: establish the partitioning once).  The old shape
    # paid three exchanges + a cache: per-(part,supp) agg, per-part
    # re-agg, and the per⨝tot join re-exchange.  Partitioning lineitem by
    # l_partkey FIRST lets the (part,supp) groupBy, the per-part total,
    # and the dominance test all run on that one exchange: hash(l_partkey)
    # co-locates every (part, supp) group AND every part, so the groupBy
    # needs no further exchange and ``tot`` becomes a whole-partition
    # window over the same data — no join, no cache, no second pass.
    per = (
        li.repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    wt = Window.partitionBy("l_partkey")
    dominant = (
        per.withColumn("total", F.sum("qty").over(wt))
        .where(F.col("qty") > 0.5 * F.col("total"))
        .select("l_suppkey")
    )
    return supp.join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS last_ship
      FROM lineitem GROUP BY 1, 2)
    SELECT s_name, COUNT(*) AS numwait
    FROM li l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN orders   ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
    WHERE EXISTS (SELECT 1 FROM li l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM li l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.last_ship > l1.last_ship)
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape; adapted — no
    receipt/commit dates, so "kept waiting" = last to ship in a
    multi-supplier finalized order).  The canonical EXISTS + NOT EXISTS
    pair, decorrelated by hand into ONE window-free aggregate join: per
    order, count suppliers and take the max last-ship — a supplier
    qualifies iff the order has ≥2 suppliers and its last_ship equals the
    order max (NOT EXISTS excludes only strictly-later shippers, so
    suppliers tied at the max all qualify, exactly like the correlated
    SQL).
    """
    li = load_table(
        spark, sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    )
    supp = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    orders = load_table(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"]
    ).where(F.col("o_orderstatus") == "F")
    # r12 opt (guide §2.4: establish the partitioning once).  The old shape
    # paid three exchanges + a cache: per-(order,supp) agg, per-order
    # re-agg, and the per⨝order_stats join re-exchange.  Partitioning
    # lineitem by l_orderkey FIRST co-locates every (order, supp) group
    # AND every order, so the groupBy reuses that one exchange and the
    # order stats become whole-partition window aggregates over the same
    # data — no join, no cache, no second pass.
    per = (
        li.repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("last_ship"))
    )
    wo = Window.partitionBy("l_orderkey")
    return (
        per.withColumn("n_supp", F.count(F.lit(1)).over(wo))
        .withColumn("max_ship", F.max("last_ship").over(wo))
        .where((F.col("n_supp") >= 2) & (F.col("last_ship") == F.col("max_ship")))
        .join(orders, F.col("l_orderkey") == orders.o_orderkey, "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
