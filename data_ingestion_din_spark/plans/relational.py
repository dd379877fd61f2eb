"""Relational core: scans, joins, aggregations, windows, top-k, set ops.

The reference has no general relational engine — its aggregations are
pandas folds over one extracted table at a time (``compute_from_table``,
ingestion/table_extractor.py:824-848) and its "joins" are keyed merges
(SURVEY.md §2.4-2.5). Spark SQL provides the general surface; these plans
declare it over the fixture star schema so the whole family (hash/broadcast
joins, partial aggregation, window frames, anti/semi joins, rollup) is
exercised and oracle-checked.

Determinism: decimal-exact aggregation with the plans/_exact.py conversion
recipe, complete ordering keys, BIGINT counts (see plans/registry.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from data_ingestion_din_spark.plans._exact import dec_to_double, dec_to_double_sql
from data_ingestion_din_spark.plans.registry import query
from data_ingestion_din_spark.sources.tables import load_table


def _dec2(c):  # money/quantity columns (2 true decimals in fixtures)
    return F.col(c).cast("decimal(12,2)")


def _fac(expr):  # (1 ± x) factors — also 2-decimal in fixtures
    return expr.cast("decimal(8,2)")


_D2 = "CAST(l_extendedprice AS DECIMAL(12,2))"
_DISC = "CAST(1 - l_discount AS DECIMAL(8,2))"
_TAX = "CAST(1 + l_tax AS DECIMAL(8,2))"
# product scales: price(s2) × fac(s2) → s4; × fac(s2) → s6
_REV_SQL = dec_to_double_sql(f"sum({_D2} * {_DISC})", 4)


# --------------------------------------------------------------------------
# q1_pricing_summary — TPC-H Q1 shape: the canonical wide aggregate.
# Exercises: parquet scan w/ predicate pushdown, map-side partial agg,
# 2-key groupBy, decimal-exact sums (SURVEY.md §2.5 A2 generalized).
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {dec_to_double_sql("sum(CAST(l_quantity AS DECIMAL(12,2)))", 2)} AS sum_qty,
      {dec_to_double_sql(f"sum({_D2})", 2)} AS sum_base_price,
      {dec_to_double_sql(f"sum({_D2} * {_DISC})", 4)} AS sum_disc_price,
      {dec_to_double_sql(f"sum(({_D2} * {_DISC}) * {_TAX})", 6)} AS sum_charge,
      {dec_to_double_sql("sum(CAST(l_quantity AS DECIMAL(12,2)))", 2)}
        / CAST(count(*) AS BIGINT) AS avg_qty,
      {dec_to_double_sql(f"sum({_D2})", 2)}
        / CAST(count(*) AS BIGINT) AS avg_price,
      CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec2("l_extendedprice") * _fac(F.lit(1) - F.col("l_discount"))
    charge = disc_price * _fac(F.lit(1) + F.col("l_tax"))
    agg = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec2("l_quantity")).alias("_sq"),
            F.sum(_dec2("l_extendedprice")).alias("_sp"),
            F.sum(disc_price).alias("_sd"),
            F.sum(charge).alias("_sc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        dec_to_double(F.col("_sq"), 2).alias("sum_qty"),
        dec_to_double(F.col("_sp"), 2).alias("sum_base_price"),
        dec_to_double(F.col("_sd"), 4).alias("sum_disc_price"),
        dec_to_double(F.col("_sc"), 6).alias("sum_charge"),
        (dec_to_double(F.col("_sq"), 2) / F.col("count_order")).alias("avg_qty"),
        (dec_to_double(F.col("_sp"), 2) / F.col("count_order")).alias("avg_price"),
        F.col("count_order"),
    ).orderBy("l_returnflag", "l_linestatus")


# --------------------------------------------------------------------------
# q3_shipping_priority — TPC-H Q3 shape: selective 3-way join + top-k.
# customer is small → broadcast; revenue is decimal-exact so the top-10
# cut is identical across engines (full ordering key incl. o_orderkey).
# --------------------------------------------------------------------------
@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT
      l_orderkey,
      {_REV_SQL} AS revenue,
      o_orderdate,
      o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    revenue = _dec2("l_extendedprice") * _fac(F.lit(1) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec_to_double(F.sum(revenue), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# q5_region_revenue — TPC-H Q5 shape: star join through two dims.
# region/nation/supplier are tiny → broadcast chain; one shuffle for the
# final groupBy. At 100 TB the only large shuffle is lineitem⋈orders.
# --------------------------------------------------------------------------
@query(
    "q5_region_revenue",
    oracle=f"""
    SELECT
      n_name,
      {_REV_SQL} AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = _dec2("l_extendedprice") * _fac(F.lit(1) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dec_to_double(F.sum(revenue), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# --------------------------------------------------------------------------
# top_customers_per_nation — grouped top-k (reference W9/O4 rank-by-score,
# backend/services/rag.py:384-397, generalized): row_number window ≤ k.
# --------------------------------------------------------------------------
@query(
    "top_customers_per_nation",
    oracle="""
    SELECT n_name, c_name,
           CAST(c_acctbal AS DOUBLE) AS acctbal,
           CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT n_name, c_name, c_acctbal,
             row_number() OVER (
               PARTITION BY n_name
               ORDER BY c_acctbal DESC, c_custkey
             ) AS rn
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    )
    WHERE rn <= 3
    ORDER BY n_name, rn
    """,
)
def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = W.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "n_name",
            "c_name",
            F.col("c_acctbal").cast("double").alias("acctbal"),
            F.col("rn").cast("bigint").alias("rn"),
        )
        .orderBy("n_name", "rn")
    )


# --------------------------------------------------------------------------
# customer_running_revenue — running-total window frame (reference O6
# context-budget accumulation, backend/services/rag.py:273-299, as a
# relational frame). Decimal cumulative sum → exact in both engines.
# --------------------------------------------------------------------------
@query(
    "customer_running_revenue",
    oracle=f"""
    SELECT o_custkey, o_orderkey, o_orderdate,
           {dec_to_double_sql('''sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )''', 2)} AS running_spend
    FROM orders
    WHERE o_custkey <= 100
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def customer_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        orders.withColumn(
            "running_spend", dec_to_double(F.sum(_dec2("o_totalprice")).over(w), 2)
        )
        .select("o_custkey", "o_orderkey", "o_orderdate", "running_spend")
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


# --------------------------------------------------------------------------
# parts_never_discounted — anti join (reference J1 conflict resolution,
# ingestion/table_extractor.py:785-806: keep left rows with no match on the
# keyed right side).
# --------------------------------------------------------------------------
@query(
    "parts_never_discounted",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_partkey NOT IN (
      SELECT l_partkey FROM lineitem WHERE l_discount > 0.08
    )
    ORDER BY p_partkey
    """,
)
def parts_never_discounted(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    discounted = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_discount") > 0.08)
        .select("l_partkey")
    )
    return (
        part.join(discounted, part.p_partkey == discounted.l_partkey, "left_anti")
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# late_shipment_orders — semi join (TPC-H Q4 shape; reference F6 metadata
# post-filter "doc_id ∈ set", backend/services/vector_store.py:212-260,
# as a relational EXISTS).
# --------------------------------------------------------------------------
@query(
    "late_shipment_orders",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def late_shipment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late_orders = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late_orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# q4_order_priority — TPC-H Q4 proper: quarter-scoped orders that had at
# least one late-shipped line, counted by priority. The fixtures carry no
# l_commitdate/l_receiptdate, so the lateness predicate is the same
# 60-day ship-vs-order adaptation late_shipment_orders uses; Q4's extra
# ingredient is the o_orderdate quarter window, which must reach the
# parquet scan as a pushed filter BEFORE the semi join probes lineitem.
# --------------------------------------------------------------------------
@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# nation_customer_rollup — ROLLUP grouping sets (absent from the reference
# — SURVEY.md §2.5 note — native in Spark SQL; exercised for completeness).
# --------------------------------------------------------------------------
@query(
    "nation_customer_rollup",
    oracle=f"""
    SELECT r_name, n_name,
           CAST(count(c_custkey) AS BIGINT) AS n_customers,
           {dec_to_double_sql("sum(CAST(c_acctbal AS DECIMAL(12,2)))", 2)}
             AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """,
)
def nation_customer_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            dec_to_double(F.sum(_dec2("c_acctbal")), 2).alias("total_acctbal"),
        )
        .orderBy(F.asc_nulls_first("r_name"), F.asc_nulls_first("n_name"))
    )


# --------------------------------------------------------------------------
# segment_median_order — exact median via window (reference A1 page-median
# font size, ingestion/pdf_parser.py:297-305). Implemented with
# row_number + middle-row average instead of percentile_approx so both
# engines compute the identical exact value.
# --------------------------------------------------------------------------
@query(
    "segment_median_order",
    oracle=f"""
    WITH ranked AS (
      SELECT c_mktsegment,
             CAST(o_totalprice AS DECIMAL(12,2)) AS price,
             row_number() OVER (
               PARTITION BY c_mktsegment ORDER BY o_totalprice, o_orderkey
             ) AS rn,
             count(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey
    )
    SELECT c_mktsegment,
           {dec_to_double_sql("sum(price)", 2)} / CAST(count(*) AS BIGINT)
             AS median_price
    FROM ranked
    WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def segment_median_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    w_rank = W.partitionBy("c_mktsegment").orderBy("o_totalprice", "o_orderkey")
    w_all = W.partitionBy("c_mktsegment")
    ranked = joined.select(
        "c_mktsegment",
        _dec2("o_totalprice").alias("price"),
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    middle = ranked.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
    )
    return (
        middle.groupBy("c_mktsegment")
        .agg(
            (dec_to_double(F.sum("price"), 2) / F.count(F.lit(1))).alias(
                "median_price"
            )
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# q6_forecast_revenue — TPC-H Q6 shape: pure scan-side filter + single
# decimal-exact aggregate. Every predicate reaches the parquet reader
# (PushedFilters: shipdate range, discount band, quantity cap) — at 100 TB
# this query is I/O-bound on row-group pruning, zero shuffle.
# --------------------------------------------------------------------------
@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {dec_to_double_sql(
        f"sum({_D2} * CAST(l_discount AS DECIMAL(8,2)))", 4)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = _dec2("l_extendedprice") * _fac(F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dec_to_double(F.sum(rev), 4).alias("revenue"))
    )


# --------------------------------------------------------------------------
# q10_returned_items — TPC-H Q10 shape: fact-side filters, broadcast
# dimension chain (customer → nation), revenue top-20. One shuffle (the
# groupBy on custkey); orders/lineitem never co-shuffle because the date
# filter reduces orders before its join is planned (AQE broadcasts it).
# --------------------------------------------------------------------------
@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name, {_REV_SQL} AS revenue
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = _dec2("l_extendedprice") * _fac(F.lit(1) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dec_to_double(F.sum(rev), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q17_small_quantity_revenue — TPC-H Q17 shape: correlated scalar
# subquery (per-part 20%-of-average quantity threshold). Spark expresses
# the decorrelated form directly — per-part threshold aggregate joined
# back to the fact — which is exactly what Catalyst rewrites the
# correlated SQL into; the DuckDB oracle keeps the correlated form, so
# the decorrelation itself is what parity checks. avg(l_quantity) is
# exact in both engines (integer-valued doubles, sum < 2^53).
# --------------------------------------------------------------------------
@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT {dec_to_double_sql(f"sum({_D2})", 2)} / 7.0 AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT avg(l_quantity) * 0.2 FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    )
    th = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(th, li.l_partkey == th.t_partkey)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (dec_to_double(F.sum(_dec2("l_extendedprice")), 2) / 7.0).alias(
                "avg_yearly"
            )
        )
    )


# --------------------------------------------------------------------------
# q14_promo_revenue — TPC-H Q14 shape: conditional aggregate ratio
# (promo-type revenue share in one month). part is broadcast; both sums
# come out decimal-exact and the ratio is one deterministic double divide.
# --------------------------------------------------------------------------
@query(
    "q14_promo_revenue",
    oracle=f"""
    WITH j AS (
      SELECT p_type, {_D2} * {_DISC} AS rev
      FROM lineitem, part
      WHERE l_partkey = p_partkey
        AND l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    )
    SELECT 100.0 * {dec_to_double_sql(
        "sum(CASE WHEN p_type = 'PROMO' THEN rev END)", 4)}
      / {dec_to_double_sql("sum(rev)", 4)} AS promo_pct
    FROM j
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    part = load_table(spark, sf_dir, "part")
    rev = _dec2("l_extendedprice") * _fac(F.lit(1) - F.col("l_discount"))
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "p_type", rev.alias("rev")
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev")))
    return j.agg(
        (
            F.lit(100.0)
            * dec_to_double(promo, 4)
            / dec_to_double(F.sum("rev"), 4)
        ).alias("promo_pct")
    )
