"""Extended relational surface: outer-join distributions, having-filtered
join aggregates, multi-bracket OR predicates, correlated-average anti
joins — the TPC-H Q13/Q18/Q19/Q22 shapes adapted to the fixture schema.

These exercise the join/agg machinery the reference lacks entirely
(SURVEY.md §2.4: no hash/semi/anti/theta joins exist there) and that any
user of the engine's relational views of extracted tables gets from Spark
SQL. Decimal-exact money math per plans/registry.py; the Q22 per-nation
average comparison is restated as `acctbal * n > sum` so both engines
compare exact decimals instead of an engine-specific AVG type."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from data_ingestion_din_spark.plans._exact import dec_to_double, dec_to_double_sql
from data_ingestion_din_spark.plans.registry import query
from data_ingestion_din_spark.sources.tables import load_table

_D2 = "CAST(l_extendedprice AS DECIMAL(12,2))"
_DISC = "CAST(1 - l_discount AS DECIMAL(8,2))"


def _dec2(c):
    return F.col(c).cast("decimal(12,2)")


# --------------------------------------------------------------------------
# Q13 shape — customer order-count distribution (left outer join + double
# aggregation; zero-order customers must survive)
# --------------------------------------------------------------------------
@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders, cust.c_custkey == orders.o_custkey, "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --------------------------------------------------------------------------
# Q18 shape — large-quantity orders (having-filtered agg joined back to
# orders + customer, complete-key top-k)
# --------------------------------------------------------------------------
@query(
    "q18_large_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey,
             {dec_to_double_sql("sum(CAST(l_quantity AS DECIMAL(12,2)))", 2)}
               AS total_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 250
    )
    SELECT c.c_name, o.o_orderkey, o.o_totalprice, b.total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec2("l_quantity")).alias("_tq"))
        .filter(F.col("_tq") > 250)
        .select("l_orderkey", dec_to_double(F.col("_tq"), 2).alias("total_qty"))
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_name", "o_orderkey", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q19 shape — OR-of-ANDs bracket predicate across a join (predicate
# pushdown + single-row decimal-exact revenue)
# --------------------------------------------------------------------------
@query(
    "q19_bracket_revenue",
    oracle=f"""
    SELECT {dec_to_double_sql(f"sum({_D2} * {_DISC})", 4)} AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    brackets = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & q.between(20, 30))
    )
    rev = _dec2("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast(
        "decimal(8,2)"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(brackets)
        .agg(
            dec_to_double(F.sum(rev), 4).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Q22 shape — above-nation-average balances with no recent orders
# (window average + anti join). `bal * n > sum` keeps the comparison in
# exact decimals on both engines.
# --------------------------------------------------------------------------
@query(
    "q22_idle_customers",
    oracle=f"""
    WITH stats AS (
      SELECT c_custkey, c_nationkey,
             CAST(c_acctbal AS DECIMAL(12,2)) AS bal,
             sum(CAST(c_acctbal AS DECIMAL(12,2)))
               OVER (PARTITION BY c_nationkey) AS nat_sum,
             count(*) OVER (PARTITION BY c_nationkey) AS nat_n
      FROM customer
    ),
    rich AS (
      SELECT * FROM stats WHERE bal * nat_n > nat_sum
    ),
    idle AS (
      SELECT r.* FROM rich r
      WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = r.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      )
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_custs,
           {dec_to_double_sql("sum(bal)", 2)} AS total_bal
    FROM idle
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("c_nationkey")
    stats = cust.select(
        "c_custkey",
        "c_nationkey",
        _dec2("c_acctbal").alias("bal"),
    ).withColumn("nat_sum", F.sum("bal").over(w)).withColumn(
        "nat_n", F.count(F.lit(1)).over(w)
    )
    rich = stats.filter(F.col("bal") * F.col("nat_n") > F.col("nat_sum"))
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    ).select("o_custkey")
    idle = rich.join(
        recent, rich.c_custkey == recent.o_custkey, "left_anti"
    )
    return (
        idle.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_custs"),
            dec_to_double(F.sum("bal"), 2).alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


# --------------------------------------------------------------------------
# q3_bucketed_colocated — the Q3 join/agg over orderkey-BUCKETED fact
# tables (operators/colocate.bucketed_fact_tables): orders and lineitem
# are laid out bucket-hashed+sorted on the orderkey once per session, so
# the fact-fact join, the groupBy (whose key set contains the bucket
# key), and the top-k all plan with ZERO shuffle Exchange — the only
# Exchange in the plan is the customer broadcast
# (tests/test_colocate.py::test_q3_bucketed_plan_has_no_shuffle asserts
# this). This is the repeating nightly fact-fact join every ETL pipeline
# has: pay the layout once, never shuffle the fact tables again. The
# oracle computes the identical answer from the raw tables — layout must
# not change semantics.
# --------------------------------------------------------------------------
@query(
    "q3_bucketed_colocated",
    oracle=f"""
    SELECT
      l_orderkey,
      {dec_to_double_sql(f"sum({_D2} * {_DISC})", 4)} AS revenue,
      o_orderdate,
      o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'MACHINERY'
      AND o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-06-30 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_din_spark.operators.colocate import bucketed_fact_tables

    ord_tbl, li_tbl = bucketed_fact_tables(spark, sf_dir)
    orders = spark.table(ord_tbl).filter(
        F.col("o_orderdate") < F.lit("1997-06-30").cast("timestamp")
    )
    li = spark.table(li_tbl).filter(
        F.col("l_shipdate") > F.lit("1997-06-30").cast("timestamp")
    )
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    )
    revenue = _dec2("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast(
        "decimal(8,2)"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec_to_double(F.sum(revenue), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )
