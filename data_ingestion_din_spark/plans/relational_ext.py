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

from data_ingestion_din_spark.functions.hashing import h64_sql
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


# --------------------------------------------------------------------------
# q12_priority_shipping — TPC-H Q12 shape (dual conditional aggregate
# after a fact-fact join): per return flag, how many shipped lineitems
# belong to high- vs low-priority orders in one year. The CASE sums
# compile to a single-pass partial aggregate — no pivot, no second scan.
# --------------------------------------------------------------------------
@query(
    "q12_priority_shipping",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# q16_supplier_part_variety — TPC-H Q16 shape: COUNT(DISTINCT) per group
# after a NOT-IN supplier exclusion. The exclusion is a broadcast
# left-anti join (6 excluded suppliers at any SF — blocklists stay
# tiny); the distinct-count shuffles once on the grouping key with
# partial distinct aggregation map-side.
# --------------------------------------------------------------------------
@query(
    "q16_supplier_part_variety",
    oracle="""
    SELECT p_brand, CAST(p_size AS INT) AS p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_size <= 10
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", F.col("p_size").cast("int").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


# --------------------------------------------------------------------------
# q21_waiting_suppliers — TPC-H Q21 shape, the hardest decorrelation in
# the suite: suppliers who were the ONLY late supplier on a finished
# multi-supplier order. late = shipped > 75 days after the order date
# (the fixture has no commit/receipt dates; same correlation structure).
# Spark shape: the EXISTS (another supplier on the order) is a left-semi
# and the NOT EXISTS (another LATE supplier) a left-anti — both
# hash-joins on orderkey, no correlated re-execution per row; supplier
# dim is broadcast at the end.
# --------------------------------------------------------------------------
@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'
    ),
    l1 AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN o ON l_orderkey = o_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 75 DAY
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM l1 l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 75 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    late_others = late.select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    )
    cand = late.join(
        others,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    ).join(
        late_others,
        (F.col("l_orderkey") == F.col("o3_orderkey"))
        & (F.col("l_suppkey") != F.col("o3_suppkey")),
        "left_anti",
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        cand.join(F.broadcast(supp), cand.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# --------------------------------------------------------------------------
# customer_spend_quartiles — ntile + percent_rank ranking functions over
# per-nation customer spend (the remaining window-function family beyond
# row_number/rank/lag/median/RANGE frames). Ties are impossible under
# the complete (total DESC, c_custkey) ordering, so both engines bucket
# identically.
# --------------------------------------------------------------------------
@query(
    "customer_spend_quartiles",
    oracle=f"""
    WITH spend AS (
      SELECT c_custkey, c_nationkey,
             sum(CAST(o_totalprice AS DECIMAL(12,2))) AS total
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY 1, 2
    )
    SELECT c_custkey,
           CAST(c_nationkey AS INT) AS nation,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           {dec_to_double_sql("total", 2)} AS total_spend
    FROM spend
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY total DESC, c_custkey)
    ORDER BY nation, quartile, c_custkey
    """,
)
def customer_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    spend = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.sum(_dec2("o_totalprice")).alias("total"))
    )
    w = W.partitionBy("c_nationkey").orderBy(F.desc("total"), "c_custkey")
    return (
        spend.select(
            "c_custkey",
            F.col("c_nationkey").cast("int").alias("nation"),
            F.ntile(4).over(w).cast("int").alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            dec_to_double(F.col("total"), 2).alias("total_spend"),
        )
        .orderBy("nation", "quartile", "c_custkey")
    )


# --------------------------------------------------------------------------
# q7_nation_volume — TPC-H Q7 shape: bidirectional nation-pair volume
# (supplier nation ⇄ customer nation, NATION_1⇄NATION_2) by year. The pair predicate is an
# OR of two AND arms over two broadcast nation dims; the fact side
# shuffles once for the 3-key groupBy.
# --------------------------------------------------------------------------
@query(
    "q7_nation_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {dec_to_double_sql(f"sum({_D2} * {_DISC})", 4)} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice, l_discount
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    revenue = _dec2("l_extendedprice") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(8,2)")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dec_to_double(F.sum(revenue), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# q15_top_supplier — TPC-H Q15 shape: derived revenue view + join on its
# global max (the classic "view + scalar aggregate" decorrelation — the
# max is computed once, broadcast, and equi-joined; no correlated
# per-row subquery).
# --------------------------------------------------------------------------
@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum({_D2} * {_DISC}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           {dec_to_double_sql("total_rev", 4)} AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT max(total_rev) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                _dec2("l_extendedprice")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
            ).alias("total_rev")
        )
    )
    mx = revenue.agg(F.max("total_rev").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx), F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            dec_to_double(F.col("total_rev"), 4).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# q8_market_share — TPC-H Q8 shape: one nation's share of a region's
# MEDIUM-part revenue by order year. Conditional-sum ratio over a 6-way
# star join (every dim broadcast; the fact side never shuffles before
# the 1-key groupBy); both sums are decimal-exact, the final division is
# one deterministic double op (the q14 ratio recipe).
# --------------------------------------------------------------------------
@query(
    "q8_market_share",
    oracle=f"""
    WITH vol AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             {_D2} * {_DISC} AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'MEDIUM'
    )
    SELECT o_year,
           round({dec_to_double_sql(
               "sum(CASE WHEN supp_nation = 'NATION_3' THEN volume"
               " ELSE CAST(0 AS DECIMAL(12,4)) END)", 4)}
             / {dec_to_double_sql("sum(volume)", 4)}, 6) AS mkt_share
    FROM vol
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "MEDIUM"
    ).select("p_partkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n1 = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
        nation.n_regionkey == region.r_regionkey,
    ).select(F.col("n_nationkey").alias("n1_key"))
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("supp_nation"),
    )
    volume = _dec2("l_extendedprice") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(8,2)")
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
            F.lit(0).cast("decimal(12,4)")
        )
    )
    return (
        joined.groupBy("o_year")
        .agg(
            F.round(
                dec_to_double(num, 4) / dec_to_double(F.sum("volume"), 4), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# bloom_join_prune — Bloom-filter semi-join reduction (Bloom 1970; the
# runtime-filter lever behind Spark's spark.sql.optimizer.runtime.
# bloomFilter.enabled, reproduced here with portable bits so the FILTER
# ITSELF sits under the hash gate, which the engine-private
# BloomFilterAggregate state cannot). A bounded build side (the top-500
# orders by price — the "selective dimension query feeds a runtime
# filter" shape) sets k=3 md5-derived bit positions each in an m=8192-bit
# filter; the lineitem probe keeps only keys with ALL k bits set, and the
# exact semi-join on the survivors measures the false-positive cost.
#
# Scale: the probe side is never shuffled on the join key — each probe
# row tests 3 positions against a broadcast ≤m-row bit set (m bits =
# 1 KiB as a real bitmap), so a 100 TB fact scan is reduced map-side to
# ~load^k of itself before any exchange; the build side is bounded by
# the top-N cut (TakeOrderedAndProject), and m is sized to the build
# (load = N*k/m ≈ 0.18 → fp ≈ 0.2%). The summary row reports exactly
# what a runtime-filter planner would need: pass rate, fp rate, and the
# surviving row count vs the true join size.
# --------------------------------------------------------------------------
_BF_M = 8192
_BF_K = 3
_BF_N = 500


@query(
    "bloom_join_prune",
    oracle=f"""
    WITH build AS (
      SELECT o_orderkey FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT {_BF_N}
    ),
    bits AS (
      SELECT DISTINCT
             unnest([{", ".join(h64_sql("CAST(o_orderkey AS VARCHAR)", seed=f"bf{i}:") + f" % {_BF_M}" for i in range(_BF_K))}]) AS pos
      FROM build
    ),
    probe AS (
      SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_rows
      FROM lineitem GROUP BY l_orderkey
    ),
    ppos AS (
      SELECT l_orderkey, n_rows,
             unnest([{", ".join(h64_sql("CAST(l_orderkey AS VARCHAR)", seed=f"bf{i}:") + f" % {_BF_M}" for i in range(_BF_K))}]) AS pos
      FROM probe
    ),
    hits AS (
      SELECT l_orderkey, any_value(n_rows) AS n_rows,
             CAST(count(*) AS BIGINT) AS k_hit
      FROM ppos JOIN bits USING (pos)
      GROUP BY l_orderkey
    ),
    pass AS (
      SELECT h.l_orderkey, h.n_rows,
             CASE WHEN b.o_orderkey IS NULL THEN 0 ELSE 1 END AS is_true
      FROM hits h LEFT JOIN build b ON h.l_orderkey = b.o_orderkey
      WHERE h.k_hit = {_BF_K}
    )
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM build) AS n_build,
      (SELECT CAST(count(*) AS BIGINT) FROM bits) AS n_bits_set,
      (SELECT CAST(count(*) AS BIGINT) FROM probe) AS n_probe_keys,
      CAST(count(*) AS BIGINT) AS n_pass_keys,
      CAST(sum(is_true) AS BIGINT) AS n_true_keys,
      CAST(count(*) - sum(is_true) AS BIGINT) AS n_false_pos,
      CAST(sum(n_rows) AS BIGINT) AS n_pass_rows,
      CAST(sum(n_rows * is_true) AS BIGINT) AS n_true_rows,
      round(CAST(count(*) - sum(is_true) AS DOUBLE)
            / (SELECT count(*) FROM probe), 6) AS fp_rate
    FROM pass
    """,
)
def bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_din_spark.functions.hashing import h64

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    build = (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(_BF_N)
        .select("o_orderkey")
    )

    def positions(key: F.Column) -> F.Column:
        return F.array(
            *[
                h64(key.cast("string"), seed=f"bf{i}:") % _BF_M
                for i in range(_BF_K)
            ]
        )

    bits = (
        build.select(F.explode(positions(F.col("o_orderkey"))).alias("pos"))
        .distinct()
    )
    probe = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    ppos = probe.select(
        "l_orderkey",
        "n_rows",
        F.explode(positions(F.col("l_orderkey"))).alias("pos"),
    )
    # the filter is ≤m distinct positions — broadcast, so the probe side
    # never shuffles on the join key
    hits = (
        ppos.join(F.broadcast(bits), "pos")
        .groupBy("l_orderkey")
        .agg(
            F.first("n_rows").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("k_hit"),
        )
    )
    passed = (
        hits.filter(F.col("k_hit") == _BF_K)
        .join(
            F.broadcast(build.withColumn("is_true", F.lit(1))),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left",
        )
        .select(
            "l_orderkey",
            "n_rows",
            F.coalesce(F.col("is_true"), F.lit(0)).alias("is_true"),
        )
    )
    n_build = build.agg(F.count(F.lit(1)).cast("bigint").alias("n_build"))
    n_bits = bits.agg(F.count(F.lit(1)).cast("bigint").alias("n_bits_set"))
    n_probe = probe.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probe_keys")
    )
    summary = passed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pass_keys"),
        F.sum("is_true").cast("bigint").alias("n_true_keys"),
        (F.count(F.lit(1)) - F.sum("is_true"))
        .cast("bigint")
        .alias("n_false_pos"),
        F.sum("n_rows").cast("bigint").alias("n_pass_rows"),
        F.sum(F.col("n_rows") * F.col("is_true"))
        .cast("bigint")
        .alias("n_true_rows"),
    )
    return (
        summary.crossJoin(F.broadcast(n_build))
        .crossJoin(F.broadcast(n_bits))
        .crossJoin(F.broadcast(n_probe))
        .select(
            "n_build",
            "n_bits_set",
            "n_probe_keys",
            "n_pass_keys",
            "n_true_keys",
            "n_false_pos",
            "n_pass_rows",
            "n_true_rows",
            F.round(
                F.col("n_false_pos").cast("double") / F.col("n_probe_keys"),
                6,
            ).alias("fp_rate"),
        )
    )


# --------------------------------------------------------------------------
# user_erasure — right-to-be-forgotten delete cascade: a hash-designated
# erasure set of customers is propagated through the schema (customer →
# orders → lineitem by key lineage; events by subject id), and the audit
# row per table reports before/deleted/after counts — the accounting a
# GDPR/PDPA deletion job must emit. Deletion is expressed as anti-joins
# (the only scalable form: DELETE at 100 TB IS an anti-join rewrite of
# the table), with lineitem's membership resolved through a SEMI join on
# the doomed orders so the fact table never materializes the dimension.
#
# Scale: the erased-key set is corpus-fraction-small (~1%) and hash-
# derived — broadcast; each table is scanned once; counts are map-side
# partial sums.
# --------------------------------------------------------------------------
_GDPR_H = h64_sql("'gdpr:' || CAST(c_custkey AS VARCHAR)")
_GDPR_MOD = 101


@query(
    "user_erasure",
    oracle=f"""
    WITH doomed AS (
      SELECT c_custkey FROM customer WHERE {_GDPR_H} % {_GDPR_MOD} = 0
    ),
    doomed_orders AS (
      SELECT o_orderkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM doomed)
    ),
    audit AS (
      SELECT 'customer' AS table_name,
             (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_before,
             (SELECT CAST(count(*) AS BIGINT) FROM doomed) AS n_deleted
      UNION ALL
      SELECT 'orders',
             (SELECT CAST(count(*) AS BIGINT) FROM orders),
             (SELECT CAST(count(*) AS BIGINT) FROM doomed_orders)
      UNION ALL
      SELECT 'lineitem',
             (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
             (SELECT CAST(count(*) AS BIGINT) FROM lineitem
              WHERE l_orderkey IN (SELECT o_orderkey FROM doomed_orders))
      UNION ALL
      SELECT 'events',
             (SELECT CAST(count(*) AS BIGINT) FROM events),
             (SELECT CAST(count(*) AS BIGINT) FROM events
              WHERE {h64_sql("'gdpr:' || CAST(user_id AS VARCHAR)")}
                    % {_GDPR_MOD} = 0)
    )
    SELECT table_name, n_before, n_deleted,
           n_before - n_deleted AS n_after
    FROM audit
    ORDER BY table_name
    """,
)
def user_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_din_spark.functions.hashing import h64

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    def gdpr(col):
        return (
            h64(F.concat(F.lit("gdpr:"), col.cast("string"))) % _GDPR_MOD
            == 0
        )

    doomed = cust.filter(gdpr(F.col("c_custkey"))).select("c_custkey")
    doomed_orders = orders.join(
        F.broadcast(doomed),
        orders.o_custkey == doomed.c_custkey,
        "left_semi",
    ).select("o_orderkey")
    doomed_li = li.join(
        F.broadcast(doomed_orders),
        li.l_orderkey == doomed_orders.o_orderkey,
        "left_semi",
    )

    def audit(name, full_df, deleted_df):
        n_b = full_df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_before")
        )
        n_d = deleted_df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_deleted")
        )
        return (
            n_b.crossJoin(F.broadcast(n_d))
            .select(
                F.lit(name).alias("table_name"),
                "n_before",
                "n_deleted",
                (F.col("n_before") - F.col("n_deleted")).alias("n_after"),
            )
        )

    rows = (
        audit("customer", cust, doomed)
        .unionByName(audit("orders", orders, doomed_orders))
        .unionByName(audit("lineitem", li, doomed_li))
        .unionByName(audit("events", ev, ev.filter(gdpr(F.col("user_id")))))
    )
    return rows.orderBy("table_name")


# --------------------------------------------------------------------------
# salted_skew_join — the SKEW recipe end to end: lineitem ⋈ orders via
# operators/colocate.salted_join (big side salted into 8 sub-keys, small
# side replicated once per salt — the middle regime where the dim is too
# big to broadcast but ≪ the fact), then the per-priority revenue sum via
# salted_agg_sum (5-value group key = the textbook hot-key aggregation;
# partials on (key, salt), exact decimal combine on key). Salting is a
# physical rewrite ONLY — the oracle is the plain join + group-by, so
# hash parity proves the salt never changes semantics: every key match
# pairs exactly once (the big row carries ONE salt; the small copy with
# that salt exists exactly once) and the decimal partial sums recombine
# exactly.
# --------------------------------------------------------------------------
@query(
    "salted_skew_join",
    oracle=f"""
    SELECT o_orderpriority,
           {dec_to_double_sql(f"sum({_D2} * {_DISC})", 4)} AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_din_spark.operators.colocate import (
        salted_agg_sum,
        salted_join,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    j = salted_join(li, orders, "l_orderkey", "o_orderkey", n_salts=8)
    rev = j.select(
        "o_orderpriority",
        (
            _dec2("l_extendedprice")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
        ).alias("rev"),
        F.lit(1).cast("bigint").alias("n_lines"),
    )
    out = salted_agg_sum(rev, ["o_orderpriority"], ["rev", "n_lines"], n_salts=8)
    return out.select(
        "o_orderpriority",
        dec_to_double(F.col("rev"), 4).alias("revenue"),
        F.col("n_lines"),
    ).orderBy("o_orderpriority")
