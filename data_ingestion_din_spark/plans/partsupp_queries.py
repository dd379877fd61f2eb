"""TPC-H Q2/Q9/Q11/Q20 shapes over the derived ``partsupp`` view
(sources/partsupp.py) — the last four relational shapes of the 22
(COVERAGE.md §relational). Each oracle inlines the identical partsupp
derivation as a CTE, so the hash gate applies end-to-end.

Money math stays exact: ``ps_supplycost`` is whole units (BIGINT), all
products/sums go through DECIMAL (plans/registry.py rules), and final
doubles use the two-op conversion in plans/_exact.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_din_spark.plans._exact import dec_to_double, dec_to_double_sql
from data_ingestion_din_spark.plans.registry import query
from data_ingestion_din_spark.sources.partsupp import PARTSUPP_CTE, derived_partsupp
from data_ingestion_din_spark.sources.tables import load_table

_D2 = "CAST(l_extendedprice AS DECIMAL(12,2))"
_DISC = "CAST(1 - l_discount AS DECIMAL(8,2))"


def _dec2(c):
    return F.col(c).cast("decimal(12,2)")


# --------------------------------------------------------------------------
# Q2 shape — min-cost supplier per qualifying part within a region (the
# correlated-MIN subquery, decorrelated as groupBy-min + equi-join back).
# Spark plan: partsupp joins three broadcast dims (supplier, nation,
# EUROPE region); the per-part min is one shuffle on ps_partkey; the
# min-join back is key+value equality so no second shuffle of the big
# side beyond the reused partitioning. Part is filtered (p_size/p_type)
# before its broadcast join.
# --------------------------------------------------------------------------
@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH {PARTSUPP_CTE},
    eps AS (
      SELECT ps_partkey, ps_supplycost, s_name, s_acctbal, n_name
      FROM partsupp
      JOIN supplier ON ps_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    mn AS (
      SELECT ps_partkey AS mn_partkey, min(ps_supplycost) AS min_cost
      FROM eps GROUP BY 1
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           CAST(ps_supplycost AS BIGINT) AS supply_cost
    FROM part
    JOIN eps ON p_partkey = ps_partkey
    JOIN mn ON ps_partkey = mn_partkey AND ps_supplycost = min_cost
    WHERE p_size <= 10 AND p_type = 'LARGE'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
    ).select("p_partkey", "p_brand")
    eps = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .select("ps_partkey", "ps_supplycost", "s_name", "s_acctbal", "n_name")
    )
    mn = eps.groupBy(F.col("ps_partkey").alias("mn_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        eps.join(
            mn,
            (F.col("ps_partkey") == F.col("mn_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .join(F.broadcast(part), F.col("ps_partkey") == part.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.col("ps_supplycost").cast("bigint").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q9 shape — product-line profit by nation and year: revenue minus
# supply cost, over lineitem ⋈ partsupp (the only two-key fact-fact
# join in the suite). Spark plan: lineitem is semi-reduced by the
# broadcast name-filtered part FIRST, then shuffle-joins partsupp on
# (partkey, suppkey); supplier/nation broadcast; one shuffle for the
# 2-key groupBy. amount stays DECIMAL scale-4 throughout.
# --------------------------------------------------------------------------
@query(
    "q9_product_profit",
    oracle=f"""
    WITH {PARTSUPP_CTE},
    profit AS (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS INT) AS o_year,
             {_D2} * {_DISC}
               - CAST(ps_supplycost AS DECIMAL(12,2))
                 * CAST(l_quantity AS DECIMAL(12,2)) AS amount
      FROM lineitem
      JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
      JOIN part ON p_partkey = l_partkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%gear%'
    )
    SELECT nation, o_year,
           {dec_to_double_sql("sum(amount)", 4)} AS sum_profit
    FROM profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%gear%")
    ).select("p_partkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    amount = _dec2("l_extendedprice") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(8,2)") - F.col("ps_supplycost").cast(
        "decimal(12,2)"
    ) * _dec2("l_quantity")
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
    )
    return (
        joined.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dec_to_double(F.sum("amount"), 4).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# --------------------------------------------------------------------------
# Q11 shape — important stock: per-part inventory value for one nation's
# suppliers, HAVING above a fraction of the global total (group-HAVING
# against a global scalar). The comparison is restated integer-exact as
# ``sum(val) * 200 > total`` (no AVG/fraction types); the total is a
# 1-row broadcast crossJoin, not a correlated subquery.
# --------------------------------------------------------------------------
@query(
    "q11_important_stock",
    oracle=f"""
    WITH {PARTSUPP_CTE},
    nsup AS (
      SELECT s_suppkey FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
    ),
    nps AS (
      SELECT ps_partkey, ps_supplycost * ps_availqty AS val
      FROM partsupp JOIN nsup ON ps_suppkey = s_suppkey
    ),
    tot AS (SELECT sum(val) AS total FROM nps)
    SELECT ps_partkey, CAST(sum(val) AS BIGINT) AS part_value
    FROM nps, tot
    GROUP BY ps_partkey, total
    HAVING sum(val) * 200 > total
    ORDER BY part_value DESC, ps_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    nsup = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_7"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    nps = ps.join(
        F.broadcast(nsup), ps.ps_suppkey == F.col("s_suppkey")
    ).select(
        "ps_partkey",
        (F.col("ps_supplycost") * F.col("ps_availqty")).alias("val"),
    )
    tot = nps.agg(F.sum("val").alias("total"))
    return (
        nps.groupBy("ps_partkey")
        .agg(F.sum("val").alias("pv"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("pv") * 200 > F.col("total"))
        .select(
            "ps_partkey", F.col("pv").cast("bigint").alias("part_value")
        )
        .orderBy(F.desc("part_value"), "ps_partkey")
    )


# --------------------------------------------------------------------------
# Q20 shape — potential promotion: suppliers in a region whose stock of
# name-prefixed parts exceeds half of what they actually shipped in one
# year (nested IN chains → semi-join ladder). Spark plan: the shipped-
# quantity agg shuffles lineitem once on (partkey, suppkey); partsupp is
# filtered by the broadcast part prefix list; the final supplier filter
# is a left-semi against the DISTINCT candidate suppkeys. The 0.5
# fraction is restated exact as ``2 * availqty > sum(qty)``.
# --------------------------------------------------------------------------
@query(
    "q20_potential_promotion",
    oracle=f"""
    WITH {PARTSUPP_CTE},
    qty AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(l_quantity AS DECIMAL(12,2))) AS sq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1, 2
    ),
    smallp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
    cand AS (
      SELECT DISTINCT ps_suppkey
      FROM partsupp
      JOIN smallp ON ps_partkey = p_partkey
      JOIN qty ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
      WHERE CAST(ps_availqty AS DECIMAL(12,2)) * 2 > sq
    )
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    JOIN cand ON s_suppkey = ps_suppkey
    WHERE r_name = 'EUROPE'
    ORDER BY s_name
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    qty = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec2("l_quantity")).alias("sq")
    )
    smallp = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    cand = (
        ps.join(F.broadcast(smallp), ps.ps_partkey == F.col("p_partkey"))
        .join(
            qty,
            (ps.ps_partkey == qty.l_partkey)
            & (ps.ps_suppkey == qty.l_suppkey),
        )
        .filter(F.col("ps_availqty").cast("decimal(12,2)") * 2 > F.col("sq"))
        .select("ps_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(cand, supp.s_suppkey == cand.ps_suppkey, "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
