"""Data-quality expectation checks (the Deequ / dbt-tests pattern): a
declarative constraint suite evaluated as ONE metrics table — each row
is (table, constraint, observed violation/metric count, passed). This is
the gate a production ingest runs before publishing a batch: uniqueness
of keys, referential integrity, range and non-null expectations, all as
exact integer counts so the suite itself sits under the oracle hash
gate.

Scale: every constraint is one aggregate over its table (key-uniqueness
and FK checks shuffle on the checked key; range/null checks are
scan-speed map-side partials); the union of one-row results is free.
Constraint evaluation batches per table could share scans — at 100 TB
you'd fuse same-table constraints into one agg pass; here they stay
separate branches for clarity and because Spark schedules them in one
job anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_din_spark.plans.registry import query
from data_ingestion_din_spark.sources.tables import load_table


def _dup_count(df: DataFrame, key: str) -> DataFrame:
    """Rows beyond the first per key value — 0 means the key is unique."""
    return df.groupBy(key).agg(F.count(F.lit(1)).alias("n")).agg(
        F.coalesce(F.sum(F.col("n") - 1), F.lit(0))
        .cast("bigint")
        .alias("observed")
    )


def _orphans(child: DataFrame, ck: str, parent: DataFrame, pk: str) -> DataFrame:
    """Child rows whose FK has no parent — referential integrity."""
    return (
        child.select(F.col(ck).alias("k"))
        .join(parent.select(F.col(pk).alias("k")), "k", "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("observed"))
    )


def _violations(df: DataFrame, cond) -> DataFrame:
    """Rows violating a boolean expectation."""
    return df.filter(~cond).agg(
        F.count(F.lit(1)).cast("bigint").alias("observed")
    )


@query(
    "dq_expectations",
    oracle="""
    SELECT tbl, expectation, observed,
           -- size: expectations carry the row count and pass when > 0;
           -- every other check counts violations and passes at 0 (a
           -- non-vacuous gate: the size rows put real non-zero numbers
           -- under the hash, so a bug that zeroes counts fails parity)
           CASE WHEN expectation LIKE 'size:%' THEN observed > 0
                ELSE observed = 0 END AS passed
    FROM (
      SELECT 'orders' AS tbl, 'size:>0' AS expectation,
             CAST(count(*) AS BIGINT) AS observed
      FROM orders
      UNION ALL
      SELECT 'lineitem', 'size:>0', CAST(count(*) AS BIGINT) FROM lineitem
      UNION ALL
      SELECT 'events', 'size:>0', CAST(count(*) AS BIGINT) FROM events
      UNION ALL
      SELECT 'documents', 'size:>0', CAST(count(*) AS BIGINT) FROM documents
      UNION ALL
      SELECT 'orders', 'unique:o_orderkey',
             CAST(coalesce(sum(n - 1), 0) AS BIGINT)
      FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey)
      UNION ALL
      SELECT 'part', 'unique:p_partkey',
             CAST(coalesce(sum(n - 1), 0) AS BIGINT)
      FROM (SELECT count(*) AS n FROM part GROUP BY p_partkey)
      UNION ALL
      SELECT 'lineitem', 'fk:l_orderkey->orders', CAST(count(*) AS BIGINT)
      FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderkey IS NULL
      UNION ALL
      SELECT 'orders', 'fk:o_custkey->customer', CAST(count(*) AS BIGINT)
      FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_custkey IS NULL
      UNION ALL
      SELECT 'customer', 'fk:c_nationkey->nation', CAST(count(*) AS BIGINT)
      FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE n.n_nationkey IS NULL
      UNION ALL
      SELECT 'lineitem', 'range:l_quantity[1,50]', CAST(count(*) AS BIGINT)
      FROM lineitem WHERE NOT (l_quantity >= 1 AND l_quantity <= 50)
      UNION ALL
      SELECT 'lineitem', 'range:l_discount[0,0.1]', CAST(count(*) AS BIGINT)
      FROM lineitem WHERE NOT (l_discount >= 0 AND l_discount <= 0.1)
      UNION ALL
      SELECT 'orders', 'positive:o_totalprice', CAST(count(*) AS BIGINT)
      FROM orders WHERE NOT (o_totalprice > 0)
      UNION ALL
      SELECT 'events', 'not_null:value', CAST(count(*) AS BIGINT)
      FROM events WHERE value IS NULL
      UNION ALL
      SELECT 'documents', 'non_empty:text', CAST(count(*) AS BIGINT)
      FROM documents WHERE NOT (length(text) > 0)
      UNION ALL
      SELECT 'region', 'rowcount:=5',
             CAST(abs(count(*) - 5) AS BIGINT)
      FROM region
    )
    ORDER BY tbl, expectation
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    events = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    region = load_table(spark, sf_dir, "region")

    def lab(df: DataFrame, tbl: str, exp: str) -> DataFrame:
        return df.select(
            F.lit(tbl).alias("tbl"),
            F.lit(exp).alias("expectation"),
            "observed",
        )

    def size(df: DataFrame, tbl: str) -> DataFrame:
        return lab(
            df.agg(F.count(F.lit(1)).cast("bigint").alias("observed")),
            tbl,
            "size:>0",
        )

    checks = [
        size(orders, "orders"),
        size(lineitem, "lineitem"),
        size(events, "events"),
        size(docs, "documents"),
        lab(_dup_count(orders, "o_orderkey"), "orders", "unique:o_orderkey"),
        lab(_dup_count(part, "p_partkey"), "part", "unique:p_partkey"),
        lab(
            _orphans(lineitem, "l_orderkey", orders, "o_orderkey"),
            "lineitem",
            "fk:l_orderkey->orders",
        ),
        lab(
            _orphans(orders, "o_custkey", customer, "c_custkey"),
            "orders",
            "fk:o_custkey->customer",
        ),
        lab(
            _orphans(customer, "c_nationkey", nation, "n_nationkey"),
            "customer",
            "fk:c_nationkey->nation",
        ),
        lab(
            _violations(
                lineitem,
                (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 50),
            ),
            "lineitem",
            "range:l_quantity[1,50]",
        ),
        lab(
            _violations(
                lineitem,
                (F.col("l_discount") >= 0) & (F.col("l_discount") <= 0.1),
            ),
            "lineitem",
            "range:l_discount[0,0.1]",
        ),
        lab(
            _violations(orders, F.col("o_totalprice") > 0),
            "orders",
            "positive:o_totalprice",
        ),
        lab(
            events.filter(F.col("value").isNull()).agg(
                F.count(F.lit(1)).cast("bigint").alias("observed")
            ),
            "events",
            "not_null:value",
        ),
        lab(
            _violations(docs, F.length("text") > 0),
            "documents",
            "non_empty:text",
        ),
        lab(
            region.agg(
                F.abs(F.count(F.lit(1)) - 5).cast("bigint").alias("observed")
            ),
            "region",
            "rowcount:=5",
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.withColumn(
        "passed",
        F.when(
            F.col("expectation").startswith("size:"), F.col("observed") > 0
        ).otherwise(F.col("observed") == 0),
    ).orderBy("tbl", "expectation")
