"""Co-location and skew operators: bucketed joins, salted aggregation.

These are the two 100 TB shuffle levers PLANS.md's scale rules name but
no query exercises on the small fixtures (broadcast wins there). Each is
a production-shaped operator with a plan-asserting test
(tests/test_colocate.py) so the lever is demonstrated, not just
documented.

- **Bucketed co-located join** (`write_bucketed` + a join of two tables
  bucketed on the join key): both sides' files are hash-partitioned into
  the same bucket layout at WRITE time, so the join plan has NO Exchange
  on either side — the single biggest shuffle saving available to a
  fact-fact join that repeats across jobs (e.g. lineitem ⋈ orders every
  night). The reference has no table layout control at all (per-document
  JSON files); this is pure Spark-side capability.
- **Salted two-phase aggregation** (`salted_agg_sum`): for algebraic
  aggregates on a skewed key, shuffle once on (key, salt) — splitting a
  hot key across ``n_salts`` reducers — then combine the partials with a
  second tiny shuffle on key alone. Same result as the direct groupBy
  (test-asserted); bounded per-task input regardless of key skew. AQE's
  skew-join splitting covers joins, but a skewed *aggregation* key needs
  salting (or partial-agg push-down, which stops helping when the hot
  key dominates single partitions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table. Joins and
    aggregations on ``bucket_col`` between tables sharing a bucket count
    then plan with zero Exchange (verified in tests/test_colocate.py)."""
    (
        df.write.bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table_name)
    )


def salt_col(key: Column, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts): murmur3 of the key row-content
    is NOT usable (same key → same salt defeats the point), so salt on
    ``spark_partition_id`` — rows of a hot key arriving on different
    input partitions spread across reducers, while determinism per
    (partition, key) keeps reruns stable."""
    return F.pmod(F.spark_partition_id(), F.lit(n_salts))


def salted_agg_sum(
    df: DataFrame,
    key_cols: list[str],
    sum_cols: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe sum: groupBy(key, salt) partials, then
    groupBy(key) combine. Algebraic aggregates only (sum/count/min/max
    compose; avg = sum+count then divide)."""
    partial = (
        df.withColumn("_salt", salt_col(F.col(key_cols[0]), n_salts))
        .groupBy(*key_cols, "_salt")
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
    )
    return partial.groupBy(*key_cols).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )
