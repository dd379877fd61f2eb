"""data_ingestion_din_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference document-ingestion engine
(PrintfPeng/data_ingestion_din): relational scans/joins/aggregations/windows,
text cleaning + analysis, dedup (exact and near-dup), similarity search,
multimodal column plumbing, and streaming ingestion — all declared with the
DataFrame/SQL API so Catalyst/Tungsten pick the physical plan.

Design stance (SURVEY.md §7.0): pure functions ``DataFrame -> DataFrame``,
no driver-side per-row loops, built-in ``pyspark.sql.functions`` everywhere
possible, Pandas UDFs only where semantics genuinely require Python.
"""

__version__ = "0.1.0"

from data_ingestion_din_spark.session import get_spark  # noqa: F401
from data_ingestion_din_spark.sources.tables import load_tables  # noqa: F401
