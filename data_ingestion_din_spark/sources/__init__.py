from data_ingestion_din_spark.sources.tables import TABLE_NAMES, load_tables  # noqa: F401
