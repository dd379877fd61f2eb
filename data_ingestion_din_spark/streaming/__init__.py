from data_ingestion_din_spark.streaming import ingest, windows  # noqa: F401
