from data_ingestion_din_spark.functions import analysis, hashing, text, vectors  # noqa: F401
