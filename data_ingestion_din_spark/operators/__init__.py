from data_ingestion_din_spark.operators import dedup, sessionize, similarity, topk  # noqa: F401
