from data_ingestion_din_spark.operators import (  # noqa: F401
    blocks,
    dedup,
    sessionize,
    similarity,
    tables_ops,
    topk,
    validate,
)
