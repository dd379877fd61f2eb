"""Multimodal binary-column query: payload → mapInPandas decode stage →
typed metadata, oracle-checked.

Binary payloads are derived from ``documents`` (utf-8 bytes, ~1/4 get a
PNG magic prefix) so the Arrow round-trip of sources/binary.py's decode
stage — payload in, sniffed format + stubbed dimensions + feature vector
out — is verifiable: every output value is a pure function of the
payload's md5, which DuckDB recomputes from the same bytes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_din_spark.functions.hashing import h64, h64_sql
from data_ingestion_din_spark.plans.registry import query
from data_ingestion_din_spark.sources.binary import decode_media
from data_ingestion_din_spark.sources.tables import load_table

_H_MEDIA = h64_sql("'media:' || CAST(doc_id AS VARCHAR)")

# payload stays ASCII/utf-8 (GIF8 magic) so DuckDB's md5(VARCHAR) — which
# hashes the utf-8 bytes — sees exactly the bytes the Spark stub hashes
_PAYLOAD = (
    f"CASE WHEN {_H_MEDIA} % 4 = 0 THEN 'GIF8' || text ELSE text END"
)


@query(
    "multimodal_media_stats",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             'media/doc_' || CAST(doc_id AS VARCHAR)
               || (CASE WHEN {_H_MEDIA} % 4 = 0 THEN '.gif' ELSE '.bin' END)
               AS path,
             {_PAYLOAD} AS payload
      FROM documents
    ),
    d AS (
      SELECT path,
             md5(payload) AS h,
             octet_length(encode(payload)) AS n_bytes,
             CASE WHEN starts_with(payload, 'GIF8') THEN 'gif'
                  ELSE 'unknown' END AS format
      FROM m
    )
    SELECT path,
           substr(h, 1, 16) AS media_id,
           CAST(n_bytes AS BIGINT) AS n_bytes,
           format,
           CAST(1 + CAST(('0x' || substr(h, 1, 2)) AS INT) AS INT) AS width,
           CAST(1 + CAST(('0x' || substr(h, 3, 2)) AS INT) AS INT) AS height,
           CAST(CAST(('0x' || substr(h, 5, 2)) AS INT) - 128 AS INT) AS feat0_q
    FROM d
    ORDER BY path
    """,
)
def multimodal_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal columns (north star; reference S4/L6 restated): opaque
    binary payload + typed metadata via an Arrow-batched mapInPandas
    decode stage (stubbed codecs — sources/binary.py). The feature
    vector's first component is re-quantized to its exact integer seed so
    the oracle compares integers, not float formatting."""
    docs = load_table(spark, sf_dir, "documents")
    h = h64(F.concat(F.lit("media:"), F.col("doc_id").cast("string")))
    is_gif = h % 4 == 0
    payload = F.encode(
        F.when(is_gif, F.concat(F.lit("GIF8"), F.col("text"))).otherwise(
            F.col("text")
        ),
        "utf-8",
    )
    path = F.concat(
        F.lit("media/doc_"),
        F.col("doc_id").cast("string"),
        F.when(is_gif, F.lit(".gif")).otherwise(F.lit(".bin")),
    )
    binary_df = docs.select(path.alias("path"), payload.alias("content"))
    meta = decode_media(binary_df, decode_stub=True)
    return meta.select(
        "path",
        "media_id",
        "n_bytes",
        "format",
        "width",
        "height",
        (F.element_at("feature", 1) * 128).cast("int").alias("feat0_q"),
    ).orderBy("path")
