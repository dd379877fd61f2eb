"""Extracted-table queries (SURVEY.md §2.3 F4/F5, §2.4 J1/J2, §2.5 A2,
§2.6 W6-W8, §2.9 header canonicalization + money parse, F10 transactions)
over the derived ``table_blocks`` entity table (sources/entities.py).

Each query drives operators/tables_ops.py and re-states the same dataflow
as DuckDB SQL over the identical derived table — rows-as-arrays cleaning,
header election, content-hash dedup, camelot-vs-vision conflict
resolution, the exploded cell view, trust-gated money aggregation and the
transaction pivot are all checked value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_din_spark.operators.tables_ops import (
    HEADER_CANON,
    compute_from_table,
    dedup_by_content,
    elect_header,
    extract_transactions,
    junk_filter,
    pad_and_prune,
    promote_first_row_header,
    resolve_conflicts,
    split_subtables,
    table_cells,
)
from data_ingestion_din_spark.plans._exact import dec_to_double, dec_to_double_sql
from data_ingestion_din_spark.plans.registry import query
from data_ingestion_din_spark.sources.entities import TABLE_BLOCKS_CTES, table_blocks


def _canon_sql(expr: str) -> str:
    """DuckDB twin of tables_ops.canonical_header — SAME ordered map,
    first match wins."""
    whens = "\n".join(
        f"      WHEN contains(lower(trim({expr})), '{needle}') THEN '{canon}'"
        for needle, canon in HEADER_CANON
    )
    return f"CASE\n{whens}\n      ELSE NULL END"


def _parse_money_sql(expr: str) -> str:
    """DuckDB twin of functions.text.parse_money."""
    stripped = f"regexp_replace({expr}, '[,฿\\s]|บาท|baht', '', 'g')"
    negged = f"regexp_replace({stripped}, '^\\((.*)\\)$', '-\\1')"
    return f"try_cast({negged} AS DECIMAL(16,2))"


_ROWS_FP = (
    "md5(coalesce(array_to_string("
    "list_transform(rows, r -> array_to_string(r, '|')), ';'), ''))"
)


# --------------------------------------------------------------------------
# F4 + F5 — pad ragged rows, prune empty columns/rows, junk filter
# --------------------------------------------------------------------------
@query(
    "tables_clean_shape",
    oracle=f"""WITH {TABLE_BLOCKS_CTES},
    raw_kept AS (
      SELECT id, columns, rows FROM table_blocks
      WHERE len(columns) >= 2 AND len(rows) >= 2
        AND len(list_filter(rows,
              r -> len(list_filter(r,
                         c -> regexp_matches(c, '[A-Za-z0-9฀-๿]'))) > 0)) > 0
    ),
    w AS (
      SELECT id, columns, rows,
             greatest(len(columns),
                      coalesce(list_max(list_transform(rows, r -> len(r))), 0))
               AS width
      FROM raw_kept
    ),
    padded AS MATERIALIZED (
      SELECT id,
             list_transform(range(1, width + 1),
                            i -> coalesce(columns[i], '')) AS columns,
             list_transform(rows, r ->
               list_transform(range(1, width + 1),
                              i -> coalesce(r[i], ''))) AS rows
      FROM w
    ),
    keep AS MATERIALIZED (
      SELECT id, columns, rows,
             list_filter(range(1, len(columns) + 1), i ->
               trim(columns[i]) <> ''
               OR len(list_filter(rows, r -> trim(r[i]) <> '')) > 0) AS ki
      FROM padded
    ),
    projected AS MATERIALIZED (
      SELECT id,
             list_transform(ki, i -> columns[i]) AS columns,
             list_filter(
               list_transform(rows, r -> list_transform(ki, i -> r[i])),
               r -> len(list_filter(r, c -> trim(c) <> '')) > 0) AS rows
      FROM keep
    )
    SELECT id,
           CAST(len(columns) AS BIGINT) AS n_cols,
           CAST(len(rows) AS BIGINT) AS n_rows,
           md5(array_to_string(columns, '|')) AS cols_fp,
           {_ROWS_FP} AS rows_fp
    FROM projected
    ORDER BY id
    """,
)
def tables_clean_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    # junk filter (F5) runs at extraction, BEFORE cleaning (F4) — the
    # reference's order, and it keeps the filter predicate on the scanned
    # entity instead of re-deriving the pruned projection per row
    t = pad_and_prune(junk_filter(table_blocks(spark, sf_dir)))
    rows_fp = F.md5(
        F.concat_ws(";", F.transform("rows", lambda r: F.concat_ws("|", r)))
    )
    return t.select(
        "id",
        F.size("columns").cast("bigint").alias("n_cols"),
        F.size("rows").cast("bigint").alias("n_rows"),
        F.md5(F.concat_ws("|", "columns")).alias("cols_fp"),
        rows_fp.alias("rows_fp"),
    ).orderBy("id")


# --------------------------------------------------------------------------
# W7 + W8 — header election among leading rows; first-row promotion
# --------------------------------------------------------------------------
@query(
    "tables_header_election",
    oracle=f"""WITH {TABLE_BLOCKS_CTES},
    s AS (
      SELECT id, columns, rows,
             list_transform(list_slice(rows, 1, 3), r ->
               len(list_filter(r, c -> regexp_matches(c, '[A-Za-z0-9฀-๿]'))))
               AS scores,
             len(list_filter(columns, c -> trim(c) <> '')) = 0
               AND len(rows) > 0 AS apply
      FROM table_blocks
    ),
    e AS (
      SELECT id, apply,
             list_position(scores, list_max(scores)) AS best,
             columns, rows
      FROM s
    )
    SELECT id,
           md5(array_to_string(
             CASE WHEN apply THEN rows[best] ELSE columns END, '|'))
             AS header_fp,
           CAST(len(CASE WHEN apply
                    THEN list_slice(rows, best + 1, len(rows))
                    ELSE rows END) AS BIGINT) AS n_rows
    FROM e
    ORDER BY id
    """,
)
def tables_header_election(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = promote_first_row_header(elect_header(table_blocks(spark, sf_dir)))
    return t.select(
        "id",
        F.md5(F.concat_ws("|", "columns")).alias("header_fp"),
        F.size("rows").cast("bigint").alias("n_rows"),
    ).orderBy("id")


# --------------------------------------------------------------------------
# J2 + J1 — content-hash dedup (deterministic first-seen winner) then
# camelot-vs-vision conflict anti-join
# --------------------------------------------------------------------------
@query(
    "tables_dedup_conflicts",
    oracle=f"""WITH {TABLE_BLOCKS_CTES},
    h AS (
      SELECT *,
             md5(regexp_replace(
               coalesce(array_to_string(flatten(rows), ''), ''),
               '\\s+', '', 'g')) AS content_hash
      FROM table_blocks
    ),
    d AS (
      SELECT *, row_number() OVER (PARTITION BY content_hash
                                   ORDER BY source_priority, id) AS rn
      FROM h
    ),
    kept AS (SELECT * FROM d WHERE rn = 1),
    cam_pages AS (
      SELECT DISTINCT doc_id, page FROM kept WHERE source = 'camelot'
    )
    SELECT id, doc_id, page, source, content_hash
    FROM kept
    WHERE source = 'camelot'
       OR NOT EXISTS (SELECT 1 FROM cam_pages c
                      WHERE c.doc_id = kept.doc_id AND c.page = kept.page)
    ORDER BY id
    """,
)
def tables_dedup_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = dedup_by_content(table_blocks(spark, sf_dir))
    t = resolve_conflicts(t)
    return t.select("id", "doc_id", "page", "source", "content_hash").orderBy("id")


# --------------------------------------------------------------------------
# W6 — embedded section rows split tables into sub-tables
# --------------------------------------------------------------------------
@query(
    "tables_subtable_split",
    oracle=f"""WITH {TABLE_BLOCKS_CTES},
    x AS (
      SELECT id, doc_id, page, columns,
             unnest(rows) AS row,
             generate_subscripts(rows, 1) - 1 AS row_idx
      FROM table_blocks
    ),
    f AS (
      SELECT *,
             regexp_matches(row[1], '^(ตาราง|Table|Section|หมวด)') AS is_hdr,
             sum(CASE WHEN regexp_matches(row[1], '^(ตาราง|Table|Section|หมวด)')
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY id ORDER BY row_idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sub_id
      FROM x
    ),
    g AS (
      SELECT id || '_sub' || CAST(sub_id AS VARCHAR) AS id,
             doc_id, page,
             count(*) AS n_rows,
             md5(string_agg(array_to_string(row, '|'), ';' ORDER BY row_idx))
               AS rows_fp
      FROM f
      WHERE NOT is_hdr
      GROUP BY f.id, doc_id, page, sub_id
    )
    SELECT id, doc_id, page, CAST(n_rows AS BIGINT) AS n_rows, rows_fp
    FROM g
    ORDER BY id
    """,
)
def tables_subtable_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = split_subtables(table_blocks(spark, sf_dir))
    rows_fp = F.md5(
        F.concat_ws(";", F.transform("rows", lambda r: F.concat_ws("|", r)))
    )
    return t.select(
        "id",
        "doc_id",
        "page",
        F.size("rows").cast("bigint").alias("n_rows"),
        rows_fp.alias("rows_fp"),
    ).orderBy("id")


# --------------------------------------------------------------------------
# A2 — trust-gated money aggregation over the exploded cell view
# --------------------------------------------------------------------------
_CELLS_CTES = f"""WITH {TABLE_BLOCKS_CTES},
    es AS (
      SELECT id, doc_id, page, numeric_trust, columns, rows,
             list_transform(list_slice(rows, 1, 3), r ->
               len(list_filter(r, c -> regexp_matches(c, '[A-Za-z0-9฀-๿]'))))
               AS scores,
             len(list_filter(columns, c -> trim(c) <> '')) = 0
               AND len(rows) > 0 AS apply
      FROM table_blocks
    ),
    elected AS MATERIALIZED (
      SELECT id, doc_id, page, numeric_trust,
             CASE WHEN apply THEN rows[list_position(scores, list_max(scores))]
                  ELSE columns END AS columns,
             CASE WHEN apply
                  THEN list_slice(rows, list_position(scores, list_max(scores)) + 1,
                                  len(rows))
                  ELSE rows END AS rows
      FROM es
    ),
    rowx AS (
      SELECT id AS table_id, doc_id, page, numeric_trust, columns,
             unnest(rows) AS row,
             generate_subscripts(rows, 1) - 1 AS row_idx
      FROM elected
    ),
    cells AS (
      SELECT table_id, doc_id, page, numeric_trust, row_idx,
             unnest(range(1, len(columns) + 1)) - 1 AS col_idx,
             columns, row
      FROM rowx
    ),
    named AS (
      SELECT table_id, doc_id, page, numeric_trust, row_idx, col_idx,
             columns[col_idx + 1] AS col_name,
             {_canon_sql("columns[col_idx + 1]")} AS canon_name,
             row[col_idx + 1] AS value
      FROM cells
    )"""


@query(
    "table_trust_aggregate",
    oracle=f"""{_CELLS_CTES}
    SELECT table_id,
           {dec_to_double_sql(f"sum({_parse_money_sql('value')})", 2)}
             AS sum_amount_in
    FROM named
    WHERE canon_name = 'amount_in' AND numeric_trust <> 'low'
      AND {_parse_money_sql("value")} IS NOT NULL
    GROUP BY table_id
    ORDER BY table_id
    """,
)
def table_trust_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = elect_header(table_blocks(spark, sf_dir))
    agg = compute_from_table(table_cells(t), "sum", "amount_in")
    return agg.select(
        "table_id",
        dec_to_double(F.col("sum_amount_in"), 2).alias("sum_amount_in"),
    ).orderBy("table_id")


# --------------------------------------------------------------------------
# F10 — transaction extraction: canonical pivot + money parse
# --------------------------------------------------------------------------
@query(
    "table_transactions",
    oracle=f"""{_CELLS_CTES},
    tx AS (
      SELECT table_id, row_idx,
             max(CASE WHEN canon_name = 'date' THEN value END) AS date_raw,
             max(CASE WHEN canon_name = 'description' THEN value END)
               AS description,
             max(CASE WHEN canon_name = 'amount_in' THEN value END) AS v_in,
             max(CASE WHEN canon_name = 'amount_out' THEN value END) AS v_out,
             max(CASE WHEN canon_name = 'balance' THEN value END) AS v_bal
      FROM named
      WHERE canon_name IS NOT NULL
      GROUP BY table_id, row_idx
    )
    SELECT table_id, CAST(row_idx AS BIGINT) AS row_idx, date_raw, description,
           {dec_to_double_sql(_parse_money_sql("v_in"), 2)} AS amount_in,
           {dec_to_double_sql(_parse_money_sql("v_out"), 2)} AS amount_out,
           {dec_to_double_sql(_parse_money_sql("v_bal"), 2)} AS balance
    FROM tx
    ORDER BY table_id, row_idx
    """,
)
def table_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = elect_header(table_blocks(spark, sf_dir))
    tx = extract_transactions(table_cells(t))
    return tx.select(
        "table_id",
        F.col("row_idx").cast("bigint").alias("row_idx"),
        "date_raw",
        "description",
        dec_to_double(F.col("amount_in"), 2).alias("amount_in"),
        dec_to_double(F.col("amount_out"), 2).alias("amount_out"),
        dec_to_double(F.col("balance"), 2).alias("balance"),
    ).orderBy("table_id", "row_idx")
