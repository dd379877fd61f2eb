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


# --------------------------------------------------------------------------
# html_tables_parse — §2.9 family 16: the HTML <table> parser as expressions
# --------------------------------------------------------------------------

from data_ingestion_din_spark.functions.analysis import tokens  # noqa: E402
from data_ingestion_din_spark.functions.hashing import h64, h64_sql  # noqa: E402
from data_ingestion_din_spark.operators.html_tables import (  # noqa: E402
    CELL_RE,
    ROWSPAN_GT1_RE,
    SPAN_GT1_RE,
    TR_RE,
    cell_clean_sql,
    parse_html_tables,
)

_H_HTML = h64_sql("'html:' || CAST(doc_id AS VARCHAR)")
_HTML_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"


@query(
    "html_tables_parse",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_H_HTML} % 5 AS v,
             coalesce({_HTML_TOKS}[1], 'x') AS t1,
             coalesce({_HTML_TOKS}[2], 'x') AS t2,
             coalesce({_HTML_TOKS}[3], 'x') AS t3,
             coalesce({_HTML_TOKS}[4], 'x') AS t4,
             coalesce({_HTML_TOKS}[5], 'x') AS t5,
             coalesce({_HTML_TOKS}[6], 'x') AS t6
      FROM documents
    ),
    h AS (
      SELECT doc_id, v,
        '<table>'
        || CASE WHEN v = 1
             THEN '<tr><th rowspan="2">' || t1 || '</th><th>' || t2 || '</th></tr>'
             ELSE '<tr><th>' || t1 || '</th><th>' || t2 || '</th></tr>' END
        || CASE WHEN v = 4 THEN ''
             ELSE (CASE WHEN v = 3
                     THEN '<tr><td>' || t3 || '</td><td>' || t4 || '</td><td>extra</td></tr>'
                     ELSE '<tr><td>' || t3 || '</td><td>' || t4 || '</td></tr>' END)
               || (CASE WHEN v = 2
                     THEN '<tr><td colspan="2">' || t5 || '</td></tr>'
                     WHEN v = 3
                     THEN '<tr><td>' || t5 || '</td></tr>'
                     ELSE '<tr><td>' || t5 || '</td><td>' || t6 || '</td></tr>' END)
           END
        || '</table>' AS html
      FROM base
    ),
    p2 AS (
      SELECT doc_id, v,
             regexp_extract_all(html, '{TR_RE}', 1) AS trs,
             list_transform(
               regexp_extract_all(html, '{TR_RE}', 1),
               tr -> list_transform(
                 regexp_extract_all(tr, '{CELL_RE}', 1),
                 c -> {cell_clean_sql('c')})
             ) AS cells
      FROM h
    ),
    p3 AS (
      SELECT *,
             list_filter(
               list_transform(cells, (c, i) -> CASE WHEN len(c) > 0 THEN i END),
               x -> x IS NOT NULL) AS ne
      FROM p2
    ),
    p4 AS (
      SELECT doc_id, v, trs, cells, ne,
             coalesce(cells[ne[1]], CAST([] AS VARCHAR[])) AS raw_cols,
             list_transform(ne[2:], j -> cells[j]) AS raw_rows,
             trs[1:coalesce(ne[2], len(trs))] AS header_zone,
             CASE WHEN ne[2] IS NULL THEN CAST([] AS VARCHAR[])
                  ELSE trs[ne[2]+1:] END AS body_zone
      FROM p3
    ),
    p5 AS (
      SELECT doc_id, v, raw_cols, raw_rows,
             len(list_filter(header_zone,
                 tr -> regexp_matches(tr, '{ROWSPAN_GT1_RE}'))) > 0
               AS has_complex_header,
             (len(list_filter(body_zone,
                  tr -> regexp_matches(tr, '{SPAN_GT1_RE}'))) > 0
              OR (len(raw_cols) > 0 AND len(raw_rows) = 0))
               AS has_complex_body
      FROM p4
    ),
    p6 AS (
      SELECT doc_id, v, has_complex_body, has_complex_header,
             CASE WHEN has_complex_body OR len(raw_cols) = 0
                  THEN CAST([] AS VARCHAR[]) ELSE raw_cols END AS columns,
             CASE WHEN has_complex_body OR len(raw_cols) = 0
                  THEN CAST([] AS VARCHAR[][])
                  ELSE list_transform(raw_rows,
                    r -> list_transform(range(1, len(raw_cols) + 1),
                                        i -> coalesce(r[i], ''))) END AS rows
      FROM p5
    )
    SELECT doc_id, CAST(v AS INT) AS variant,
           CAST(len(columns) AS INT) AS n_cols,
           CAST(len(rows) AS INT) AS n_rows,
           has_complex_body, has_complex_header,
           coalesce(array_to_string(columns, '|'), '') AS cols_str,
           coalesce(array_to_string(
             list_transform(rows, r -> coalesce(array_to_string(r, '|'), '')),
             '~'), '') AS rows_str
    FROM p6
    ORDER BY doc_id
    """,
)
def html_tables_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 family 16 (ingestion/table_extractor.py:115-268): the HTML
    <table> → (columns, rows, complexity flags) parser restated as pure
    regexp + higher-order array expressions (operators/html_tables.py) —
    JVM-side, codegen-friendly, no Python boundary; behavioral parity
    with the reference parser is pinned by tests/test_html_tables.py.

    Fixture: each doc derives one HTML table from its first 6 tokens in
    one of 5 variants — well-formed / header-rowspan (complex header) /
    body-colspan (complex body → forced empty) / ragged rows
    (truncate+pad) / header-only (lossy) — exercising every branch of
    the parser in both engines.
    """
    from data_ingestion_din_spark.sources.tables import load_table as _lt

    docs = _lt(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    tk = lambda i: F.coalesce(F.get(toks, i - 1), F.lit("x"))  # noqa: E731
    v = (
        h64(F.concat(F.lit("html:"), F.col("doc_id").cast("string"))) % 5
    ).alias("v")
    header = F.when(
        F.col("v") == 1,
        F.concat(
            F.lit('<tr><th rowspan="2">'),
            F.col("t1"),
            F.lit("</th><th>"),
            F.col("t2"),
            F.lit("</th></tr>"),
        ),
    ).otherwise(
        F.concat(
            F.lit("<tr><th>"),
            F.col("t1"),
            F.lit("</th><th>"),
            F.col("t2"),
            F.lit("</th></tr>"),
        )
    )
    tr2 = F.when(
        F.col("v") == 3,
        F.concat(
            F.lit("<tr><td>"),
            F.col("t3"),
            F.lit("</td><td>"),
            F.col("t4"),
            F.lit("</td><td>extra</td></tr>"),
        ),
    ).otherwise(
        F.concat(
            F.lit("<tr><td>"),
            F.col("t3"),
            F.lit("</td><td>"),
            F.col("t4"),
            F.lit("</td></tr>"),
        )
    )
    tr3 = (
        F.when(
            F.col("v") == 2,
            F.concat(
                F.lit('<tr><td colspan="2">'), F.col("t5"), F.lit("</td></tr>")
            ),
        )
        .when(
            F.col("v") == 3,
            F.concat(F.lit("<tr><td>"), F.col("t5"), F.lit("</td></tr>")),
        )
        .otherwise(
            F.concat(
                F.lit("<tr><td>"),
                F.col("t5"),
                F.lit("</td><td>"),
                F.col("t6"),
                F.lit("</td></tr>"),
            )
        )
    )
    body = F.when(F.col("v") == 4, F.lit("")).otherwise(F.concat(tr2, tr3))
    base = docs.select(
        "doc_id",
        v,
        tk(1).alias("t1"),
        tk(2).alias("t2"),
        tk(3).alias("t3"),
        tk(4).alias("t4"),
        tk(5).alias("t5"),
        tk(6).alias("t6"),
    )
    h = base.select(
        "doc_id",
        "v",
        F.concat(F.lit("<table>"), header, body, F.lit("</table>")).alias(
            "html"
        ),
    )
    parsed = parse_html_tables(h)
    return parsed.select(
        "doc_id",
        F.col("v").cast("int").alias("variant"),
        F.size("columns").cast("int").alias("n_cols"),
        F.size("rows").cast("int").alias("n_rows"),
        "has_complex_body",
        "has_complex_header",
        F.array_join("columns", "|").alias("cols_str"),
        F.array_join(
            F.transform("rows", lambda r: F.array_join(r, "|")), "~"
        ).alias("rows_str"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# table_transactions_dated — §2.9 date handling, the declared engine
# upgrade over the reference's raw ``date_raw`` passthrough
# (ingestion/semantic_enricher.py:557-567): a try_to_date-style chain
# over ISO / d/M/yyyy / Thai-month forms with Buddhist-era (> 2400)
# years shifted −543. The fixture only carries ISO dates, so the query
# deterministically SYNTHESIZES the other forms (md5-selected variant
# per row, identical expression both engines) and parses them back —
# the hash gate then proves the chain recovers the original date from
# every format. Pure regexp + integer arithmetic, whole-stage codegen.
# --------------------------------------------------------------------------
from data_ingestion_din_spark.functions.dates import (  # noqa: E402
    parse_date_any_sql,
    parse_date_any_staged,
    thai_month_name,
    thai_month_name_sql,
)

_DK, _DI = parse_date_any_sql("date_variant")
_ISO_Y = "CAST(nullif(regexp_extract(date_raw, '^(\\d{4})-(\\d{2})-(\\d{2})$', 1), '') AS INT)"
_ISO_M = "CAST(nullif(regexp_extract(date_raw, '^(\\d{4})-(\\d{2})-(\\d{2})$', 2), '') AS INT)"
_ISO_D = "CAST(nullif(regexp_extract(date_raw, '^(\\d{4})-(\\d{2})-(\\d{2})$', 3), '') AS INT)"


@query(
    "table_transactions_dated",
    oracle=f"""{_CELLS_CTES},
    tx AS (
      SELECT table_id, CAST(row_idx AS BIGINT) AS row_idx,
             max(CASE WHEN canon_name = 'date' THEN value END) AS date_raw
      FROM named
      WHERE canon_name IS NOT NULL
      GROUP BY table_id, row_idx
    ),
    dv AS (
      SELECT table_id, row_idx, date_raw,
             {h64_sql("'dt:' || table_id || ':' || CAST(row_idx AS VARCHAR)")} % 4 AS v,
             {_ISO_Y} AS yy, {_ISO_M} AS mm, {_ISO_D} AS dd
      FROM tx
    ),
    var AS (
      SELECT table_id, row_idx, date_raw,
             CASE
               WHEN yy IS NULL THEN date_raw
               WHEN v = 1 THEN CAST(dd AS VARCHAR) || '/' || CAST(mm AS VARCHAR)
                              || '/' || CAST(yy AS VARCHAR)
               WHEN v = 2 THEN CAST(dd AS VARCHAR) || ' '
                              || {thai_month_name_sql("mm")} || ' '
                              || CAST(yy + 543 AS VARCHAR)
               WHEN v = 3 THEN CAST(yy + 543 AS VARCHAR) || '-'
                              || substr(date_raw, 6, 5)
               ELSE date_raw
             END AS date_variant
      FROM dv
    )
    SELECT table_id, row_idx, date_raw, date_variant,
           {_DK} AS parse_kind, {_DI} AS parsed_date
    FROM var
    ORDER BY table_id, row_idx
    """,
)
def table_transactions_dated(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = elect_header(table_blocks(spark, sf_dir))
    tx = extract_transactions(table_cells(t)).select(
        "table_id",
        F.col("row_idx").cast("bigint").alias("row_idx"),
        "date_raw",
    )
    iso_part = lambda g: F.nullif(  # noqa: E731
        F.regexp_extract(F.col("date_raw"), r"^(\d{4})-(\d{2})-(\d{2})$", g),
        F.lit(""),
    ).cast("int")
    dv = tx.select(
        "table_id",
        "row_idx",
        "date_raw",
        (
            h64(
                F.concat(
                    F.lit("dt:"),
                    F.col("table_id"),
                    F.lit(":"),
                    F.col("row_idx").cast("string"),
                )
            )
            % 4
        ).alias("v"),
        iso_part(1).alias("yy"),
        iso_part(2).alias("mm"),
        iso_part(3).alias("dd"),
    )
    s = lambda c: c.cast("string")  # noqa: E731
    variant = (
        F.when(F.col("yy").isNull(), F.col("date_raw"))
        .when(
            F.col("v") == 1,
            F.concat(
                s(F.col("dd")), F.lit("/"), s(F.col("mm")), F.lit("/"),
                s(F.col("yy")),
            ),
        )
        .when(
            F.col("v") == 2,
            F.concat(
                s(F.col("dd")), F.lit(" "),
                thai_month_name(F.col("mm")), F.lit(" "),
                s(F.col("yy") + 543),
            ),
        )
        .when(
            F.col("v") == 3,
            F.concat(
                s(F.col("yy") + 543), F.lit("-"),
                F.substring(F.col("date_raw"), 6, 5),
            ),
        )
        .otherwise(F.col("date_raw"))
    )
    var = dv.select(
        "table_id", "row_idx", "date_raw", variant.alias("date_variant")
    )
    return parse_date_any_staged(
        var, "date_variant", "parse_kind", "parsed_date"
    ).orderBy("table_id", "row_idx")


# --------------------------------------------------------------------------
# tables_column_profile — data profiling over the extracted-cell view
# (the "describe" every ingestion pipeline ships): per canonical column,
# cell count, empty rate, numeric-shaped count, distinct cardinality and
# the modal value (deterministic tie-break). One shuffle on
# (canon_name, value) with map-side partials; the per-column rollup and
# argmax reuse that partitioning's output — profile cost is bounded by
# distinct (column, value) pairs, not raw cells.
# --------------------------------------------------------------------------
_NUMERIC_CELL_RE = r"^\(?-?[0-9][0-9,]*(\.[0-9]+)?\)?( บาท)?$"


@query(
    "tables_column_profile",
    oracle=f"""{_CELLS_CTES},
    vc AS (
      SELECT canon_name, value, CAST(count(*) AS BIGINT) AS n
      FROM named GROUP BY canon_name, value
    ),
    prof AS (
      SELECT canon_name,
             CAST(sum(n) AS BIGINT) AS n_cells,
             CAST(sum(CASE WHEN trim(value) = '' THEN n ELSE 0 END)
                  AS BIGINT) AS n_empty,
             CAST(sum(CASE WHEN regexp_matches(value,
                  '{_NUMERIC_CELL_RE}') THEN n ELSE 0 END)
                  AS BIGINT) AS n_numeric,
             CAST(count(*) AS BIGINT) AS n_distinct
      FROM vc GROUP BY canon_name
    ),
    top AS (
      SELECT canon_name, value AS top_value, n AS top_n FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY canon_name ORDER BY n DESC, value
               ) AS rk
        FROM vc
      ) WHERE rk = 1
    )
    SELECT p.canon_name, p.n_cells, p.n_empty, p.n_numeric, p.n_distinct,
           t.top_value, t.top_n
    FROM prof p JOIN top t USING (canon_name)
    ORDER BY canon_name
    """,
)
def tables_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from data_ingestion_din_spark.operators.tables_ops import (
        elect_header,
        table_cells,
    )

    cells = table_cells(
        elect_header(table_blocks(spark, sf_dir))
    ).select("canon_name", "value")
    vc = cells.groupBy("canon_name", "value").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).localCheckpoint(eager=False)  # feeds the rollup AND the argmax
    prof = vc.groupBy("canon_name").agg(
        F.sum("n").cast("bigint").alias("n_cells"),
        F.sum(F.when(F.trim("value") == "", F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_empty"),
        F.sum(
            F.when(F.col("value").rlike(_NUMERIC_CELL_RE), F.col("n")).otherwise(0)
        )
        .cast("bigint")
        .alias("n_numeric"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
    )
    top = (
        vc.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("canon_name").orderBy(F.desc("n"), "value")
            ),
        )
        .filter(F.col("rk") == 1)
        .select(
            "canon_name",
            F.col("value").alias("top_value"),
            F.col("n").alias("top_n"),
        )
    )
    return prof.join(top, "canon_name").orderBy("canon_name")
