"""Extracted-table operators: rows-as-arrays cleaning, header election,
sub-table splitting, dedup, conflict resolution, header canonicalization,
relational cell views, trust-gated aggregation.

The reference represents an extracted table as ``columns: [str]`` +
``rows: [[str]]`` (ingestion/schema.py:160-161); here a ``table_blocks``
DataFrame keeps the same shape in ArrayType columns (FIXTURES.md B.2) and
every per-table loop becomes a higher-order array expression — set-based,
no Python, codegen-friendly. The exploded ``table_cells`` view is the
bridge to real SQL over extracted content (SURVEY.md §1.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

# Header canonicalization map (ingestion/semantic_enricher.py:383-427):
# substring → canonical field, FIRST MATCH WINS in this order (the
# reference relies on dict order; the ordered when-chain preserves it).
HEADER_CANON: tuple[tuple[str, str], ...] = (
    ("วันที่", "date"),
    ("date", "date"),
    ("รายการ", "description"),
    ("description", "description"),
    ("desc", "description"),
    ("ถอน", "amount_out"),
    ("withdraw", "amount_out"),
    ("debit", "amount_out"),
    ("ฝาก", "amount_in"),
    ("deposit", "amount_in"),
    ("credit", "amount_in"),
    ("คงเหลือ", "balance"),
    ("balance", "balance"),
    ("จำนวนเงิน", "amount"),
    ("amount", "amount"),
    ("total", "amount"),
)

_MEANINGFUL_CELL = "[A-Za-z0-9฀-๿]"


def pad_and_prune(tables: DataFrame) -> DataFrame:
    """F4 — normalize ragged tables (ingestion/cleaner.py:141-207):
    pad every row to the max width, drop columns that are empty in every
    row, drop all-empty rows. Pure array expressions per table row —
    no explode, no shuffle."""
    # NB: each stage is a single select — a chained withColumn would make
    # later expressions re-evaluate against already-replaced columns.
    others = [c for c in tables.columns if c not in ("columns", "rows")]
    width = F.greatest(
        F.size("columns"),
        F.coalesce(
            F.array_max(F.transform("rows", lambda r: F.size(r))), F.lit(0)
        ),
    )
    # NB: Spark's sequence(1, 0) is DESCENDING [1, 0], not empty — every
    # index range must be guarded for the zero-width (empty table) case.
    def _range1(n):
        return F.when(n > 0, F.sequence(F.lit(1), n)).otherwise(
            F.array().cast("array<int>")
        )

    pad = lambda arr: F.transform(  # noqa: E731
        _range1(width),
        lambda i: F.coalesce(F.try_element_at(arr, i), F.lit("")),
    )
    padded = tables.select(
        *others,
        pad(F.col("columns")).alias("columns"),
        F.transform("rows", pad).alias("rows"),
    )
    # a column index is kept if its header or any cell is non-empty.
    # NB: `keep` is materialized as its own projection (`_ki`) BEFORE being
    # referenced by the pruning transforms — embedding this filter+exists
    # expression twice inside outer transform lambdas collides the nested
    # lambda variable names during analysis and silently mis-binds the
    # index (observed on Spark 4.1: a non-empty column got pruned).
    keep = F.filter(
        _range1(F.size("columns")),
        lambda i: (F.trim(F.element_at(F.col("columns"), i)) != "")
        | F.exists(
            F.col("rows"), lambda r: F.trim(F.element_at(r, i)) != ""
        ),
    )
    with_ki = padded.withColumn("_ki", keep)
    pruned = with_ki.select(
        *others,
        F.transform("_ki", lambda i: F.element_at(F.col("columns"), i)).alias(
            "columns"
        ),
        F.transform(
            F.col("rows"),
            lambda r: F.transform("_ki", lambda i: F.element_at(r, i)),
        ).alias("rows"),
    )
    return pruned.withColumn(
        "rows",
        F.filter(
            F.col("rows"),
            lambda r: F.exists(r, lambda c: F.trim(c) != ""),
        ),
    )


def junk_filter(tables: DataFrame, min_cols: int = 2, min_rows: int = 2) -> DataFrame:
    """F5 — drop junk tables (ingestion/table_extractor.py:631-633,
    715, 722-730): fewer than 2 columns, fewer than 2 rows, or no
    meaningful cell content anywhere."""
    return tables.filter(
        (F.size("columns") >= min_cols)
        & (F.size("rows") >= min_rows)
        & F.exists(
            F.col("rows"),
            lambda r: F.exists(r, lambda c: c.rlike(_MEANINGFUL_CELL)),
        )
    )


def _meaningful_count(row: Column) -> Column:
    return F.size(F.filter(row, lambda c: c.rlike(_MEANINGFUL_CELL)))


def elect_header(tables: DataFrame, scan_rows: int = 3) -> DataFrame:
    """W7 — header-row election (ingestion/table_extractor.py:528-559):
    among the first 3 rows, the one with the most meaningful cells becomes
    the header; rows above it are dropped. Ties keep the earliest row
    (the reference scans in order). Only applies when ``columns`` is
    effectively empty."""
    head = F.slice(F.col("rows"), 1, scan_rows)
    scores = F.transform(head, _meaningful_count)
    best_idx = F.array_position(scores, F.array_max(scores))  # 1-based, first max
    no_header = F.size(F.filter(F.col("columns"), lambda c: F.trim(c) != "")) == 0
    apply = no_header & (F.size("rows") > 0)
    # NB: single select — chained withColumn would re-evaluate the
    # ``no_header`` predicate against the already-replaced columns.
    others = [c for c in tables.columns if c not in ("columns", "rows")]
    return tables.select(
        *others,
        F.when(
            apply, F.try_element_at(F.col("rows"), best_idx.cast("int"))
        )
        .otherwise(F.col("columns"))
        .alias("columns"),
        F.when(
            apply,
            F.slice(
                F.col("rows"),
                (best_idx + 1).cast("int"),
                F.greatest(F.size("rows") - best_idx.cast("int"), F.lit(0)),
            ),
        )
        .otherwise(F.col("rows"))
        .alias("rows"),
    )


def promote_first_row_header(tables: DataFrame) -> DataFrame:
    """W8 — first-row-as-header inference
    (ingestion/semantic_enricher.py:466-476): if the header is empty and
    ≥ half of the first row's cells are texty (contain letters), promote
    row 0 to header."""
    first = F.try_element_at(F.col("rows"), F.lit(1))
    texty = F.size(F.filter(first, lambda c: c.rlike("[A-Za-z฀-๿]")))
    promote = (
        (F.size(F.filter(F.col("columns"), lambda c: F.trim(c) != "")) == 0)
        & (F.size("rows") > 0)
        & (texty * 2 >= F.size(first))
    )
    others = [c for c in tables.columns if c not in ("columns", "rows")]
    # single select — see elect_header note on predicate re-evaluation
    return tables.select(
        *others,
        F.when(promote, first).otherwise(F.col("columns")).alias("columns"),
        F.when(
            promote,
            F.slice(F.col("rows"), 2, F.greatest(F.size("rows") - 1, F.lit(0))),
        )
        .otherwise(F.col("rows"))
        .alias("rows"),
    )


def split_subtables(
    tables: DataFrame, header_pattern: str = "^(ตาราง|Table|Section|หมวด)"
) -> DataFrame:
    """W6 — header-row split (ingestion/table_extractor.py:316-338): rows
    matching a section-header pattern start a new sub-table. posexplode →
    running flag sum → re-group preserving row order. One shuffle keyed by
    table id."""
    exploded = tables.select(
        "id",
        "doc_id",
        "page",
        "columns",
        F.posexplode("rows").alias("row_idx", "row"),
    )
    is_header_row = F.element_at(F.col("row"), 1).rlike(header_pattern)
    w = (
        W.partitionBy("id")
        .orderBy("row_idx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    flagged = exploded.withColumn(
        "sub_id", F.sum(F.when(is_header_row, 1).otherwise(0)).over(w)
    ).filter(~is_header_row)
    ordered_rows = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("row_idx"), F.col("row")))),
        lambda s: s.getField("row"),
    )
    return (
        flagged.groupBy("id", "doc_id", "page", "columns", "sub_id")
        .agg(ordered_rows.alias("rows"))
        .withColumn(
            "id", F.concat(F.col("id"), F.lit("_sub"), F.col("sub_id"))
        )
        .drop("sub_id")
    )


def content_hash(tables: DataFrame) -> DataFrame:
    """J2 — content hash over whitespace-stripped row content
    (ingestion/table_extractor.py:98-108): md5 of all cells joined with
    whitespace removed; header NOT included (the reference dedups tables
    whose headers differ but rows match)."""
    # NB: delimiter-free join via flatten -- no per-row lambda needed, and
    # immune to the invisible-delimiter corruption this site once had (the
    # "empty" delimiters in an earlier revision were literal \x01/\x02
    # control bytes, which \s+ does not strip -- every hash was wrong).
    joined = F.concat_ws("", F.flatten(F.col("rows")))
    return tables.withColumn(
        "content_hash", F.md5(F.regexp_replace(joined, "\\s+", ""))
    )


def dedup_by_content(tables: DataFrame, priority_col: str = "source_priority") -> DataFrame:
    """J2 dedup with deterministic winner: first-seen in the reference is
    encoded as an explicit priority ordering (SURVEY.md §7.4.2) —
    row_number over (hash) ordered by (priority, id)."""
    w = W.partitionBy("content_hash").orderBy(priority_col, "id")
    return (
        content_hash(tables)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def resolve_conflicts(tables: DataFrame) -> DataFrame:
    """J1 — Camelot-vs-vision conflict resolution
    (ingestion/table_extractor.py:785-806): keep all camelot tables; keep
    vision tables only on (doc, page) pairs where camelot found nothing.
    Left anti join + unionByName."""
    camelot = tables.filter(F.col("source") == "camelot")
    vision = tables.filter(F.col("source") == "vision")
    other = tables.filter(~F.col("source").isin("camelot", "vision"))
    vision_kept = vision.join(
        camelot.select("doc_id", "page").distinct(), ["doc_id", "page"], "left_anti"
    )
    return camelot.unionByName(vision_kept).unionByName(other)


def canonical_header(col: Column) -> Column:
    """F10 header canonicalization — ordered substring map, first match
    wins (ingestion/semantic_enricher.py:383-427)."""
    lowered = F.lower(F.trim(col))
    expr = F.lit(None).cast("string")
    for needle, canon in reversed(HEADER_CANON):
        expr = F.when(lowered.contains(needle), F.lit(canon)).otherwise(expr)
    return expr


def canonicalize_headers(tables: DataFrame) -> DataFrame:
    """Adds ``canon_columns``: per-header canonical field name (null when
    unmapped), preserving position alignment with ``columns``."""
    return tables.withColumn(
        "canon_columns", F.transform(F.col("columns"), canonical_header)
    )


def table_cells(tables: DataFrame) -> DataFrame:
    """The relational bridge (SURVEY.md §1.1): explode rows-as-arrays into
    (table_id, row_idx, col_idx, col_name, canon_name, value) so real SQL
    runs over extracted table content. Cell-level rows bound memory per
    record at any table size."""
    t = canonicalize_headers(tables)
    rows = t.select(
        F.col("id").alias("table_id"),
        "doc_id",
        "page",
        "columns",
        "canon_columns",
        F.col("numeric_trust"),
        F.posexplode("rows").alias("row_idx", "row"),
    )
    return rows.select(
        "table_id",
        "doc_id",
        "page",
        "row_idx",
        "numeric_trust",
        F.posexplode(
            F.arrays_zip(
                F.col("row"),
                F.col("columns"),
                F.col("canon_columns"),
            )
        ).alias("col_idx", "z"),
    ).select(
        "table_id",
        "doc_id",
        "page",
        "row_idx",
        "col_idx",
        F.col("z.columns").alias("col_name"),
        F.col("z.canon_columns").alias("canon_name"),
        F.col("z.row").alias("value"),
        "numeric_trust",
    )


def compute_from_table(
    cells: DataFrame, op: str, canon_name: str
) -> DataFrame:
    """A2 — trust-gated numeric aggregate over a canonical column
    (ingestion/table_extractor.py:824-848): REFUSES low-trust (vision)
    tables; sums/avgs/maxes the numeric-parsed cells per table."""
    from data_ingestion_din_spark.functions.text import parse_money

    agg = {"sum": F.sum, "mean": F.avg, "max": F.max}[op]
    vals = (
        cells.filter(
            (F.col("canon_name") == canon_name)
            & (F.col("numeric_trust") != "low")
        )
        .withColumn("num", parse_money(F.col("value")))
        .filter(F.col("num").isNotNull())
    )
    return vals.groupBy("table_id").agg(agg("num").alias(f"{op}_{canon_name}"))


def extract_transactions(cells: DataFrame) -> DataFrame:
    """F10 — transaction mapping (ingestion/semantic_enricher.py:521-572):
    pivot canonical cells back to one row per (table, row_idx) with
    date/description/amount_in/amount_out/amount/balance columns."""
    from data_ingestion_din_spark.functions.text import parse_money

    mapped = cells.filter(F.col("canon_name").isNotNull())
    pivoted = (
        mapped.groupBy("table_id", "doc_id", "page", "row_idx")
        .pivot(
            "canon_name",
            ["date", "description", "amount_in", "amount_out", "amount", "balance"],
        )
        .agg(F.first("value"))
    )
    return (
        pivoted.withColumnRenamed("date", "date_raw")
        .withColumn("amount_in", parse_money(F.col("amount_in")))
        .withColumn("amount_out", parse_money(F.col("amount_out")))
        .withColumn("amount", parse_money(F.col("amount")))
        .withColumn("balance", parse_money(F.col("balance")))
    )
