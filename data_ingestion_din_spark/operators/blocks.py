"""Text-block pipeline operators: reading order, noise filtering, heading
detection, section propagation, adjacent-block merge.

These are the reference's most distinctive operators (SURVEY.md §2.6) —
per-document Python loops there, window functions here. Input is a
``text_blocks`` DataFrame (FIXTURES.md B.1):

    id string, doc_id string, page int, content string, section string,
    bbox array<double>  -- (x0, y0, x1, y1)
    font_size double, is_heading boolean, intent array<string>, ...

Every operator partitions by doc_id (and page where the reference scoped
per-page): one hash shuffle on ingest repartition, then all windows reuse
that partitioning (SURVEY.md §4.2) — no per-doc driver state, arbitrary
corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from data_ingestion_din_spark.operators.sessionize import assign_groups

# Line tolerance for row-major reading order (ingestion/pdf_parser.py:173-179).
LINE_TOLERANCE_PX = 12
# Header/footer bands as fraction of page height (ingestion/pdf_parser.py:152-171).
NOISE_BAND = 0.07


def _bbox(i: int):
    return F.element_at(F.col("bbox"), i)


def reading_order(blocks: DataFrame) -> DataFrame:
    """W1 — reading-order sort key: row-major with a 12 px line-tolerance
    bucket so 2-column layouts interleave correctly
    (ingestion/pdf_parser.py:173-179: ``sort by (int(y0/12), x0)``).
    Adds ``ord`` (1-based position within the page)."""
    w = W.partitionBy("doc_id", "page").orderBy(
        F.floor(_bbox(2) / LINE_TOLERANCE_PX), _bbox(1), F.col("id")
    )
    return blocks.withColumn("ord", F.row_number().over(w))


def flag_header_footer_noise(blocks: DataFrame, page_height: float = 842.0) -> DataFrame:
    """F2 — blocks whose bbox sits in the top/bottom 7% of the page are
    noise (running headers/footers, ingestion/pdf_parser.py:152-171).
    Keeps the flag (the reference drops later, at :332)."""
    return blocks.withColumn(
        "noise",
        (_bbox(4) < NOISE_BAND * page_height)
        | (_bbox(2) > (1 - NOISE_BAND) * page_height),
    )


def page_font_median(blocks: DataFrame) -> DataFrame:
    """A1 — exact per-page median font size
    (ingestion/pdf_parser.py:297-305 uses statistics.median). Exact
    middle-rank formulation (same construction as the oracle-checked
    segment_median_order) rather than percentile_approx, so heading
    thresholds are reproducible. Adds ``page_median_font``."""
    w_rank = W.partitionBy("doc_id", "page").orderBy("font_size", "id")
    w_all = W.partitionBy("doc_id", "page")
    ranked = blocks.withColumn("_rn", F.row_number().over(w_rank)).withColumn(
        "_n", F.count(F.lit(1)).over(w_all)
    )
    mid = ranked.filter(
        (F.col("_rn") == F.floor((F.col("_n") + 1) / 2))
        | (F.col("_rn") == F.floor((F.col("_n") + 2) / 2))
    )
    med = mid.groupBy("doc_id", "page").agg(
        F.avg("font_size").alias("page_median_font")
    )
    return blocks.join(med, ["doc_id", "page"], "left")


def detect_headings(blocks_with_median: DataFrame) -> DataFrame:
    """W2 — heading detection (ingestion/pdf_parser.py:334-343): block
    font > 1.2× page median AND content < 200 chars AND not numeric-only;
    >1.5× → H1 else H2. Adds ``heading_level`` (H1|H2|null)."""
    ratio = F.col("font_size") / F.col("page_median_font")
    eligible = (
        (F.length("content") < 200)
        & ~F.col("content").rlike("^[\\d\\s\\.,%-]+$")
        & (ratio > 1.2)
    )
    return blocks_with_median.withColumn(
        "heading_level",
        F.when(eligible & (ratio > 1.5), "H1").when(eligible, "H2"),
    )


def propagate_sections(blocks: DataFrame) -> DataFrame:
    """W3 — running "current section" carried across blocks AND pages
    (ingestion/pdf_parser.py:347-351,417-434): each heading sets the
    section; every later block inherits the latest. The classic
    last-non-null window. Requires ``ord`` (from reading_order) and
    ``heading_level``."""
    w = (
        W.partitionBy("doc_id")
        .orderBy("page", "ord")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    heading_title = F.when(
        F.col("heading_level").isNotNull(), F.col("content")
    )
    return blocks.withColumn(
        "section", F.last(heading_title, ignorenulls=True).over(w)
    )


def merge_adjacent_blocks(blocks: DataFrame, max_gap: float = 15.0,
                          max_font_delta: float = 1.5) -> DataFrame:
    """W4 — merge consecutive same-section paragraph blocks when the
    vertical gap and font delta are small (ingestion/pdf_parser.py:184-254).
    Sessionization: lag → break flag → running-sum group id → groupBy
    merge (concat content, union bbox, union intents). Requires ``ord``,
    ``section``, ``bbox``, ``font_size``, ``intent``.
    """
    w = W.partitionBy("doc_id", "page").orderBy("ord")
    prev_section = F.lag("section").over(w)
    prev_y1 = F.lag(_bbox(4)).over(w)
    prev_font = F.lag("font_size").over(w)
    gap = _bbox(2) - prev_y1
    brk = (
        prev_section.isNull()
        | (F.col("section") != prev_section)
        | F.col("heading_level").isNotNull()
        | (gap < -5.0)
        | (gap > max_gap)
        | (F.abs(F.col("font_size") - prev_font) >= max_font_delta)
    )
    grouped = assign_groups(
        blocks, ["doc_id", "page"], [F.col("ord")], brk, group_col="merge_group"
    )
    # collect_list order is NOT guaranteed after a shuffle — gather
    # (ord, content) structs and sort inside the aggregate for a
    # deterministic merge (SURVEY.md §7.4.2).
    ordered_content = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("ord"), F.col("content")))
            ),
            lambda s: s.getField("content"),
        ),
        "\n",
    )
    return (
        grouped.groupBy("doc_id", "page", "merge_group")
        .agg(
            F.min("id").alias("id"),
            F.min("section").alias("section"),
            ordered_content.alias("content"),
            F.array(
                F.min(_bbox(1)), F.min(_bbox(2)), F.max(_bbox(3)), F.max(_bbox(4))
            ).alias("bbox"),
            F.avg("font_size").alias("font_size"),
            F.array_distinct(F.flatten(F.collect_list("intent"))).alias("intent"),
            F.count(F.lit(1)).alias("n_merged"),
        )
    )


def block_pipeline(blocks: DataFrame, page_height: float = 842.0) -> DataFrame:
    """The full W1→W2→W3→W4 block pipeline in reference order
    (SURVEY.md §3.1 step 1): order → noise flag → median → headings →
    sections → drop noise → merge."""
    b = reading_order(blocks)
    b = flag_header_footer_noise(b, page_height)
    b = page_font_median(b)
    b = detect_headings(b)
    b = propagate_sections(b)
    b = b.filter(~F.col("noise"))
    return merge_adjacent_blocks(b)
