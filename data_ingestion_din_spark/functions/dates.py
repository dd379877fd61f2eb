"""Multi-format / Buddhist-era date parsing (SURVEY §2.9 date handling).

The reference keeps transaction dates RAW (``date_raw``,
ingestion/semantic_enricher.py:557-567) and SURVEY names the typed
upgrade the engine should provide: a ``to_date`` attempt chain over the
formats Thai bank statements actually contain — ISO ``yyyy-MM-dd``,
``d/M/yyyy``, and ``d <thai-month-abbrev> yyyy`` — with Buddhist-era
years (> 2400) converted to CE by −543 in every branch.

Everything is regexp + integer arithmetic (no engine date-format
locales, which differ between Spark's Java patterns and DuckDB's
strptime): both twins extract (d, m, y) with the same anchored RE2/Java-
compatible patterns, apply the same BE threshold, and build the date
with ``make_date`` guarded to the valid domain. Parsed output is
rendered back to an ISO string so the cross-engine hash compares text,
not engine-specific date encodings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Thai month abbreviations, month 1..12 (the forms used in bank
# statements; dots included).
THAI_MONTHS = [
    "ม.ค.", "ก.พ.", "มี.ค.", "เม.ย.", "พ.ค.", "มิ.ย.",
    "ก.ค.", "ส.ค.", "ก.ย.", "ต.ค.", "พ.ย.", "ธ.ค.",
]

ISO_RE = r"^(\d{4})-(\d{2})-(\d{2})$"
DMY_RE = r"^(\d{1,2})/(\d{1,2})/(\d{4})$"
THAI_RE = r"^(\d{1,2}) ([^ ]+) (\d{4})$"

# Buddhist-era detection threshold: BE years in live documents are
# ≥ 2400s (CE 1957+); no CE year in banking data exceeds it.
BE_THRESHOLD = 2400


def thai_month_name(m: Column) -> Column:
    """Month number (1..12) → Thai abbreviation (for variant synthesis)."""
    out = None
    for i, name in enumerate(THAI_MONTHS, start=1):
        cond = F.when(m == i, F.lit(name))
        out = cond if out is None else out.when(m == i, F.lit(name))
    return out


def thai_month_name_sql(m: str) -> str:
    """DuckDB twin of :func:`thai_month_name`."""
    whens = " ".join(
        f"WHEN {m} = {i} THEN '{name}'"
        for i, name in enumerate(THAI_MONTHS, start=1)
    )
    return f"(CASE {whens} END)"


def _int_or_null(c: Column) -> Column:
    return F.nullif(c, F.lit("")).cast("int")


def _ce_year(y: Column) -> Column:
    return F.when(y > BE_THRESHOLD, y - 543).otherwise(y)


def _days_in_month(y: Column, m: Column) -> Column:
    """Calendar day count for (CE year, month) — the month-aware bound
    the ``valid`` guard needs: a d-in-1..31 check alone lets '30/2/2567'
    through, where Spark's non-ANSI make_date returns NULL but DuckDB's
    make_date RAISES, crashing the oracle query (cross-engine
    divergence). Both twins bound d by this same count so calendar-
    invalid inputs yield kind='none' identically."""
    leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
    return (
        F.when(m.isin(1, 3, 5, 7, 8, 10, 12), F.lit(31))
        .when(m.isin(4, 6, 9, 11), F.lit(30))
        .when(m == 2, F.when(leap, F.lit(29)).otherwise(F.lit(28)))
    )


def parse_date_any_staged(df, src: str, kind_col: str, iso_col: str):
    """Hot-path form of :func:`parse_date_any`: the nine
    ``regexp_extract`` fields are materialized ONCE in their own
    projection, then kind/iso are computed from the staged columns.
    The single-expression form repeats each regexp subtree at every
    reference (pick/valid/kind/iso → ~50 regex evaluations per row;
    measured 6.2 s vs 2.9 s steady-state for the dated-transactions
    query at sf0.1) — CollapseProject keeps this barrier because the
    staged fields are non-cheap and multiply referenced, the same
    mechanism functions/hashing.with_minhash documents."""
    t = "_pd_"
    staged = df.select(
        "*",
        _int_or_null(F.regexp_extract(F.col(src), ISO_RE, 1)).alias(t + "iy"),
        _int_or_null(F.regexp_extract(F.col(src), ISO_RE, 2)).alias(t + "im"),
        _int_or_null(F.regexp_extract(F.col(src), ISO_RE, 3)).alias(t + "id"),
        _int_or_null(F.regexp_extract(F.col(src), DMY_RE, 1)).alias(t + "dd"),
        _int_or_null(F.regexp_extract(F.col(src), DMY_RE, 2)).alias(t + "dm"),
        _int_or_null(F.regexp_extract(F.col(src), DMY_RE, 3)).alias(t + "dy"),
        _int_or_null(F.regexp_extract(F.col(src), THAI_RE, 1)).alias(t + "td"),
        F.nullif(F.regexp_extract(F.col(src), THAI_RE, 2), F.lit("")).alias(
            t + "tt"
        ),
        _int_or_null(F.regexp_extract(F.col(src), THAI_RE, 3)).alias(t + "ty"),
    )
    iso_y, iso_m, iso_d = (F.col(t + c) for c in ("iy", "im", "id"))
    dmy_d, dmy_m, dmy_y = (F.col(t + c) for c in ("dd", "dm", "dy"))
    th_d, th_tok, th_y = (F.col(t + c) for c in ("td", "tt", "ty"))
    th_m = None
    for i, name in enumerate(THAI_MONTHS, start=1):
        cond = F.when(th_tok == name, F.lit(i))
        th_m = cond if th_m is None else th_m.when(th_tok == name, F.lit(i))

    def pick(a, b, c):
        return (
            F.when(iso_y.isNotNull(), a)
            .when(dmy_y.isNotNull(), b)
            .otherwise(c)
        )

    # y/m/d staged again: valid/kind/iso each reference them
    staged2 = staged.select(
        "*",
        _ce_year(pick(iso_y, dmy_y, th_y)).alias(t + "y"),
        pick(iso_m, dmy_m, th_m).alias(t + "m"),
        pick(iso_d, dmy_d, th_d).alias(t + "d"),
    )
    y, m, d = (F.col(t + c) for c in ("y", "m", "d"))
    valid = (
        y.isNotNull()
        & m.isNotNull()
        & d.isNotNull()
        & m.between(1, 12)
        & d.between(1, _days_in_month(y, m))
    )
    kind = (
        F.when(iso_y.isNotNull() & valid, F.lit("iso"))
        .when(dmy_y.isNotNull() & valid, F.lit("dmy"))
        .when(th_y.isNotNull() & valid, F.lit("thai"))
        .otherwise(F.lit("none"))
    )
    iso = F.when(valid, F.date_format(F.make_date(y, m, d), "yyyy-MM-dd"))
    out = staged2.select(
        "*", kind.alias(kind_col), iso.alias(iso_col)
    )
    return out.drop(*[c for c in out.columns if c.startswith(t)])


def parse_date_any(s: Column) -> Column:
    """Struct(kind, iso): ``kind`` ∈ iso|dmy|thai|none; ``iso`` is the
    parsed date as ``yyyy-MM-dd`` text (NULL when unparseable).
    Compact single-expression form — fine for one-off use; prefer
    :func:`parse_date_any_staged` in per-row hot paths (it evaluates
    each regexp once instead of at every reference)."""
    iso_y = _int_or_null(F.regexp_extract(s, ISO_RE, 1))
    iso_m = _int_or_null(F.regexp_extract(s, ISO_RE, 2))
    iso_d = _int_or_null(F.regexp_extract(s, ISO_RE, 3))
    dmy_d = _int_or_null(F.regexp_extract(s, DMY_RE, 1))
    dmy_m = _int_or_null(F.regexp_extract(s, DMY_RE, 2))
    dmy_y = _int_or_null(F.regexp_extract(s, DMY_RE, 3))
    th_d = _int_or_null(F.regexp_extract(s, THAI_RE, 1))
    th_tok = F.nullif(F.regexp_extract(s, THAI_RE, 2), F.lit(""))
    th_y = _int_or_null(F.regexp_extract(s, THAI_RE, 3))
    th_m = None
    for i, name in enumerate(THAI_MONTHS, start=1):
        cond = F.when(th_tok == name, F.lit(i))
        th_m = cond if th_m is None else th_m.when(th_tok == name, F.lit(i))

    def pick(a, b, c):
        return (
            F.when(iso_y.isNotNull(), a)
            .when(dmy_y.isNotNull(), b)
            .otherwise(c)
        )

    y = _ce_year(pick(iso_y, dmy_y, th_y))
    m = pick(iso_m, dmy_m, th_m)
    d = pick(iso_d, dmy_d, th_d)
    valid = (
        y.isNotNull()
        & m.isNotNull()
        & d.isNotNull()
        & m.between(1, 12)
        & d.between(1, _days_in_month(y, m))
    )
    kind = (
        F.when(iso_y.isNotNull() & valid, F.lit("iso"))
        .when(dmy_y.isNotNull() & valid, F.lit("dmy"))
        .when(th_y.isNotNull() & valid, F.lit("thai"))
        .otherwise(F.lit("none"))
    )
    iso = F.when(
        valid, F.date_format(F.make_date(y, m, d), "yyyy-MM-dd")
    )
    return F.struct(kind.alias("kind"), iso.alias("iso"))


def _sql_int(expr: str) -> str:
    return f"CAST(nullif({expr}, '') AS INT)"


def _sql_ce(y: str) -> str:
    return f"(CASE WHEN {y} > {BE_THRESHOLD} THEN {y} - 543 ELSE {y} END)"


def parse_date_any_sql(s: str) -> tuple[str, str]:
    """DuckDB twin of :func:`parse_date_any`. Returns (kind_expr,
    iso_expr) — compose into a SELECT; both reference ``{s}`` directly
    so use over a CTE column, not a complex expression."""
    iso_y = _sql_int(f"regexp_extract({s}, '{ISO_RE}', 1)")
    iso_m = _sql_int(f"regexp_extract({s}, '{ISO_RE}', 2)")
    iso_d = _sql_int(f"regexp_extract({s}, '{ISO_RE}', 3)")
    dmy_d = _sql_int(f"regexp_extract({s}, '{DMY_RE}', 1)")
    dmy_m = _sql_int(f"regexp_extract({s}, '{DMY_RE}', 2)")
    dmy_y = _sql_int(f"regexp_extract({s}, '{DMY_RE}', 3)")
    th_d = _sql_int(f"regexp_extract({s}, '{THAI_RE}', 1)")
    th_tok = f"nullif(regexp_extract({s}, '{THAI_RE}', 2), '')"
    th_y = _sql_int(f"regexp_extract({s}, '{THAI_RE}', 3)")
    whens = " ".join(
        f"WHEN {th_tok} = '{name}' THEN {i}"
        for i, name in enumerate(THAI_MONTHS, start=1)
    )
    th_m = f"(CASE {whens} END)"

    def pick(a: str, b: str, c: str) -> str:
        return (
            f"(CASE WHEN {iso_y} IS NOT NULL THEN {a} "
            f"WHEN {dmy_y} IS NOT NULL THEN {b} ELSE {c} END)"
        )

    y = _sql_ce(pick(iso_y, dmy_y, th_y))
    m = pick(iso_m, dmy_m, th_m)
    d = pick(iso_d, dmy_d, th_d)
    leap = (
        f"(({y} % 4 = 0 AND {y} % 100 <> 0) OR {y} % 400 = 0)"
    )
    dim = (
        f"(CASE WHEN {m} IN (1,3,5,7,8,10,12) THEN 31 "
        f"WHEN {m} IN (4,6,9,11) THEN 30 "
        f"WHEN {m} = 2 THEN (CASE WHEN {leap} THEN 29 ELSE 28 END) END)"
    )
    valid = (
        f"({y} IS NOT NULL AND {m} IS NOT NULL AND {d} IS NOT NULL "
        f"AND {m} BETWEEN 1 AND 12 AND {d} BETWEEN 1 AND {dim})"
    )
    kind = (
        f"(CASE WHEN {iso_y} IS NOT NULL AND {valid} THEN 'iso' "
        f"WHEN {dmy_y} IS NOT NULL AND {valid} THEN 'dmy' "
        f"WHEN {th_y} IS NOT NULL AND {valid} THEN 'thai' "
        f"ELSE 'none' END)"
    )
    iso = (
        f"(CASE WHEN {valid} "
        f"THEN strftime(make_date({y}, {m}, {d}), '%Y-%m-%d') END)"
    )
    return kind, iso
