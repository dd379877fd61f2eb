"""Golden-parity tests for the expression-based HTML table parser.

Expected tuples were produced by running the REFERENCE parser
(ingestion/table_extractor.py:115-268 ``parse_html_table``) on each case —
behavioral parity, including its span-territory quirk (spans in the first
body row count as header territory because ``self.rows`` is still empty
when its cells are processed) and the forced-empty lossy normalization.
"""

from __future__ import annotations

from data_ingestion_din_spark.operators.html_tables import parse_html_tables

# case -> (html, (columns, rows, has_complex_body, has_complex_header))
CASES = {
    "well_formed": (
        '<table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr>'
        '<tr><td>3</td><td>4</td></tr></table>',
        (["A", "B"], [["1", "2"], ["3", "4"]], False, False),
    ),
    "thead_tbody": (
        '<table><thead><tr><th>A</th><th>B</th></tr></thead>'
        '<tbody><tr><td>1</td><td>2</td></tr></tbody></table>',
        (["A", "B"], [["1", "2"]], False, False),
    ),
    "hdr_rowspan": (
        '<table><tr><th rowspan="2">A</th><th>B</th></tr>'
        '<tr><td>1</td><td>2</td></tr><tr><td>3</td><td>4</td></tr></table>',
        (["A", "B"], [["1", "2"], ["3", "4"]], False, True),
    ),
    "hdr_colspan": (  # colspan in header is acceptable for flat extraction
        '<table><tr><th colspan="2">A</th></tr>'
        '<tr><td>1</td><td>2</td></tr><tr><td>3</td><td>4</td></tr></table>',
        (["A"], [["1"], ["3"]], False, False),
    ),
    "tr2_colspan": (  # first body row is still "header territory"
        '<table><tr><th>A</th><th>B</th></tr><tr><td colspan="2">x</td></tr>'
        '<tr><td>3</td><td>4</td></tr></table>',
        (["A", "B"], [["x", ""], ["3", "4"]], False, False),
    ),
    "tr2_rowspan": (
        '<table><tr><th>A</th><th>B</th></tr>'
        '<tr><td rowspan="2">x</td><td>y</td></tr>'
        '<tr><td>3</td><td>4</td></tr></table>',
        (["A", "B"], [["x", "y"], ["3", "4"]], False, True),
    ),
    "body_colspan": (  # complex body -> forced empty
        '<table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr>'
        '<tr><td colspan="2">x</td></tr></table>',
        ([], [], True, False),
    ),
    "body_rowspan": (
        '<table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr>'
        '<tr><td rowspan="3">x</td><td>y</td></tr></table>',
        ([], [], True, False),
    ),
    "ragged_long": (  # truncate to header width
        '<table><tr><th>A</th><th>B</th></tr>'
        '<tr><td>1</td><td>2</td><td>3</td></tr>'
        '<tr><td>5</td><td>6</td></tr></table>',
        (["A", "B"], [["1", "2"], ["5", "6"]], False, False),
    ),
    "ragged_short": (  # pad to header width
        '<table><tr><th>A</th><th>B</th></tr><tr><td>1</td></tr>'
        '<tr><td>5</td><td>6</td></tr></table>',
        (["A", "B"], [["1", ""], ["5", "6"]], False, False),
    ),
    "header_only": (  # header but no rows -> lossy
        '<table><tr><th>A</th><th>B</th></tr></table>',
        ([], [], True, False),
    ),
    "empty_table": ('<table></table>', ([], [], False, False)),
    "no_table": ('just text, no markup', ([], [], False, False)),
    "empty_row_mid": (  # cell-less <tr> skipped entirely
        '<table><tr><th>A</th><th>B</th></tr><tr></tr>'
        '<tr><td>1</td><td>2</td></tr></table>',
        (["A", "B"], [["1", "2"]], False, False),
    ),
    "whitespace": (
        '<table> <tr> <th> A </th><th>B</th></tr><tr><td> 1 </td><td>2</td>'
        '</tr><tr><td>3</td><td>4</td></tr></table>',
        (["A", "B"], [["1", "2"], ["3", "4"]], False, False),
    ),
    "multiline": (
        '<table>\n<tr>\n<th>A</th>\n<th>B</th>\n</tr>\n<tr>\n<td>1</td>\n'
        '<td>2</td>\n</tr>\n<tr><td>3</td><td>4</td></tr>\n</table>',
        (["A", "B"], [["1", "2"], ["3", "4"]], False, False),
    ),
    "body_colspan_10": (  # two-digit span value still complex (int > 1)
        '<table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr>'
        '<tr><td colspan="10">x</td></tr></table>',
        ([], [], True, False),
    ),
    "hdr_rowspan_12": (
        '<table><tr><th rowspan="12">A</th><th>B</th></tr>'
        '<tr><td>1</td><td>2</td></tr><tr><td>3</td><td>4</td></tr></table>',
        (["A", "B"], [["1", "2"], ["3", "4"]], False, True),
    ),
    "body_rowspan_100": (
        '<table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr>'
        '<tr><td rowspan="100">x</td><td>y</td></tr></table>',
        ([], [], True, False),
    ),
    "span_eq_1": (  # rowspan/colspan = 1 is NOT complex
        '<table><tr><th rowspan="1">A</th><th>B</th></tr>'
        '<tr><td>1</td><td>2</td></tr>'
        '<tr><td colspan="1">3</td><td>4</td></tr></table>',
        (["A", "B"], [["1", "2"], ["3", "4"]], False, False),
    ),
    "span_eq_01": (  # leading zeros: 01 is still 1, not complex
        '<table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr>'
        '<tr><td colspan="01">3</td><td>4</td></tr></table>',
        (["A", "B"], [["1", "2"], ["3", "4"]], False, False),
    ),
    # --- cell-text cleaning parity (_clean_thai_text + HTMLParser
    # text-node collection / entity unescape); goldens from the
    # reference parser ---
    "nested_bold": (  # nested markup disappears, text survives
        '<table><tr><th><b>A</b></th><th>B</th></tr>'
        '<tr><td><i>1</i></td><td>2</td></tr></table>',
        (["A", "B"], [["1", "2"]], False, False),
    ),
    "entities": (
        '<table><tr><th>A&amp;B</th><th>&lt;C&gt;</th></tr>'
        '<tr><td>x&#39;y</td><td>&quot;q&quot;</td></tr></table>',
        (["A&B", "<C>"], [["x'y", '"q"']], False, False),
    ),
    "double_escape": (  # one-pass unescape: &amp;lt; -> &lt;, NOT <
        '<table><tr><th>A</th><th>B</th></tr>'
        '<tr><td>&amp;lt;tag&amp;gt;</td><td>2</td></tr></table>',
        (["A", "B"], [["&lt;tag&gt;", "2"]], False, False),
    ),
    "newlines_spaces": (  # newline -> space, whitespace collapse, trim
        '<table><tr><th>A  \n B</th><th>B</th></tr>'
        '<tr><td>1\r\n2</td><td>  2  </td></tr></table>',
        (["A B", "B"], [["1 2", "2"]], False, False),
    ),
    "dot_runs": (  # '...'-runs removed; decimal points untouched
        '<table><tr><th>A</th><th>B</th></tr>'
        '<tr><td>x....</td><td>1.5</td></tr></table>',
        (["A", "B"], [["x", "1.5"]], False, False),
    ),
    "nbsp": (
        '<table><tr><th>A&nbsp;B</th><th>C</th></tr>'
        '<tr><td>1</td><td>2</td></tr></table>',
        (["A B", "C"], [["1", "2"]], False, False),
    ),
    "thai_newline": (  # newline BETWEEN Thai chars joins without a space
        '<table><tr><th>ก\nข</th><th>B</th></tr>'
        '<tr><td>1</td><td>2</td></tr></table>',
        (["กข", "B"], [["1", "2"]], False, False),
    ),
}


def test_parse_html_tables_reference_parity(spark):
    names = list(CASES)
    df = spark.createDataFrame(
        [(n, CASES[n][0]) for n in names], ["name", "html"]
    )
    out = {
        r["name"]: (
            list(r["columns"]),
            [list(x) for x in r["rows"]],
            r["has_complex_body"],
            r["has_complex_header"],
        )
        for r in parse_html_tables(df).collect()
    }
    for n in names:
        assert out[n] == CASES[n][1], f"case {n}: {out[n]} != {CASES[n][1]}"


# ---------------------------------------------------------------------------
# Fuzzed parity: 24 randomized tables (spans 1/2/10/15/120, nested tags,
# entities, dot runs, whitespace, cell-less rows, header-less tables),
# goldens produced by RUNNING the reference parser
# (ingestion/table_extractor.py parse_html_table, seed 42). Catches any
# regex-vs-HTMLParser divergence the hand-picked cases miss.
# ---------------------------------------------------------------------------
# Generated by fuzzing the REFERENCE parser (seed 42); baked-in goldens.
FUZZ_CASES = [
    ('<table><tr><th rowspan="1">bb</th><th>p...q</th></tr></table>', ([], [], True, False)),
    ('<table><tr><th rowspan="2">a</th><th>bb</th><th>a</th></tr><tr><td rowspan="120">&amp;</td><td>x1</td><td>a</td><td>bb</td></tr><tr><td rowspan="10">x1</td><td rowspan="1">a</td></tr><tr><td colspan="2">m  n</td><td rowspan="1">m  n</td></tr><tr><td>a</td><td rowspan="10">&amp;</td><td>m  n</td><td colspan="1">m  n</td></tr></table>', ([], [], True, True)),
    ('<table><tr><th colspan="1">m  n</th></tr></table>', ([], [], True, False)),
    ('<table><tr><th>x1</th><th colspan="2">m  n</th><th rowspan="10">x1</th></tr><tr></tr></table>', ([], [], True, True)),
    ('<table><tr><th>bb</th></tr><tr><td>p...q</td><td>bb</td></tr><tr></tr><tr><td rowspan="10">m  n</td></tr><tr><td rowspan="120">x1</td><td colspan="15">p...q</td><td colspan="15">&amp;</td></tr></table>', ([], [], True, False)),
    ('<table><tr><th rowspan="120">bb</th><th colspan="15"><b>t</b></th></tr><tr><td colspan="1"><b>t</b></td><td>bb</td><td>a</td></tr><tr></tr><tr><td rowspan="1">p...q</td></tr></table>', (['bb', 't'], [['t', 'bb'], ['pq', '']], False, True)),
    ('<table><tr><th>&amp;</th><th>&amp;</th><th><b>t</b></th></tr><tr></tr><tr></tr><tr><td colspan="15">m  n</td><td rowspan="1">x1</td><td>bb</td><td>p...q</td></tr><tr><td><b>t</b></td><td><b>t</b></td></tr></table>', (['&', '&', 't'], [['m n', 'x1', 'bb'], ['t', 't', '']], False, False)),
    ('<table><tr><th>x1</th></tr><tr><td>m  n</td><td>a</td><td rowspan="10">&amp;</td><td>m  n</td></tr><tr><td rowspan="120">a</td></tr></table>', ([], [], True, True)),
    ('<table><tr><th rowspan="120">m  n</th><th rowspan="1">m  n</th><th rowspan="120"><b>t</b></th></tr></table>', ([], [], True, True)),
    ('<table><tr><td><b>t</b></td></tr><tr><td colspan="15">p...q</td></tr><tr><td>&amp;</td><td rowspan="2">&amp;</td></tr><tr></tr><tr><td>a</td><td>bb</td></tr></table>', ([], [], True, False)),
    ('<table><tr></tr></table>', ([], [], False, False)),
    ('<table><tr></tr><tr><td>a</td><td>x1</td></tr></table>', ([], [], True, False)),
    ('<table><tr><th>bb</th><th>m  n</th><th rowspan="1">a</th></tr><tr><td>&amp;</td><td>m  n</td></tr></table>', (['bb', 'm n', 'a'], [['&', 'm n', '']], False, False)),
    ('<table><tr><th colspan="1">p...q</th><th rowspan="120">bb</th><th rowspan="2">&amp;</th></tr></table>', ([], [], True, True)),
    ('<table><tr><td>m  n</td></tr><tr><td>m  n</td><td rowspan="120"><b>t</b></td><td rowspan="1">m  n</td></tr><tr><td>bb</td></tr></table>', (['m n'], [['m n'], ['bb']], False, True)),
    ('<table><tr><th rowspan="1">a</th><th colspan="2">&amp;</th><th>x1</th></tr><tr><td>p...q</td><td rowspan="2">bb</td><td>a</td><td rowspan="10"><b>t</b></td></tr><tr></tr><tr></tr></table>', (['a', '&', 'x1'], [['pq', 'bb', 'a']], False, True)),
    ('<table><tr><td>a</td></tr><tr></tr><tr><td>a</td></tr><tr><td rowspan="120">&amp;</td></tr><tr><td><b>t</b></td></tr></table>', ([], [], True, False)),
    ('<table><tr><th>p...q</th><th colspan="2"><b>t</b></th><th>bb</th></tr><tr><td colspan="1">bb</td><td>p...q</td></tr><tr><td>x1</td><td rowspan="120">a</td><td><b>t</b></td></tr><tr></tr><tr><td>bb</td><td>bb</td><td>a</td><td colspan="2">x1</td></tr></table>', ([], [], True, False)),
    ('<table><tr></tr><tr><td>x1</td><td>a</td><td colspan="1">bb</td><td>p...q</td></tr><tr><td>x1</td><td colspan="15">p...q</td></tr><tr><td><b>t</b></td><td rowspan="1">m  n</td></tr><tr><td rowspan="2">a</td><td>p...q</td></tr></table>', ([], [], True, False)),
    ('<table><tr><td rowspan="1"><b>t</b></td><td>p...q</td><td rowspan="10"><b>t</b></td></tr><tr><td rowspan="2"><b>t</b></td><td colspan="1">a</td><td rowspan="2">x1</td><td rowspan="120">p...q</td></tr></table>', (['t', 'pq', 't'], [['t', 'a', 'x1']], False, True)),
    ('<table><tr><th rowspan="2">m  n</th></tr><tr><td rowspan="10">a</td><td>m  n</td><td>m  n</td></tr><tr><td rowspan="1">x1</td></tr><tr><td rowspan="1">m  n</td><td rowspan="1">bb</td><td colspan="1">x1</td></tr></table>', (['m n'], [['a'], ['x1'], ['m n']], False, True)),
    ('<table><tr><th colspan="1">&amp;</th></tr><tr><td>x1</td><td>&amp;</td></tr></table>', (['&'], [['x1']], False, False)),
    ('<table><tr></tr><tr></tr><tr><td>bb</td><td rowspan="120">x1</td></tr><tr><td>x1</td><td>x1</td><td rowspan="120"><b>t</b></td></tr><tr><td rowspan="1">x1</td></tr></table>', (['bb', 'x1'], [['x1', 'x1'], ['x1', '']], False, True)),
    ('<table><tr><th rowspan="10">&amp;</th><th colspan="1"><b>t</b></th></tr></table>', ([], [], True, True)),
]


def test_fuzzed_reference_parity(spark):
    rows = [(i, html) for i, (html, _) in enumerate(FUZZ_CASES)]
    df = spark.createDataFrame(rows, "case_id int, html string")
    out = {r.case_id: r for r in parse_html_tables(df).collect()}
    for i, (_, exp) in enumerate(FUZZ_CASES):
        cols, rws, cbody, chdr = exp
        r = out[i]
        assert list(r.columns) == cols, (i, r.columns, cols)
        assert [list(x) for x in r.rows] == rws, (i, r.rows, rws)
        assert r.has_complex_body == cbody, (i, "body")
        assert r.has_complex_header == chdr, (i, "hdr")
