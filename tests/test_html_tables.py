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
