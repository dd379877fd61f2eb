"""URL canonicalization — the normalization a web-scale ingest runs
before URL-level dedup (CCNet / RefinedWeb group their crawl by
canonical URL before any content pass). Pure regexp/replace chain, no
UDF; the DuckDB twin restates the same steps (replacement group refs
are ``$1`` in Spark/Java and ``\\1`` in DuckDB/RE2 — the one place the
two sides' SQL strings must differ, since RE2 has no lookahead).

Steps, in order (each step's input is the previous step's output):

1. strip the fragment (``#...``);
2. lowercase the scheme+authority (ONLY up to the first path slash —
   paths and queries are case-significant);
3. drop a ``www.`` host prefix (ANCHORED to the scheme — an
   unanchored pattern would be applied globally by Spark but once by
   DuckDB, diverging on URLs that embed another URL in the query
   string, and would rewrite case-significant query text);
4. drop explicit default ports (``:443`` for https, ``:80`` for http)
   at the authority boundary;
5. remove ``utm_*`` tracking params (global), then tidy a dangling
   ``?``/``&``;
6. strip trailing path slashes.

Only the utm step can legally match more than once (Spark's
regexp_replace is always global; DuckDB needs the explicit ``'g'``
flag there) — every other pattern is anchored or single-occurrence by
construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_AUTH_RE = "^[^/]*//[^/]*"


def canonical_url(u: Column) -> Column:
    u = F.regexp_replace(u, "#.*$", "")
    auth = F.regexp_extract(u, _AUTH_RE, 0)
    u = F.concat(
        F.lower(auth), u.substr(F.length(auth) + 1, F.lit(1 << 30))
    )
    u = F.regexp_replace(u, "^(https?://)www\\.", "$1")
    u = F.regexp_replace(u, "^(https://[^/:]+):443(/|\\?|$)", "$1$2")
    u = F.regexp_replace(u, "^(http://[^/:]+):80(/|\\?|$)", "$1$2")
    u = F.regexp_replace(u, "([?&])(utm_[a-z]+=[^&]*(&|$))+", "$1")
    u = F.regexp_replace(u, "[?&]$", "")
    return F.regexp_replace(u, "/+$", "")


def canonical_url_sql(expr: str) -> str:
    """DuckDB twin of :func:`canonical_url` (RE2: \\1 group refs)."""
    u = f"regexp_replace({expr}, '#.*$', '')"
    auth = f"regexp_extract({u}, '{_AUTH_RE}')"
    u = f"(lower({auth}) || substr({u}, length({auth}) + 1))"
    u = f"regexp_replace({u}, '^(https?://)www\\.', '\\1')"
    u = f"regexp_replace({u}, '^(https://[^/:]+):443(/|\\?|$)', '\\1\\2')"
    u = f"regexp_replace({u}, '^(http://[^/:]+):80(/|\\?|$)', '\\1\\2')"
    u = f"regexp_replace({u}, '([?&])(utm_[a-z]+=[^&]*(&|$))+', '\\1', 'g')"
    u = f"regexp_replace({u}, '[?&]$', '')"
    return f"regexp_replace({u}, '/+$', '')"
