"""Registry of named queries and their DuckDB oracle SQL.

Every operator the engine claims (SURVEY.md §2) is declared here as a
``(spark, sf_dir) -> DataFrame`` callable plus, where SQL-expressible, an
equivalent ANSI-SQL oracle the driver runs in DuckDB at sf0.01. Column names
are aliased identically on both sides — the driver's compare sorts columns
by name before hashing values.

Cross-engine determinism rules (applied consistently in both formulations):

- **Money/metric aggregates go through DECIMAL.** Double summation is
  order-dependent, so two engines summing in different orders drift in the
  low bits. Casting inputs to ``DECIMAL(18,4)`` (and products to
  ``DECIMAL(30,8)``) makes the arithmetic exact and associative — both
  engines produce bit-identical results; the final value is cast to DOUBLE
  (deterministic) and rounded.
- **Counts are cast to BIGINT** (DuckDB sums of INTEGER return HUGEINT).
- **Top-k / LIMIT always orders by a complete key** (unique tiebreaker) so
  ties cannot make results engine-dependent.
- **Portable hashing** uses ``md5`` (identical hex in both engines);
  numeric hashes take the first 15 hex chars as a 60-bit integer
  (Spark ``conv(_,16,10)``, DuckDB ``('0x'||_)::BIGINT``).
- **Timestamps**: Spark session TZ pinned to UTC; sub-second math uses
  integer microseconds (``unix_micros`` / ``epoch_us``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
# name -> other query name whose oracle SQL this query shares; resolved
# by resolve_oracle_refs() after ALL plan modules have imported, so a
# cross-module share (e.g. streaming_scd2_maintenance reusing the batch
# rebuild's SQL) carries no import-order dependency.
_ORACLE_REFS: dict[str, str] = {}


def query(
    name: str, oracle: str | None = None, oracle_ref: str | None = None
) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is DuckDB SQL over the fixture
    views, or None for genuinely non-SQL-expressible ops (driver then does a
    weaker rows-only check). ``oracle_ref`` names ANOTHER registered query
    whose oracle SQL this query shares verbatim — looked up lazily once the
    whole plans package has imported, never at decoration time."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        if oracle is not None and oracle_ref is not None:
            raise ValueError(f"{name}: oracle and oracle_ref are exclusive")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        elif oracle_ref is not None:
            _ORACLE_REFS[name] = oracle_ref
        return fn

    return deco


def resolve_oracle_refs() -> None:
    """Materialize every ``oracle_ref`` share into ORACLES. Called from
    ``plans/__init__`` after the registration imports; idempotent.

    Refs resolve transitively (A ref B ref C follows the chain to C's
    literal SQL) regardless of registration order, so a future chained
    share can't fail-or-succeed on module import order; cycles raise."""
    for name in _ORACLE_REFS:
        ref, seen = name, {name}
        while ref in _ORACLE_REFS:
            ref = _ORACLE_REFS[ref]
            if ref in seen:
                raise ValueError(f"{name}: oracle_ref cycle via {ref!r}")
            seen.add(ref)
        if ref not in ORACLES:
            raise KeyError(
                f"{name}: oracle_ref chain ends at {ref!r}, which is not "
                "a registered oracle"
            )
        ORACLES[name] = ORACLES[ref]
    _ORACLE_REFS.clear()
