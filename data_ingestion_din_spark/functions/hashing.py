"""Portable hashing expressions (cross-engine deterministic).

The reference hashes with ``hashlib.md5`` for table dedup
(ingestion/table_extractor.py:98-108) and chunk fingerprints
(backend/services/chunking.py:401-415). We keep md5 as the portable basis:
Spark ``md5()`` and DuckDB ``md5()`` return identical hex, so every derived
integer hash is identical across engines — unlike ``xxhash64``/``hash``
which are engine-specific.

``h64`` takes the first 15 hex chars (60 bits) as a non-negative BIGINT:
Spark ``conv(hex, 16, 10)``, DuckDB ``('0x' || hex)::BIGINT``. 60 bits
avoids BIGINT sign issues in either engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h64(col: Column, seed: str = "") -> Column:
    """60-bit integer hash of a string column (optionally seeded).

    Used as the permutation family for MinHash: seed ``i`` simulates the
    i-th random permutation (standard construction: h_i(x) = hash(i || x)).
    """
    seeded = F.concat(F.lit(seed), col) if seed else col
    return F.conv(F.substring(F.md5(seeded), 1, 15), 16, 10).cast("bigint")


def h64_sql(expr: str, seed: str = "") -> str:
    """DuckDB oracle twin of :func:`h64`."""
    seeded = f"'{seed}' || {expr}" if seed else expr
    return f"CAST(('0x' || substr(md5({seeded}), 1, 15)) AS BIGINT)"


def minhash(shingles: Column, n_hashes: int) -> list[Column]:
    """MinHash signature: for each of ``n_hashes`` seeded hash functions,
    the minimum hash over the shingle set. All JVM-side array expressions —
    no shuffle, no UDF. Returns one Column per signature slot."""
    # NB: the per-slot lambda must take exactly ONE argument — PySpark
    # treats a two-arg lambda in `transform` as (element, index).
    def _hasher(i: int):
        seed = f"mh{i}:"
        return lambda s: h64(s, seed)

    return [
        F.array_min(F.transform(shingles, _hasher(i))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
