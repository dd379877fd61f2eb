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


# --------------------------------------------------------------------------
# MinHash permutation family: ONE md5 per shingle (32-bit base), then an
# affine map (a_i * h + b_i) mod (2^31 - 1) per signature slot — 8× less
# hashing than md5-per-(seed, shingle) and still bit-identical in DuckDB
# (pure BIGINT arithmetic; a_i < 2^30 keeps a_i * h < 2^62, no overflow
# under ANSI mode in either engine).
# --------------------------------------------------------------------------

MH_MOD = 2147483647  # 2^31 - 1 (Mersenne prime)
# fixed (a, b) per slot: arbitrary odd multipliers < 2^30, offsets < 2^31
MH_AB = [
    (536870909, 1000000007),
    (477218579, 1618033988),
    (368140581, 209248165),
    (297121507, 1382774917),
    (198491317, 786433213),
    (165580141, 1200000041),
    (102334155, 433494437),
    (86267571, 1650011087),
    (63245985, 225851433),
    (54018521, 1134903170),
    (39088169, 701408733),
    (24157817, 1548008755),
    (14930351, 365435296),
    (9227465, 1836311903),
    (5702887, 267914296),
    (3524577, 1771128657),
]


def h32(col: Column) -> Column:
    """32-bit integer hash (first 8 md5 hex chars) — the MinHash base."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def h32_sql(expr: str) -> str:
    """DuckDB oracle twin of :func:`h32`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


# 64-bit bit source: two 32-bit halves of ONE md5 (hex [1,9) and [9,17))
# give 64 independent bits — used by operators/dedup.simhash, which
# stages the md5 in its own projection so it is computed once per token
# (h64 is only 60 bits, which would leave 4 dead fingerprint bits).


def _mh_slot(a: int, b: int):
    # NB: the lambda must take exactly ONE argument — PySpark treats a
    # two-arg lambda in `transform` as (element, index).
    return lambda h: (a * h + b) % MH_MOD


def minhash_cols(hashed: Column, n_hashes: int) -> list[Column]:
    """Signature slots over a PRE-HASHED int array column (see
    :func:`with_minhash` for why the hashed array must be its own
    projection). One Column per slot."""
    if n_hashes > len(MH_AB):
        raise ValueError(f"at most {len(MH_AB)} minhash slots supported")
    return [
        F.array_min(F.transform(hashed, _mh_slot(*MH_AB[i]))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]


def with_minhash(
    df, shingles: Column, n_hashes: int, keep: list[str] | None = None
):
    """Append MinHash signature columns ``mh0..mh{n-1}`` (plus ``keep``
    columns) for the ``shingles`` string-array expression.

    Two projections on purpose: the md5-hashed int array is materialized
    as its OWN column first, then the n affine slot-mins read it.
    Inlining ``transform(sh, h32)`` into every slot would re-run the md5
    pass n× (measured 42 s vs 8 s for n=8 at sf0.1 — CollapseProject
    keeps this barrier because the hashed array is non-cheap and
    multiply referenced)."""
    keep = keep if keep is not None else df.columns
    staged = df.select(*keep, F.transform(shingles, h32).alias("_hb"))
    return staged.select(*keep, *minhash_cols(F.col("_hb"), n_hashes))


def minhash_slot_sql(i: int, base_expr: str = "hb") -> str:
    """DuckDB twin of slot ``i``: ``min((a_i * base + b_i) % MH_MOD)`` —
    use over a CTE that computes ``base_expr`` = :func:`h32_sql` once per
    shingle."""
    a, b = MH_AB[i]
    return f"CAST(min(({a} * {base_expr} + {b}) % {MH_MOD}) AS BIGINT) AS mh{i}"
