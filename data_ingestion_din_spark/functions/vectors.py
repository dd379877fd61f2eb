"""Vector expressions over ``array<float>`` embedding columns.

The reference delegates vector math to Chroma + sentence-transformers
(backend/services/vector_store.py:263-341, backend/services/embeddings.py);
here cosine similarity is a native column expression (``zip_with`` +
``aggregate``) so Catalyst keeps it JVM-side — no Python in the hot path.

Two arithmetic modes:

- ``cosine`` — plain double math; fastest, for production ranking.
- ``cosine_exact`` — cross-engine-deterministic: each element is quantized
  to a 1e-6-scaled BIGINT (``floor(x * 1e6)`` — float→double is exact and
  double×1e6 + floor are IEEE-deterministic, so both engines produce the
  identical integer). Dot products over 64-dim quantized vectors stay
  < 2^53, so the integer sums are exact in either engine regardless of
  summation order; the final divide/sqrt are deterministic double ops.
  This is the oracle-comparable variant — double summation order differs
  between engines, integer summation cannot.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QUANT = 1_000_000

# Fixture/corpus embedding dimensionality — the ONE place the dimension
# lives: lsh_bucket's default projection width, the k-means oracle SQL
# builder (plans/similarity_queries.py), and the quantized-dot overflow
# bound above all derive from it, so a dims change fails loudly in one
# obvious place instead of silently breaking parity.
EMBED_DIMS = 64


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _quant(x: Column) -> Column:
    return F.floor(x.cast("double") * QUANT)


def quantize(a: Column) -> Column:
    """Quantized integer copy of a float vector (precompute once per row
    when the vector participates in many dot products)."""
    return F.transform(a, _quant)


def quant_dot(qa: Column, qb: Column) -> Column:
    """Integer dot product of two pre-quantized vectors.

    The ``aggregate(zip_with(...))`` fold is the MEASURED-fastest form,
    not a default: unrolling into a flat 64-term
    ``qa[0]*qb[0] + ... + qa[63]*qb[63]`` expression — the trick that
    cut the BPE encode 3.5x — made the pairwise-heavy consumers 3-6x
    SLOWER (dedup_semantic_kmeans 4.6 s -> 26.6 s, near_dup_lsh
    3.2 s -> 7.9 s at sf0.1): the 128 bound-checked GetArrayItems blow
    past the codegen size limits and the whole projection falls back to
    interpreted evaluation, which costs far more than the fold's
    per-element lambda (PLANS.md r6, negative result)."""
    return F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


QUANT_MILLI = 1_000
# DuckDB twin of :func:`quantize_milli` over an ``embedding`` column —
# interpolate into oracles instead of restating the transform, so the
# two engines' 1e3 quantization cannot drift (one gate arithmetic, six
# call sites: the semdedup gate, the full funnel, range search).
QUANT_MILLI_SQL = (
    "list_transform(embedding,"
    f" x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT_MILLI}) AS BIGINT))"
)


def quantize_milli(a: Column) -> Column:
    """1e3-scale quantized integer copy — the scale at which EVERY
    product of the squared-cosine gate (dot², aa·bb and their small
    integer multiples) fits int64 at dims=64, so threshold predicates
    like ``25·dot² >= 4·aa·bb`` are bit-portable with no
    decimal/hugeint divergence risk. 1e6 (:func:`quantize`) stays the
    scale for distances/rankings, where nothing squares a dot."""
    return F.transform(
        a, lambda x: F.floor(x.cast("double") * QUANT_MILLI).cast("bigint")
    )


def quant_norm(a: Column) -> Column:
    """sqrt(quantized self-dot) as double — identical arithmetic to the
    norms inside :func:`cosine_exact`, factored out for reuse."""
    q = quantize(a)
    return F.sqrt(quant_dot(q, q).cast("double"))


def _dot_quant(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _quant(x) * _quant(y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def cosine_exact(a: Column, b: Column) -> Column:
    """Cross-engine-deterministic cosine similarity (see module doc)."""
    d = _dot_quant(a, b).cast("double")
    na = F.sqrt(_dot_quant(a, a).cast("double"))
    nb = F.sqrt(_dot_quant(b, b).cast("double"))
    return d / (na * nb)


def lsh_bucket_sql(
    e: str, seed: str = "lsh", n_planes: int = 8, dims: int = EMBED_DIMS
) -> str:
    """DuckDB twin of ``operators.similarity.lsh_bucket(exact=True)``:
    per plane b, sign of Σ_i floor(e[i]·1e6) · ((h64('{seed}:b:'||i) %
    2001) − 1000), assembled into an n_planes-bit bucket int."""
    terms = []
    for b in range(n_planes):
        h = (
            f"CAST(('0x' || substr(md5('{seed}:{b}:' || CAST(i - 1 AS VARCHAR)"
            f"), 1, 15)) AS BIGINT)"
        )
        proj = (
            f"(SELECT sum(CAST(floor(CAST({e}[i] AS DOUBLE) * {QUANT}) AS BIGINT)"
            f" * (({h}) % 2001 - 1000)) FROM range(1, {dims + 1}) r(i))"
        )
        terms.append(f"(CASE WHEN {proj} >= 0 THEN {1 << b} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS INT)"


def cosine_exact_sql(a: str, b: str, dims: int = EMBED_DIMS) -> str:
    """DuckDB oracle twin of :func:`cosine_exact` (correlated over a pair
    of FLOAT[] columns): quantized-integer dot/norms, double divide."""

    def q(x: str) -> str:
        return f"CAST(floor(CAST({x} AS DOUBLE) * {QUANT}) AS BIGINT)"

    def dot_sql(x: str, y: str) -> str:
        return (
            f"(SELECT CAST(sum({q(x + '[i]')} * {q(y + '[i]')}) AS DOUBLE) "
            f"FROM range(1, {dims + 1}) r(i))"
        )

    return f"({dot_sql(a, b)} / (sqrt({dot_sql(a, a)}) * sqrt({dot_sql(b, b)})))"
