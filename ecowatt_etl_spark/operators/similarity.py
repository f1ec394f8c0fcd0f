"""Embedding similarity-search operators.

Three physical strategies for cosine similarity over an
``array<float>`` column, in increasing scale order:

1. ``fold`` (q60/q61/q62 path): per-pair dot products as a
   deterministic left fold over the zipped arrays — scan-local (no
   explode, no shuffle on the vector dimension), and bit-reproducible
   across engines: float32→double promotion is exact, each IEEE-754
   multiply/add is correctly rounded, and the fold order is fixed
   (ascending array index), so Spark and the DuckDB oracle produce
   identical doubles. (An earlier exact-decimal design died on
   engine-dependent double→decimal tie rounding: embedding values are
   dyadic rationals needing up to 43 fractional digits, so any decimal
   quantization hits half-way ties that Spark rounds HALF_UP and DuckDB
   half-even.)
2. ``sign-LSH blocked`` (q62 path): random-hyperplane-style blocking on
   the sign bits of leading dimensions — candidate pairs only within a
   block; exact cosine re-verification on candidates.
3. ``matmul batch`` (q63 path): Arrow-batched Pandas UDF doing a numpy
   block matmul against a broadcast candidate matrix — the real
   throughput path (SIMD, pairwise-summed, NOT fold-order-identical),
   so it ships with a rows-only check and a tolerance parity test
   against path 1.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_fold(a: Column, b: Column) -> Column:
    """Dot product of two float-array columns as a fixed-order left
    fold: sum_i (double)a[i] * (double)b[i], accumulated in ascending
    index order. Deterministic and engine-portable (see module doc).
    DuckDB twin: list_reduce(list_prepend(0.0::DOUBLE,
    list_transform(...)), (acc, x) -> acc + x)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    """L2 norm via the same deterministic fold; sqrt is IEEE-exact, so
    the result is bit-identical in any engine."""
    return F.sqrt(dot_fold(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity — one fused scan-local expression per pair.

    try_divide, not ``/``: under ANSI mode (Spark 4 default) a plain
    division makes an all-zero embedding throw DIVIDE_BY_ZERO mid-job;
    try_divide yields NULL instead — which is also exactly what DuckDB's
    double division produces, so the oracles agree without changes."""
    return F.try_divide(dot_fold(a, b), l2_norm(a) * l2_norm(b))


def sign_block_key(embedding: Column, n_bits: int = 8) -> Column:
    """Blocking key from the sign bits of the first ``n_bits``
    dimensions — a deterministic random-hyperplane LSH (hyperplanes =
    coordinate axes). 2^n_bits buckets; cosine-close vectors agree on
    most signs, so near-dups land in the same bucket with high
    probability."""
    key = F.lit(0)
    for i in range(n_bits):
        key = key + F.when(
            F.element_at(embedding, i + 1) >= 0, F.lit(2**i)
        ).otherwise(0)
    return key.cast("int")
