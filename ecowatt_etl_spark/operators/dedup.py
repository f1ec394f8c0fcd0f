"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The beyond-reference dedup surface for training-data pipelines. All
hashing is the portable md5-derived word hash (operators/text.py), so
every stage — signatures, bands, candidate pairs, verified similarity —
is replayable in the DuckDB oracle.

Scale design:
  - exact/hash dedup: one hash aggregate, shuffle on the (hashed) text.
  - MinHash LSH: per-doc signature is scan-local (higher-order
    functions over the shingle array — no explode, no shuffle); only
    the band→candidate join shuffles, on short band keys. Candidate
    verification touches candidate pairs only, never the N² space.
  - SimHash: scan-local 32-bit signature via one pass of wide
    conditional sums; near-dup pairing again via band join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ecowatt_etl_spark.operators.text import HASH_PRIME, tokens, word_hash

# Fixed MinHash permutation parameters ((a*h + b) mod P). a,b < P keeps
# a*h < 1e18 — no int64 overflow under ANSI mode.
MINHASH_A = [912838103, 735829613, 152873957, 586275101,
             301794349, 781257287, 447581617, 963154123]
MINHASH_B = [498117581, 862051993, 217094887, 679308571,
             932174461, 123985351, 564738299, 318209747]
N_HASHES = len(MINHASH_A)
BAND_ROWS = 2  # 8 hashes → 4 bands of 2: ~(s^2) band-collision curve
SIMHASH_BITS = 32


def normalized_text(col: str | Column) -> Column:
    """Canonical form for exact-hash dedup: lowercase, trim, collapse
    runs of whitespace. DuckDB twin uses regexp_replace(..., 'g')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def shingles(col: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the document.

    Built with array higher-order functions (sequence → slice →
    concat_ws) — stays inside the projection, no explode row blowup at
    shingling time. Shorter-than-n docs yield a single whole-doc
    shingle."""
    t = tokens(col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(t) - n),
        lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
    )
    whole = F.array(F.concat_ws(" ", t))
    return F.array_distinct(F.when(F.size(t) >= n, grams).otherwise(whole))


def minhash_signature(col: str | Column, n: int = 3) -> list[Column]:
    """MinHash signature: for each fixed permutation i,
    min over shingles of (a_i·h(shingle) + b_i) mod P.

    One column per hash (sig_0..sig_{k-1}) — flat columns, not an
    array, so oracles and band keys address them directly."""
    hashes = F.transform(shingles(col, n), word_hash)

    def perm(a: int, b: int):
        # closure factory: Spark HOFs introspect lambda arity, so the
        # permutation params must not appear as (default) parameters
        return lambda h: (F.lit(a) * h + F.lit(b)) % HASH_PRIME

    return [
        F.array_min(F.transform(hashes, perm(a, b))).alias(f"sig_{i}")
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]


def lsh_bands(sig_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Explode a signature frame into (id, band, k1, k2) band keys —
    the LSH bucketing: docs agreeing on ALL rows of any band become
    candidates. Join on the short band key is the only shuffle."""
    n_bands = N_HASHES // BAND_ROWS
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.col(f"sig_{BAND_ROWS * b}").alias("k1"),
                F.col(f"sig_{BAND_ROWS * b + 1}").alias("k2"),
            )
            for b in range(n_bands)
        ]
    )
    return sig_df.select(id_col, F.explode(bands).alias("b")).select(
        id_col, "b.band", "b.k1", "b.k2"
    )


def jaccard(sh_a: Column, sh_b: Column) -> Column:
    """Exact Jaccard over two distinct-shingle arrays."""
    inter = F.size(F.array_intersect(sh_a, sh_b)).cast("double")
    union = F.size(sh_a) + F.size(sh_b) - F.size(F.array_intersect(sh_a, sh_b))
    return F.try_divide(inter, union.cast("double"))


def simhash(col: str | Column) -> Column:
    """32-bit SimHash, computed scan-local in ONE expression pass:
    for each bit j, sum over tokens of ±1 by the j-th bit of the token
    hash; bit j of the result = (sum > 0).

    The per-bit sums are a fold over the token-hash array — no explode,
    no shuffle, O(tokens × bits) arithmetic inside codegen."""
    hashes = F.transform(tokens(col), word_hash)

    def bit_step(j: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    result = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        bit_sum = F.aggregate(hashes, F.lit(0).cast("long"), bit_step(j))
        result = result + F.when(bit_sum > 0, F.lit(2**j).cast("long")).otherwise(0)
    return result


def hamming32(a: Column, b: Column) -> Column:
    """Hamming distance between two 32-bit signatures."""
    return F.bit_count(a.bitwiseXOR(b))
