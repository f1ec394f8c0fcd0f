"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The beyond-reference dedup surface for training-data pipelines. All
hashing is the portable md5-derived word hash (operators/text.py), so
every stage — signatures, bands, candidate pairs, verified similarity —
is replayable in the DuckDB oracle.

Scale design:
  - exact/hash dedup: one hash aggregate, shuffle on the (hashed) text.
  - Signatures (MinHash, SimHash) are computed EXPLODED: one
    (doc, shingle-or-token) row per element, md5 evaluated once per row
    inside whole-stage codegen, then a single hash aggregate back to
    one row per doc. An earlier design folded over arrays with
    higher-order functions to avoid the explode+shuffle — measured 15×+
    slower: HOF lambdas evaluate interpreted (outside codegen) and the
    per-permutation folds re-ran md5 over every element, so "no
    shuffle" lost badly to "codegen'd hash once". The aggregate output
    is also a reusable exchange: self-joins downstream (band pairing)
    reuse the shuffle instead of recomputing the signature pipeline.
  - Candidate pairing (LSH bands / byte bands) joins on short band
    keys; verification touches candidate pairs only, never N².
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

# Band buckets larger than this are dropped from the LSH index (the
# documented cap, mirrored in every oracle via _SQL_BANDS' QUALIFY).
# Rationale, measured on the synthetic 100x warehouse: oversized
# buckets hold a constant FRACTION of the corpus (degenerate band
# keys from short/low-entropy docs — top bucket 70 docs at 10x, 694
# at 100x), so their pair count grows QUADRATICALLY with corpus size
# (91k bucket-pairs at 10x -> 9.2M at 100x, a 101x blowup for 10x
# the data) — the one shape that kills a banded join at 100 TB. A
# bucket that collects 0.1% of a 100 TB corpus carries no
# discriminative signal; genuinely similar pairs still co-bucket in
# their other N_HASHES/BAND_ROWS-1 bands, and q219's recall audit
# MEASURES the cap's cost per similarity decile rather than assuming
# it. Standard practice in production LSH dedup.
LSH_BUCKET_CAP = 64


def normalized_text(col: str | Column) -> Column:
    """Canonical form for exact-hash dedup: lowercase, trim, collapse
    runs of whitespace. DuckDB twin uses regexp_replace(..., 'g')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def shingles(col: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the document.

    Built with array higher-order functions (sequence → slice →
    concat_ws) — pure string ops, cheap even interpreted; the expensive
    md5 hashing happens exploded (see shingle_hashes). Shorter-than-n
    docs yield a single whole-doc shingle."""
    t = tokens(col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(t) - n),
        lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
    )
    whole = F.array(F.concat_ws(" ", t))
    return F.array_distinct(F.when(F.size(t) >= n, grams).otherwise(whole))


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin to full parallelism when the scan under-splits.

    Text corpora compress hard: a parquet file far below
    maxPartitionBytes arrives as ONE scan partition, serializing every
    downstream tokenize/shingle/hash on a single core (measured: the
    whole q53 signature pipeline on 1 of 32 cores). The repartition
    moves only the raw rows once and buys scan-count× parallelism. At
    real scale the scan already has ≥ defaultParallelism file splits
    and this is a structural no-op (condition false → no exchange)."""
    try:  # JVM-only probes (no sparkContext/.rdd on Spark Connect)
        p = df.sparkSession.sparkContext.defaultParallelism
        under_split = df.rdd.getNumPartitions() < p
    except Exception:
        return df  # connect-safe: skip the optimization, never fail
    if under_split:
        return df.repartition(p)
    return df


def shingle_hashes(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, h) rows: one portable 31-bit hash per distinct shingle,
    md5 evaluated exactly once per (doc, shingle) in codegen."""
    e = fan_out(df).select(id_col, F.explode(shingles(text_col, n)).alias("s"))
    return e.select(id_col, word_hash(F.col("s")).alias("h"))


def minhash_from_hashes(e: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Signature aggregate over an existing (id, h) frame — split out
    so pipelines that materialize the exploded hashes once (q53's
    verification reuses them) don't recompute the scan+shingle+md5
    subtree per reference. Catalyst does NOT dedup identical lazy
    subtrees across join arms (measured: 16 parquet scans, zero
    ReusedExchange in the original q53 plan), so sharing must happen
    at the DataFrame level."""
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % HASH_PRIME).alias(f"sig_{i}")
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    return e.groupBy(id_col).agg(*aggs)


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """One row per doc with sig_0..sig_{k-1}: min over shingles of
    (a_i·h + b_i) mod P per fixed permutation i. Explode → hash once →
    ONE aggregate (all k mins in the same hash-agg pass, map-side
    partials); the result exchange is reused by any downstream
    self-join."""
    return minhash_from_hashes(shingle_hashes(df, id_col, text_col, n), id_col)


def lsh_bands(sig_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Explode a signature frame into (id, band, k1, k2) band keys —
    the LSH bucketing: docs agreeing on ALL rows of any band become
    candidates. Join on the short band key is the only wide shuffle.

    Buckets larger than :data:`LSH_BUCKET_CAP` are dropped here, at
    the index, so every consumer (q53 pairs, q127 incremental probe,
    q219 recall audit) inherits the skew-safe artifact — see the
    constant's docstring for the measured quadratic blowup this
    prevents. The count-over-bucket window shuffles only the 4
    short-key rows per doc, paid once at index build."""
    from pyspark.sql import Window as W

    exploded = _exploded_bands(sig_df, id_col)
    bucket = W.partitionBy("band", "k1", "k2")
    return (
        exploded.withColumn("_bsz", F.count("*").over(bucket))
        .filter(F.col("_bsz") <= LSH_BUCKET_CAP)
        .drop("_bsz")
    )


def _exploded_bands(sig_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, band, k1, k2) rows — the UNCAPPED band-key explosion shared
    by the index build and the cap-drop observability aggregate."""
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


def lsh_cap_drop_stats(
    sig_df: DataFrame, id_col: str = "doc_id"
) -> dict[str, float]:
    """Observability for :data:`LSH_BUCKET_CAP` (r6 ADVICE): the cap is
    a fixed threshold, so at growing corpus size a growing share of
    buckets can exceed it and recall would drift DOWN silently. This
    one aggregate over the band-key explosion reports the dropped
    share of index rows and of distinct buckets; bench.py publishes it
    per round (and the scale sweep per decade) next to q219's measured
    per-decile recall, so drift shows up in artifacts instead of being
    assumed away."""
    sizes = (
        _exploded_bands(sig_df, id_col)
        .groupBy("band", "k1", "k2")
        .agg(F.count("*").alias("n"))
    )
    over = F.col("n") > LSH_BUCKET_CAP
    row = sizes.agg(
        F.sum("n").alias("rows"),
        F.sum(F.when(over, F.col("n")).otherwise(0)).alias("dropped_rows"),
        F.count("*").alias("buckets"),
        F.sum(F.when(over, 1).otherwise(0)).alias("dropped_buckets"),
    ).collect()[0]
    return {
        "dropped_row_frac": (row["dropped_rows"] or 0) / max(row["rows"], 1),
        "dropped_bucket_frac": (row["dropped_buckets"] or 0)
        / max(row["buckets"], 1),
    }


def jaccard(sh_a: Column, sh_b: Column) -> Column:
    """Exact Jaccard over two distinct-shingle arrays."""
    inter = F.size(F.array_intersect(sh_a, sh_b)).cast("double")
    union = F.size(sh_a) + F.size(sh_b) - F.size(F.array_intersect(sh_a, sh_b))
    return F.try_divide(inter, union.cast("double"))


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per doc with a 32-bit SimHash: per bit j, sum over token
    occurrences of ±1 by bit j of the token hash; bit j of the result =
    (sum > 0). Explode tokens → hash once → one aggregate computing all
    32 bit-sums (commutative, order-independent) → recombine."""
    t = fan_out(df).select(id_col, F.explode(tokens(text_col)).alias("tok"))
    h = t.select(id_col, word_hash(F.col("tok")).alias("h"))
    bit_aggs = [
        F.sum(
            F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]
    g = h.groupBy(id_col).agg(*bit_aggs)
    val = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        val = val + F.when(F.col(f"b{j}") > 0, F.lit(2**j).cast("long")).otherwise(0)
    return g.select(id_col, val.alias("simhash"))


def hamming32(a: Column, b: Column) -> Column:
    """Hamming distance between two 32-bit signatures."""
    return F.bit_count(a.bitwiseXOR(b))
