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

# LSH band-bucket skew cap — CORPUS-SCALED since round 8:
#   cap(N) = GREATEST(LSH_BUCKET_CAP, ceil(N / LSH_CAP_RATIO))
# where N is the number of docs in the signature frame. Mirrored in
# every oracle via _SQL_BANDS' QUALIFY (scalar-subquery COUNT from
# the sig CTE, integer (N+7)//8 on both engines — exact at any N).
#
# Why a cap at all (measured on the synthetic 100x warehouse):
# degenerate band keys from short/low-entropy docs collect a constant
# FRACTION of the corpus (top bucket 70 docs at 10x, 694 at 100x), so
# their pair count grows QUADRATICALLY with corpus size (91k
# bucket-pairs at 10x -> 9.2M at 100x, a 101x blowup for 10x the
# data) — the one shape that kills a banded join at 100 TB.
#
# Why the cap scales with N (r7 verdict): a FIXED cap drops a GROWING
# share of index rows as every bucket inflates proportionally with
# the corpus (measured drift 0 -> 0.14% -> 1.4% of index rows per
# decade), i.e. silent recall decay with scale. Scaling the cap at
# the gate-scale operating ratio (64 docs of a 500-doc corpus = N/8,
# the same GREATEST(floor, N/ratio) pattern as q156's refine depth)
# makes the kept/dropped decision scale-invariant: a bucket is
# dropped only when it exceeds 12.5% of the corpus — boilerplate by
# construction, not similarity signal. The trade is explicit and
# measured (SCALE.md r8): worst-case pair cost within a kept bucket
# is (N/8 choose 2) — quadratic in the limit — but the measured
# degenerate head is ~1.4% of the corpus, far below the cap, so the
# real pair volume tracks the head's (0.014N)^2, and the per-decade
# probe publishes both the drop fractions (now ~flat) and the
# candidate-pair volume so either regression is visible. Deployments
# ingesting adversarially boilerplate-heavy corpora can lower
# LSH_CAP_RATIO; q219's recall audit measures the cost per decile
# either way.
LSH_BUCKET_CAP = 64  # absolute floor: never binds below 512 docs
LSH_CAP_RATIO = 8  # gate-scale operating ratio (64/500 ~= 1/8)

# The cap as a SQL expression over a `_corpus_n` BIGINT column —
# shared by lsh_bands and the drop-stats observability aggregate.
_CAP_SQL = (
    f"GREATEST(CAST({LSH_BUCKET_CAP} AS BIGINT), "
    f"(_corpus_n + {LSH_CAP_RATIO - 1}) DIV {LSH_CAP_RATIO})"
)


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

    Buckets larger than the corpus-scaled cap
    ``GREATEST(LSH_BUCKET_CAP, ceil(N / LSH_CAP_RATIO))`` are dropped
    here, at the index, so every consumer (q53 pairs, q127 incremental
    probe, q219 recall audit) inherits the skew-safe artifact — see
    the constants' docstring for the measured quadratic blowup the cap
    prevents and the measured recall drift the scaling prevents. The
    count-over-bucket window shuffles only the 4 short-key rows per
    doc, paid once at index build; the corpus count N is one extra
    map-side-partial aggregate over the (usually checkpointed)
    signature frame, broadcast as a single row — no global window, no
    driver action."""
    from pyspark.sql import Window as W

    exploded = _exploded_bands(sig_df, id_col)
    n = sig_df.groupBy().agg(F.count("*").alias("_corpus_n"))
    bucket = W.partitionBy("band", "k1", "k2")
    return (
        exploded.withColumn("_bsz", F.count("*").over(bucket))
        .crossJoin(F.broadcast(n))
        .filter(F.col("_bsz") <= F.expr(_CAP_SQL))
        .drop("_bsz", "_corpus_n")
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
    """Observability for the corpus-scaled cap (r6 ADVICE, re-scoped
    r8): reports the dropped share of index rows and of distinct
    buckets under ``cap(N) = GREATEST(LSH_BUCKET_CAP, ceil(N/RATIO))``
    plus the resolved cap itself. bench.py publishes it per round (and
    the scale sweep per decade) next to q219's measured per-decile
    recall, so drift shows up in artifacts instead of being assumed
    away. Since the r8 scaling the curve is ~flat by construction
    (kept/dropped is decided on corpus FRACTION, not absolute size);
    a rising curve now means the corpus's boilerplate head itself
    grew, which is exactly what the metric should surface.

    The corpus count rides the same single aggregate: every doc
    contributes exactly N_HASHES/BAND_ROWS band rows, so
    N = sum(n) / n_bands — no second pass, and the per-bucket
    comparison happens driver-side over the one collected row."""
    n_bands = N_HASHES // BAND_ROWS
    sizes = (
        _exploded_bands(sig_df, id_col)
        .groupBy("band", "k1", "k2")
        .agg(F.count("*").alias("n"))
    )
    tot = sizes.groupBy().agg(F.sum("n").alias("_rows"))
    cap_col = F.expr(
        _CAP_SQL.replace("_corpus_n", f"(_rows DIV {n_bands})")
    ).alias("_cap")
    over = F.col("n") > F.col("_cap")
    row = (
        sizes.crossJoin(F.broadcast(tot.select(F.col("_rows"), cap_col)))
        .agg(
            F.sum("n").alias("rows"),
            F.sum(F.when(over, F.col("n")).otherwise(0)).alias("dropped_rows"),
            F.count("*").alias("buckets"),
            F.sum(F.when(over, 1).otherwise(0)).alias("dropped_buckets"),
            F.max("_cap").alias("cap"),
            # candidate-pair VOLUME under the scaled cap (r8 verdict
            # watch item): Σ C(n,2) over kept buckets, the closed form
            # of the banded join's output size — the quadratic head is
            # visible round-over-round without running the join
            F.sum(
                F.when(over, 0).otherwise(
                    F.expr("n * (n - 1) DIV 2").cast("long")
                )
            ).alias("cand_pairs"),
        )
        .collect()[0]
    )
    return {
        "dropped_row_frac": (row["dropped_rows"] or 0) / max(row["rows"] or 0, 1),
        "dropped_bucket_frac": (row["dropped_buckets"] or 0)
        / max(row["buckets"] or 0, 1),
        "cap": float(row["cap"] or LSH_BUCKET_CAP),
        "candidate_pairs": float(row["cand_pairs"] or 0),
    }


def jaccard(sh_a: Column, sh_b: Column) -> Column:
    """Exact Jaccard over two distinct-shingle arrays."""
    inter = F.size(F.array_intersect(sh_a, sh_b)).cast("double")
    union = F.size(sh_a) + F.size(sh_b) - F.size(F.array_intersect(sh_a, sh_b))
    return F.try_divide(inter, union.cast("double"))


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per doc with a 32-bit SimHash: per bit j, sum over the
    doc's DISTINCT word-shingle hashes of ±1 by bit j; bit j of the
    result = (sum > 0). Explode shingles → hash once → one aggregate
    computing all 32 bit-sums (commutative, order-independent) →
    recombine.

    Features are 3-gram shingles (the Manku et al. near-duplicate
    design), NOT unigram tokens — deliberately, and it matters at
    scale: a unigram-multiset signature is invariant under token
    REORDERING, so any two documents built from the same vocabulary
    multiset (template permutations, column-shuffled exports, the
    scale generator's stride-permuted replicas) collide exactly, and
    the q56 band join degenerates into quadratic identical-signature
    groups (measured at 100×: ~25M hamming-0 pairs, driver OOM).
    Shingles carry local order, so only genuinely near-duplicate TEXT
    collides."""
    h = shingle_hashes(df, id_col=id_col, text_col=text_col)
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
