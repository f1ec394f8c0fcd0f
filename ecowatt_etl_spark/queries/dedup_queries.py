"""Deduplication queries over `documents` — exact, MinHash+LSH,
SimHash, n-gram Jaccard. All hash-verified against DuckDB oracles that
replay the identical portable arithmetic (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecowatt_etl_spark.operators.dedup import (
    BAND_ROWS,
    MINHASH_A,
    MINHASH_B,
    N_HASHES,
    SIMHASH_BITS,
    hamming32,
    jaccard,
    lsh_bands,
    minhash_signature,
    normalized_text,
    shingles,
    simhash,
)
from ecowatt_etl_spark.operators.text import HASH_PRIME
from ecowatt_etl_spark.queries.registry import query
from ecowatt_etl_spark.sources.tables import load_table

# ---- shared SQL fragments (DuckDB) ----------------------------------------
_SQL_W = "regexp_split_to_array(lower(trim(text)), '\\s+')"
_SQL_HASH = f"CAST(concat('0x', substring(md5(x), 1, 15)) AS BIGINT) % {HASH_PRIME}"
_SQL_SHINGLES = f"""
    list_distinct(
      CASE WHEN len({_SQL_W}) >= 3
           THEN list_transform(generate_series(1, len({_SQL_W}) - 2),
                               i -> {_SQL_W}[i] || ' ' || {_SQL_W}[i+1] || ' ' || {_SQL_W}[i+2])
           ELSE [array_to_string({_SQL_W}, ' ')] END)
"""


def _sql_sig(i: int) -> str:
    a, b = MINHASH_A[i], MINHASH_B[i]
    return (
        f"list_min(list_transform(sh, x -> ({a} * ({_SQL_HASH}) + {b}) % {HASH_PRIME}))"
        f" AS sig_{i}"
    )


# ---------------------------------------------------------------------------
# q50 — exact dedup
# ---------------------------------------------------------------------------
@query(
    "q50_exact_dedup",
    oracle="""
    SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
    FROM documents GROUP BY text
    """,
)
def q50_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group on the raw text, keep the smallest doc_id as
    canonical (deterministic, unlike dropDuplicates' arbitrary row).
    One hash aggregate; at 100 TB group on a text hash instead — q51."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("text").agg(
        F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_copies")
    ).select("canonical_id", "n_copies")


# ---------------------------------------------------------------------------
# q51 — hash dedup on normalized text
# ---------------------------------------------------------------------------
@query(
    "q51_hash_dedup",
    oracle="""
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS text_hash,
           MIN(doc_id) AS canonical_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def q51_hash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup on md5 of whitespace-normalized lowercase text — the
    100 TB exact-dedup shape: the shuffle key is a 32-char digest, not
    the document body, so shuffle volume is O(rows), not O(bytes)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.md5(normalized_text("text")).alias("text_hash")).agg(
        F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_copies")
    )


# ---------------------------------------------------------------------------
# q52 — MinHash signatures
# ---------------------------------------------------------------------------
@query(
    "q52_minhash_signatures",
    oracle=f"""
    WITH sh AS (SELECT doc_id, {_SQL_SHINGLES} AS sh FROM documents)
    SELECT doc_id, {", ".join(_sql_sig(i) for i in range(N_HASHES))}
    FROM sh
    """,
)
def q52_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document MinHash signature (8 fixed permutations over
    distinct 3-word shingles). Entirely scan-local — shingling and the
    min-fold are array expressions; no explode, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", *minhash_signature("text"))


# ---------------------------------------------------------------------------
# q53 — MinHash LSH candidate pairs + exact-Jaccard verification
# ---------------------------------------------------------------------------
_SQL_BANDS = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, sig_{BAND_ROWS * b} AS k1, sig_{BAND_ROWS * b + 1} AS k2 FROM sig"
    for b in range(N_HASHES // BAND_ROWS)
)


@query(
    "q53_minhash_lsh_pairs",
    oracle=f"""
    WITH sh AS (SELECT doc_id, {_SQL_SHINGLES} AS sh FROM documents),
    sig AS (SELECT doc_id, sh, {", ".join(_sql_sig(i) for i in range(N_HASHES))} FROM sh),
    bands AS ({_SQL_BANDS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2 AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           CAST(len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS DOUBLE)
             / (len(sa.sh) + len(sb.sh)
                - len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))) AS jaccard_sim
    FROM cand
    JOIN sh sa ON sa.doc_id = id_a
    JOIN sh sb ON sb.doc_id = id_b
    """,
)
def q53_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup detection, the full scale pipeline:
    signatures (scan-local) → band bucketing (the ONLY wide shuffle, on
    4-byte-ish band keys) → candidate pairs → exact-Jaccard
    verification on candidates only. The N² similarity space is never
    materialized — candidates ≈ docs sharing a band."""
    d = load_table(spark, sf_dir, "documents")
    sig = d.select("doc_id", shingles("text").alias("sh"), *minhash_signature("text"))
    bands = lsh_bands(sig.drop("sh"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.k1") == F.col("b.k1"))
            & (F.col("a.k2") == F.col("b.k2"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    sh = sig.select("doc_id", "sh")
    return (
        cand.join(sh.alias("sa"), F.col("id_a") == F.col("sa.doc_id"))
        .join(sh.alias("sb"), F.col("id_b") == F.col("sb.doc_id"))
        .select(
            "id_a", "id_b", jaccard(F.col("sa.sh"), F.col("sb.sh")).alias("jaccard_sim")
        )
    )


# ---------------------------------------------------------------------------
# q54 — n-gram Jaccard via distributed inverted index (exact, no LSH)
# ---------------------------------------------------------------------------
@query(
    "q54_ngram_jaccard_pairs",
    oracle=f"""
    WITH sh AS (SELECT doc_id, {_SQL_SHINGLES} AS sh FROM documents),
    sizes AS (SELECT doc_id, len(sh) AS n FROM sh),
    e AS (SELECT doc_id, UNNEST(sh) AS s FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard_sim
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.2
    """,
)
def q54_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs n-gram Jaccard ≥ 0.2 via an inverted shingle
    index: explode → self-equi-join on the shingle → per-pair
    intersection counts. Cost is Σ per-shingle df² — cheap while
    shingles are rare; hot shingles are exactly what the LSH path (q53)
    avoids, which is why both are exposed."""
    d = load_table(spark, sf_dir, "documents")
    sh = d.select("doc_id", shingles("text").alias("sh"))
    sizes = sh.select("doc_id", F.size("sh").alias("n"))
    e = sh.select("doc_id", F.explode("sh").alias("s"))
    a, b = e.alias("a"), e.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("c"))
    )
    sim = (
        inter.join(sizes.alias("sa"), F.col("id_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("id_b") == F.col("sb.doc_id"))
        .select(
            "id_a",
            "id_b",
            (
                F.col("c").cast("double")
                / (F.col("sa.n") + F.col("sb.n") - F.col("c"))
            ).alias("jaccard_sim"),
        )
    )
    return sim.filter(F.col("jaccard_sim") >= 0.2)


# ---------------------------------------------------------------------------
# q55 — SimHash signatures
# ---------------------------------------------------------------------------
def _sql_simhash() -> str:
    hashes = f"list_transform({_SQL_W}, x -> {_SQL_HASH})"
    bit_terms = []
    for j in range(SIMHASH_BITS):
        bit_sum = (
            f"list_sum(list_transform({hashes}, "
            f"h -> CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END))"
        )
        bit_terms.append(f"CASE WHEN {bit_sum} > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END")
    return "(" + " + ".join(bit_terms) + ")"


@query(
    "q55_simhash",
    oracle=f"SELECT doc_id, {_sql_simhash()} AS simhash FROM documents",
)
def q55_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document — scan-local (per-bit ±1 folds over
    the token-hash array, no explode). Near-dup = small Hamming
    distance; pairing happens in q56 via byte-band LSH."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", simhash("text").alias("simhash"))


# ---------------------------------------------------------------------------
# q56 — SimHash near-dup pairs via byte-band blocking
# ---------------------------------------------------------------------------
_SQL_SIMHASH_BANDS = " UNION ALL ".join(
    f"SELECT doc_id, simhash, {i} AS band, (simhash >> {8 * i}) & 255 AS bkey FROM s"
    for i in range(4)
)


@query(
    "q56_simhash_neardup",
    oracle=f"""
    WITH s AS (SELECT doc_id, {_sql_simhash()} AS simhash FROM documents),
    bands AS ({_SQL_SIMHASH_BANDS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, a.simhash AS sim_a,
                      b.doc_id AS id_b, b.simhash AS sim_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, bit_count(xor(sim_a, sim_b)) AS hamming
    FROM cand
    WHERE bit_count(xor(sim_a, sim_b)) <= 6
    """,
)
def q56_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 6 of 32) with 4×8-bit band
    blocking: a pair within distance d must agree exactly on ≥1 byte
    band when d < 4 bands — the classic pigeonhole LSH for Hamming
    space. Only band-colliding pairs are compared."""
    d = load_table(spark, sf_dir, "documents")
    s = d.select("doc_id", simhash("text").alias("simhash"))
    bands = s.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", 8 * i).bitwiseAND(F.lit(255)).alias("bkey"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", "b.band", "b.bkey")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    return cand.select(
        "id_a", "id_b", hamming32(F.col("sim_a"), F.col("sim_b")).alias("hamming")
    ).filter(F.col("hamming") <= 6)
