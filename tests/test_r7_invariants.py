"""Round-7 invariants: LSH cap observability, session memory clamp,
connect-safe parallelism probes, and the PLANS.md freshness guard."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_lsh_cap_drop_stats_sees_degenerate_buckets(spark):
    """lsh_cap_drop_stats (r6 ADVICE) must report the share of index
    rows/buckets the fixed LSH_BUCKET_CAP drops. On a corpus where one
    band bucket collects every doc (identical text -> identical
    signature), the dropped fractions are exactly the degenerate
    bucket's share — and lsh_bands itself must drop those rows."""
    from ecowatt_etl_spark.operators.dedup import (
        LSH_BUCKET_CAP,
        N_HASHES,
        BAND_ROWS,
        lsh_bands,
        lsh_cap_drop_stats,
        minhash_from_hashes,
        shingle_hashes,
    )

    n_dup = LSH_BUCKET_CAP + 36  # every band bucket oversized
    n_uniq = 20
    rows = [(i, "the same degenerate boilerplate text here") for i in range(n_dup)]
    rows += [
        (n_dup + i, f"unique document number {i} with words {i * 7} {i * 13}")
        for i in range(n_uniq)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = minhash_from_hashes(shingle_hashes(docs))

    stats = lsh_cap_drop_stats(sig)
    n_bands = N_HASHES // BAND_ROWS
    total_rows = (n_dup + n_uniq) * n_bands
    assert abs(stats["dropped_row_frac"] - n_dup * n_bands / total_rows) < 1e-9
    assert stats["dropped_bucket_frac"] > 0

    surviving = lsh_bands(sig)
    assert surviving.filter(F.col("doc_id") < n_dup).count() == 0
    assert surviving.filter(F.col("doc_id") >= n_dup).count() == n_uniq * n_bands

    # and a clean corpus reports zero drop at the floor cap
    clean = minhash_from_hashes(
        shingle_hashes(docs.filter(F.col("doc_id") >= n_dup))
    )
    clean_stats = lsh_cap_drop_stats(clean)
    # r9 adds the closed-form kept candidate-pair volume; its value on
    # a unique-doc corpus is whatever incidental co-bucketing yields,
    # so assert only the drop keys exactly and the volume's presence
    assert clean_stats["dropped_row_frac"] == 0.0
    assert clean_stats["dropped_bucket_frac"] == 0.0
    assert clean_stats["cap"] == float(LSH_BUCKET_CAP)
    assert clean_stats["candidate_pairs"] >= 0.0
    # ...and on the degenerate corpus the dropped buckets contribute
    # NOTHING to the kept volume: every remaining bucket is size 1
    assert stats["candidate_pairs"] == 0.0


def test_lsh_cap_scales_with_corpus_size(spark):
    """r8: the cap is GREATEST(floor, ceil(N/RATIO)) — on a 1000-doc
    corpus the cap resolves to 125, so an 80-doc degenerate bucket
    (dropped by the old fixed 64 cap) is KEPT (it is 8% of the corpus,
    below the 12.5% operating ratio) while a 130-doc bucket is still
    dropped. This is the scale-invariance the r7 drift measurement
    asked for: kept/dropped is decided on corpus fraction."""
    from ecowatt_etl_spark.operators.dedup import (
        LSH_BUCKET_CAP,
        LSH_CAP_RATIO,
        N_HASHES,
        BAND_ROWS,
        lsh_bands,
        lsh_cap_drop_stats,
        minhash_from_hashes,
        shingle_hashes,
    )

    n_a, n_b, n_uniq = 80, 130, 790  # N = 1000 -> cap = 125
    rows = [(i, "boilerplate family alpha repeated text") for i in range(n_a)]
    rows += [
        (n_a + i, "boilerplate family beta other repeated text")
        for i in range(n_b)
    ]
    rows += [
        (n_a + n_b + i, f"unique document {i} tokens {i * 7} {i * 13} {i * 29}")
        for i in range(n_uniq)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = minhash_from_hashes(shingle_hashes(docs))

    n = n_a + n_b + n_uniq
    expected_cap = max(LSH_BUCKET_CAP, (n + LSH_CAP_RATIO - 1) // LSH_CAP_RATIO)
    assert expected_cap == 125

    stats = lsh_cap_drop_stats(sig)
    n_bands = N_HASHES // BAND_ROWS
    assert stats["cap"] == float(expected_cap)
    # only the 130-doc family's rows are dropped
    assert abs(stats["dropped_row_frac"] - n_b * n_bands / (n * n_bands)) < 1e-9

    surviving = lsh_bands(sig)
    assert surviving.filter(F.col("doc_id") < n_a).count() == n_a * n_bands
    assert (
        surviving.filter(
            (F.col("doc_id") >= n_a) & (F.col("doc_id") < n_a + n_b)
        ).count()
        == 0
    )


def test_driver_memory_default_is_host_clamped():
    """The 8g local-mode driver default must clamp to half of host RAM
    (r6 ADVICE: a blind 8g can refuse to start on small hosts)."""
    import os

    from ecowatt_etl_spark.session import _default_driver_mem

    got = _default_driver_mem()
    assert got.endswith("g")
    gb = int(got[:-1])
    host_gb = (
        os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") // (2 * 1024**3)
    )
    assert gb == max(1, min(8, host_gb))


def test_parallelism_probes_survive_rddless_frames(spark):
    """spread_to_parallelism / fan_out probe .rdd, which Spark Connect
    frames don't expose (r6 ADVICE). The probes must degrade to a
    no-op on ANY frame whose JVM accessors raise, never fail."""
    from ecowatt_etl_spark.operators.dedup import fan_out
    from ecowatt_etl_spark.operators.similarity import spread_to_parallelism

    df = spark.range(10)

    class RddlessFrame:
        """Proxy that mimics a connect frame: .rdd raises."""

        def __init__(self, inner):
            self._inner = inner

        @property
        def rdd(self):
            raise Exception("rdd is not supported in Spark Connect")

        def __getattr__(self, name):
            return getattr(self._inner, name)

    proxy = RddlessFrame(df)
    assert spread_to_parallelism(proxy) is proxy
    assert fan_out(proxy) is proxy
    # and the JVM path still spreads a single-split frame
    spread = spread_to_parallelism(df.coalesce(1))
    assert spread.rdd.getNumPartitions() > 1


def test_evict_session_artifacts_drains_blocks(spark):
    """evict_session_artifacts must clear every artifact cache AND let
    the ContextCleaner free the pinned localCheckpoint blocks — the
    cross-query memory pressure that slowed q42 at 100x (r6 verdict
    item 4) comes exactly from these blocks surviving family changes."""
    import time

    from ecowatt_etl_spark.queries.dedup_queries import shingle_index
    from ecowatt_etl_spark.session import evict_session_artifacts

    from tests.conftest import SF_SMOKE

    evict_session_artifacts(spark)  # start clean (other tests cache too)

    def n_blocks() -> int:
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    def drain(target: int, deadline_s: float) -> int:
        """Poll until the block count settles at/below target (the
        ContextCleaner frees weak-ref'd blocks asynchronously; late in
        a long pytest session the queue can lag well past the old 30 s
        bound — measured flaking only when run after ~500 tests)."""
        import gc
        import time as _t

        deadline = _t.monotonic() + deadline_s
        while n_blocks() > target and _t.monotonic() < deadline:
            gc.collect()  # release the py4j handles...
            spark._jvm.System.gc()  # ...then let ContextCleaner fire
            _t.sleep(0.5)
        return n_blocks()

    # settle the PRIOR tests' draining blocks before taking a baseline,
    # or the assertion below races whatever was already in flight
    drain(0, 60)
    base = n_blocks()
    e, bands = shingle_index(spark, SF_SMOKE)
    assert e.count() > 0 and bands.count() > 0
    assert n_blocks() > base, "artifact build must pin checkpoint blocks"
    del e, bands  # eviction frees blocks once consumers drop their refs

    evicted = evict_session_artifacts(spark)
    assert evicted >= 1
    final = drain(base, 90)
    assert final <= base, (
        f"pinned artifact blocks survived eviction: {final} > baseline {base}"
    )


def test_prefix_sum_matches_global_window(spark):
    """operators/scan_ops.prefix_sum (two-phase distributed scan) must
    be bit-identical to the single-task global-window cumsum it
    replaces, across bucket boundaries, sparse ids, and both
    exclusive/inclusive forms — while actually distributing (the
    in-bucket window is partitioned, so >1 task at width < range)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ecowatt_etl_spark.operators.scan_ops import prefix_sum

    # sparse, shuffled ids; values with nulls absent (counts)
    rows = [(i * 37 % 1009 + (1_000_000 if i % 5 == 0 else 0), i % 97 + 1)
            for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long")
    for exclusive in (True, False):
        got = {
            r["id"]: r["p"]
            for r in prefix_sum(
                df, "id", "v", out_col="p", bucket_width=64,
                exclusive=exclusive,
            ).collect()
        }
        w = W.orderBy("id").rowsBetween(
            W.unboundedPreceding, -1 if exclusive else 0
        )
        want = {
            r["id"]: r["p"]
            for r in df.withColumn(
                "p", F.coalesce(F.sum("v").over(w), F.lit(0))
            ).collect()
        }
        assert got == want


def test_prefix_sum_partition_cols_matches_per_key_window(spark):
    """prefix_sum(partition_cols=[...]) must restart the scan per key
    and match the per-key global-window cumsum bit-for-bit — including
    keys whose rows straddle bucket boundaries and keys with a single
    row."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ecowatt_etl_spark.operators.scan_ops import prefix_sum

    rows = [
        (f"src{i % 7}", i * 13 % 509 + (100_000 if i % 4 == 0 else 0), i % 89 + 1)
        for i in range(400)
    ] + [("lonely", 5, 42)]
    df = spark.createDataFrame(rows, "k string, id long, v long")
    got = {
        (r["k"], r["id"]): r["p"]
        for r in prefix_sum(
            df, "id", "v", out_col="p", bucket_width=32,
            partition_cols=["k"],
        ).collect()
    }
    w = (
        W.partitionBy("k")
        .orderBy("id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    want = {
        (r["k"], r["id"]): r["p"]
        for r in df.withColumn(
            "p", F.coalesce(F.sum("v").over(w), F.lit(0))
        ).collect()
    }
    assert got == want
    assert got[("lonely", 5)] == 0
