"""Streaming ↔ batch operator parity + multimodal plumbing + ANN parity.

The streaming queries must produce the same windows/sessions as their
batch twins (same F.window / F.session_window expressions); the
numpy-matmul ANN path must agree with the exact-decimal join path.
"""

from __future__ import annotations

import math

from tests.conftest import SF_SMOKE


def _keyed(rows, keys):
    return {tuple(r[k] for k in keys): r for r in rows}


def test_stream_tumbling_matches_batch(spark):
    from ecowatt_etl_spark.queries.registry import all_queries

    qs = all_queries()
    batch = qs["q40_tumbling_window"].fn(spark, SF_SMOKE).collect()
    stream = qs["q44_stream_tumbling"].fn(spark, SF_SMOKE).collect()
    kb = _keyed(batch, ["window_start", "event_type"])
    ks = _keyed(stream, ["window_start", "event_type"])
    assert set(kb) == set(ks)
    for k in kb:
        assert kb[k]["n_events"] == ks[k]["n_events"]
        # batch uses exact-decimal sums, streaming plain double — tolerance
        assert math.isclose(kb[k]["sum_value"], ks[k]["sum_value"], rel_tol=1e-9)


def test_stream_sessions_matches_batch(spark):
    from ecowatt_etl_spark.queries.registry import all_queries

    qs = all_queries()
    batch = qs["q42_session_window"].fn(spark, SF_SMOKE).collect()
    stream = qs["q45_stream_sessions"].fn(spark, SF_SMOKE).collect()
    kb = _keyed(batch, ["user_id", "session_start"])
    ks = _keyed(stream, ["user_id", "session_start"])
    assert set(kb) == set(ks)
    for k in kb:
        assert kb[k]["n_events"] == ks[k]["n_events"]


def test_matmul_topk_matches_exact_topk(spark):
    from ecowatt_etl_spark.queries.registry import all_queries

    qs = all_queries()
    exact = qs["q61_cosine_topk"].fn(spark, SF_SMOKE).collect()
    fast = qs["q63_cosine_topk_matmul"].fn(spark, SF_SMOKE).collect()
    ke = _keyed(exact, ["query_id", "rk"])
    kf = _keyed(fast, ["query_id", "rk"])
    assert set(ke) == set(kf)
    for k in ke:
        assert ke[k]["neighbor_id"] == kf[k]["neighbor_id"], k
        # bit-exact since the r5 rework: q63 re-scores its numpy-chosen
        # candidates with q61's deterministic fold
        assert ke[k]["cosine_sim"] == kf[k]["cosine_sim"], k


def test_ivf_topk_recall_vs_exact(spark):
    """IVF is approximate: require decent recall@3 vs the brute-force
    baseline, and exact cosine values on every neighbor it does return."""
    from ecowatt_etl_spark.queries.registry import all_queries

    qs = all_queries()
    exact = qs["q61_cosine_topk"].fn(spark, SF_SMOKE).collect()
    ivf = qs["q65_ivf_topk"].fn(spark, SF_SMOKE).collect()
    exact_pairs = {(r["query_id"], r["neighbor_id"]): r["cosine_sim"] for r in exact}
    ivf_pairs = {(r["query_id"], r["neighbor_id"]): r["cosine_sim"] for r in ivf}
    assert len(ivf_pairs) > 0
    hits = set(exact_pairs) & set(ivf_pairs)
    recall = len(hits) / len(exact_pairs)
    assert recall >= 0.5, f"IVF recall@3 too low: {recall:.2f}"
    for k in hits:  # same fold ⇒ bit-identical cosine on shared pairs
        assert exact_pairs[k] == ivf_pairs[k], k


def test_ivfpq_topk_recall_vs_exact(spark):
    """IVF-PQ+refine (the headline serving path since r5): recall@3
    vs brute force at smoke scale, and — because the refine stage
    re-ranks with the same deterministic fold q61 uses — bit-identical
    cosine on every returned true neighbor. Measured smoke recall is
    0.83 (tiny-corpus routing loss; 1.00 at sf0.1, the benched scale),
    so the floor guards against codebook/refine regressions without
    pinning the training to one arithmetic path."""
    from ecowatt_etl_spark.queries.registry import all_queries

    qs = all_queries()
    exact = qs["q61_cosine_topk"].fn(spark, SF_SMOKE).collect()
    pq = qs["q156_ivfpq_topk"].fn(spark, SF_SMOKE).collect()
    exact_pairs = {(r["query_id"], r["neighbor_id"]): r["cosine_sim"] for r in exact}
    pq_pairs = {(r["query_id"], r["neighbor_id"]): r["cosine_sim"] for r in pq}
    assert len(pq_pairs) > 0
    hits = set(exact_pairs) & set(pq_pairs)
    recall = len(hits) / len(exact_pairs)
    assert recall >= 0.75, f"IVF-PQ recall@3 too low: {recall:.2f}"
    for k in hits:
        assert exact_pairs[k] == pq_pairs[k], k


def test_jsonl_failfast_raises_on_malformed(spark, tmp_path):
    """The JSONL source contract is FAILFAST: malformed lines are an
    error, not silent nulls."""
    import pytest
    from pyspark.sql import types as T

    from ecowatt_etl_spark.sources.formats import read_jsonl

    p = tmp_path / "bad.jsonl"
    p.write_text('{"a": 1}\n{not json at all\n{"a": 3}\n')
    schema = T.StructType([T.StructField("a", T.LongType(), True)])
    with pytest.raises(Exception, match="Malformed|FAILFAST|MALFORMED"):
        read_jsonl(spark, str(p), schema).collect()


def test_stats_moments_match_builtin_aggregates(spark):
    """The exact-decimal moment formulation must agree with Spark's
    built-in stddev_samp/corr to float tolerance (the builtins are
    fold-order-dependent, hence not used for the oracle check)."""
    from pyspark.sql import functions as F

    from ecowatt_etl_spark.queries.registry import all_queries
    from ecowatt_etl_spark.sources.tables import load_table

    got = {
        r["event_type"]: r
        for r in all_queries()["q92_stats_moments"].fn(spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type",
        F.floor(F.unix_micros("ts") / 1_000_000).alias("x"),
        "value",
    )
    ref = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.stddev_samp("value").alias("sd"),
            F.corr("x", "value").alias("c"),
        )
        .collect()
    }
    assert set(got) == set(ref)
    for k in got:
        assert math.isclose(got[k]["stddev_value"], ref[k]["sd"], rel_tol=1e-9), k
        assert math.isclose(got[k]["corr_ts_value"], ref[k]["c"], rel_tol=1e-6), k


def test_media_resize_and_frame_sampling(spark):
    import math

    from pyspark.sql import functions as F

    from ecowatt_etl_spark.operators import multimodal as mm

    media = mm.synthesize_media_frame(spark, 48)
    resized = mm.resize_images(media, 224, 224, resizer=mm.FakeResizer())
    assert [f.name for f in resized.schema] == [f.name for f in mm.MEDIA_SCHEMA]
    img = resized.filter("media_type='image'").select("meta.*").collect()
    assert img and all(r["width"] == 224 and r["height"] == 224 for r in img)
    # non-image rows pass through byte-identical
    aud_in = {
        r["media_id"]: bytes(r["payload"])
        for r in media.filter("media_type='audio'").collect()
    }
    aud_out = {
        r["media_id"]: bytes(r["payload"])
        for r in resized.filter("media_type='audio'").collect()
    }
    assert aud_in == aud_out

    frames = mm.sample_frames(media, 1000, grabber=mm.FakeFrameGrabber())
    per = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    vids = media.filter("media_type='video'").select("media_id", "meta.duration_ms").collect()
    assert vids
    for v in vids:
        assert per[v["media_id"]] == math.ceil(v["duration_ms"] / 1000)


def test_heavy_hitter_sketch_is_superset_of_exact(spark):
    """freqItems (KSP) may over-report but never under-report: every
    exact ≥0.1% token must appear in the sketch candidates."""
    from ecowatt_etl_spark.queries.registry import all_queries

    qs = all_queries()
    exact = {r["token"] for r in qs["q76_vocab_heavy_hitters"].fn(spark, SF_SMOKE).collect()}
    sketch = {
        r["candidate_token"]
        for r in qs["q77_heavy_hitters_sketch"].fn(spark, SF_SMOKE).collect()
    }
    assert exact, "exact heavy-hitter set should be non-empty on the corpus"
    assert exact <= sketch, exact - sketch


def test_multimodal_feature_extraction(spark):
    from ecowatt_etl_spark.operators import multimodal

    media = multimodal.synthesize_media_frame(spark, 48)
    assert media.schema == multimodal.MEDIA_SCHEMA or [f.name for f in media.schema] == [
        f.name for f in multimodal.MEDIA_SCHEMA
    ]

    # metadata-only stats never touch payload bytes
    stats = {r["media_type"]: r for r in multimodal.media_stats(media).collect()}
    assert set(stats) == {"image", "audio", "video"}
    assert stats["image"]["avg_width"] == 640.0

    # no codec installed → loud NotImplementedError through the real path
    multimodal.set_codec(None)
    import pytest

    with pytest.raises(Exception, match="NotImplementedError|no media codec"):
        multimodal.extract_features(media).collect()

    # deterministic fake codec → full Arrow batch path, stable features
    # (restored after: injected state must not leak into later tests)
    multimodal.set_codec(multimodal.FakeCodec())
    try:
        feats = multimodal.extract_features(media).collect()
        assert len(feats) == 48
        assert all(
            len(r["feature"]) == multimodal.FakeCodec.DIM for r in feats
        )
        again = multimodal.extract_features(media).collect()
        assert sorted(map(str, feats)) == sorted(map(str, again))
    finally:
        multimodal.set_codec(None)


def test_q81_oracle_literal_matches_codec_contract(spark):
    """The q81 VALUES oracle is a pin of constants derived from the
    FakeCodec + synthesize_media_frame contracts; assert (a) the
    derivation's rows appear verbatim (via repr round-trip) in the
    registered oracle string, and (b) the Spark query reproduces the
    derivation exactly — so neither the codec, the synthesizer, nor
    the literal can drift independently."""
    from ecowatt_etl_spark.queries.multimodal_queries import (
        derive_q81_oracle_rows,
    )
    from ecowatt_etl_spark.queries.registry import all_queries

    spec = all_queries()["q81_media_features"]
    assert spec.oracle is not None
    rows = derive_q81_oracle_rows()
    for mtype, n, tb, f0, fs in rows:
        assert f"('{mtype}', CAST({n} AS BIGINT), CAST({tb} AS BIGINT)" in spec.oracle
        assert repr(f0) in spec.oracle and repr(fs) in spec.oracle
    got = [
        (r["media_type"], r["n_items"], r["total_bytes"], r["avg_f0"], r["avg_f_sum"])
        for r in spec.fn(spark, SF_SMOKE).collect()
    ]
    assert got == rows


def test_stateful_totals_match_batch(spark):
    from pyspark.sql import functions as F

    from ecowatt_etl_spark.queries.registry import all_queries
    from ecowatt_etl_spark.sources.tables import load_table

    qs = all_queries()
    stream_rows = qs["q49_stream_stateful_totals"].fn(spark, SF_SMOKE).collect()
    # update-mode memory sink may emit one row per key per micro-batch;
    # the LAST emission per user carries the final running totals
    final = {}
    for r in stream_rows:
        final[r["user_id"]] = r  # later batches overwrite earlier
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    kb = {r["user_id"]: r for r in batch}
    assert set(final) == set(kb)
    for uid, r in final.items():
        assert r["n_events"] == kb[uid]["n"]
        assert math.isclose(r["sum_value"], kb[uid]["s"], rel_tol=1e-9)


def test_stream_stream_join_matches_batch(spark):
    from ecowatt_etl_spark.queries.registry import all_queries

    qs = all_queries()
    batch = {
        (r["purchase_id"], r["view_id"])
        for r in qs["q49a_interval_join"].fn(spark, SF_SMOKE).collect()
    }
    stream = {
        (r["purchase_id"], r["view_id"])
        for r in qs["q49b_stream_stream_join"].fn(spark, SF_SMOKE).collect()
    }
    assert batch == stream and len(batch) > 0


def test_grouped_map_regression_matches_exact(spark):
    from ecowatt_etl_spark.queries.registry import all_queries

    qs = all_queries()
    exact = {r["event_type"]: r for r in qs["q90_regr_by_type"].fn(spark, SF_SMOKE).collect()}
    gm = {r["event_type"]: r for r in qs["q91_regr_grouped_map"].fn(spark, SF_SMOKE).collect()}
    assert set(exact) == set(gm)
    for k in exact:
        assert exact[k]["n"] == gm[k]["n"]
        # bit-exact since the r5 rework: q91's worker runs the same
        # exact-int closed form + float routing as q90's aggregate
        assert exact[k]["slope"] == gm[k]["slope"], k
        assert exact[k]["intercept"] == gm[k]["intercept"], k


def test_checkpoint_recovery(spark, tmp_path):
    """Fault-tolerance contract: a streaming aggregation stopped after
    consuming half its input and RESTARTED from the same checkpoint
    (new StreamingQuery object — simulating a driver restart) must
    (a) not re-read already-consumed files, (b) restore its window
    state, and (c) converge to exactly the batch answer over all
    input. Complete-mode output after the restart proves (b): the
    restarted run only reads chunk 1, so chunk-0 windows can only come
    from recovered state."""
    import glob as globmod
    import shutil

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ecowatt_etl_spark.functions.exact import exact_sum
    from ecowatt_etl_spark.sources.tables import load_table
    from ecowatt_etl_spark.streaming.events_stream import (
        read_events_stream,
        stream_rollup_to_parquet,
        tumbling_counts,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    cp = str(tmp_path / "cp")
    out = str(tmp_path / "out")

    ev = load_table(spark, SF_SMOKE, "events")
    # split on event time so phase 1 and phase 2 cover disjoint windows;
    # raw file keeps ts in its original physical shape (nanos-as-long
    # or TIMESTAMP[_NTZ] micros) — sort numerically via a double view
    raw = spark.read.parquet(SF_SMOKE + "/events.parquet")
    ts_num = (
        F.col("ts")
        if isinstance(raw.schema["ts"].dataType, (T.LongType,))
        else F.col("ts").cast("timestamp").cast("double")
    )
    half_ns = float(raw.agg(F.percentile(ts_num, F.lit(0.5))).collect()[0][0])
    raw.filter(ts_num <= half_ns).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "s0")
    )
    raw.filter(ts_num > half_ns).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "s1")
    )
    shutil.copy(globmod.glob(str(tmp_path / "s0") + "/part-*.parquet")[0],
                str(in_dir / "events-0.parquet"))

    def run_once():
        agg = tumbling_counts(
            read_events_stream(spark, str(in_dir), glob="events-*.parquet")
        )
        stream_rollup_to_parquet(agg, out, "recovery_rollup", checkpoint=cp)

    run_once()  # phase 1: chunk 0 only, then stop
    phase1_keys = {
        (r["window_start"], r["event_type"])
        for r in spark.read.parquet(out).collect()
    }
    offsets_after_1 = sorted(globmod.glob(cp + "/offsets/*"))
    assert phase1_keys and len(offsets_after_1) >= 1

    shutil.copy(globmod.glob(str(tmp_path / "s1") + "/part-*.parquet")[0],
                str(in_dir / "events-1.parquet"))
    run_once()  # phase 2: RESTART from checkpoint, consume chunk 1

    # (a) restart consumed only the new file: the phase-2 offset log
    # entry exists (batch advanced) and phase-1 entries are untouched
    offsets_after_2 = sorted(globmod.glob(cp + "/offsets/*"))
    assert len(offsets_after_2) > len(offsets_after_1)

    # (c) final serving table == batch aggregate over ALL events
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), exact_sum("value", "sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .collect()
    }
    assert got == want
    # (b) every phase-1 window survives into the restarted run's
    # complete-mode output even though phase 2 only read chunk 1 —
    # they were restored from the checkpointed state store
    assert phase1_keys <= set(got)


def test_transform_with_state_live(spark):
    """transformWithStateInPandas runs LIVE since r8: the vendored
    pure-Python protobuf (streaming/proto_vendor.py) reaches the
    python workers because get_spark exported it to the env before the
    JVM launched. The running per-user totals must equal the
    applyInPandasWithState twin's final state bit-for-bit (both
    accumulate integer cents — exact under any micro-batch split).
    Skips only if no vendorable protobuf exists on this host."""
    import pytest as _pytest

    from ecowatt_etl_spark.streaming.events_stream import (
        read_events_stream,
        run_to_completion,
        stateful_totals_tws,
        stateful_user_totals,
    )
    from ecowatt_etl_spark.streaming.proto_vendor import ensure_protobuf

    if not ensure_protobuf():
        with _pytest.raises(ImportError, match="protobuf"):
            stateful_totals_tws(read_events_stream(spark, SF_SMOKE))
        _pytest.skip("no google.protobuf runtime vendorable on this host")

    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        tws = run_to_completion(
            stateful_totals_tws(read_events_stream(spark, SF_SMOKE)),
            "tws_totals",
            output_mode="update",
        )
        # update-mode memory sink keeps every emission; totals are
        # monotone in n_events, so the final state per user is the
        # max-n row (robust to collect order across micro-batches)
        def final_state(rows):
            best = {}
            for r in rows:
                cur = best.get(r["user_id"])
                if cur is None or r["n_events"] > cur[0]:
                    best[r["user_id"]] = (r["n_events"], r["sum_value"])
            return best

        got = final_state(tws.collect())
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)

    twin = run_to_completion(
        stateful_user_totals(read_events_stream(spark, SF_SMOKE)),
        "gs_totals",
        output_mode="update",
    )
    want = final_state(twin.collect())
    assert got == want and len(got) > 0


def test_tws_list_and_map_state_live(spark):
    """The vendored protobuf must carry the FULL transformWithState
    variable surface, not just ValueState: ListState and MapState use
    the protocol's Arrow-batched fetch paths (fetchWithArrow in the
    state messages), which this exercises end-to-end — per user, a
    ListState of observed event values (appendValue + get-iterator)
    and a MapState of per-event-type counts (updateValue + iterator).
    Results are pinned against a plain batch aggregation."""
    import pandas as pd
    import pytest as _pytest

    from pyspark.sql import functions as F

    from ecowatt_etl_spark.sources.tables import load_table
    from ecowatt_etl_spark.streaming.events_stream import (
        read_events_stream,
        run_to_completion,
    )
    from ecowatt_etl_spark.streaming.proto_vendor import ensure_protobuf

    if not ensure_protobuf():
        _pytest.skip("no google.protobuf runtime vendorable on this host")

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    class ListMapTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._vals = handle.getListState(
                "vals", StructType([StructField("cents", LongType())])
            )
            self._bytype = handle.getMapState(
                "bytype",
                StructType([StructField("et", StringType())]),
                StructType([StructField("n", LongType())]),
            )

        def handleInputRows(self, key, rows, timer_values):
            for pdf in rows:
                for v in pdf["value"].fillna(0.0).tolist():
                    self._vals.appendValue((int(round(v * 100)),))
                for et in pdf["event_type"].tolist():
                    cur = (
                        self._bytype.getValue((et,))
                        if self._bytype.containsKey((et,))
                        else (0,)
                    )
                    self._bytype.updateValue((et,), (cur[0] + 1,))
            n, cents = 0, 0
            for (c,) in self._vals.get():
                n += 1
                cents += c
            n_types = sum(1 for _ in self._bytype.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [cents / 100.0],
                    "n_types": [n_types],
                }
            )

        def close(self) -> None:
            pass  # state handles are Spark-owned

    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        ev = read_events_stream(spark, SF_SMOKE)
        out = ev.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=ListMapTotals(),
            outputStructType=(
                "user_id long, n_events long, sum_value double, n_types long"
            ),
            outputMode="Update",
            timeMode="None",
        )
        res = run_to_completion(out, "tws_listmap", output_mode="update")
        got = {}
        for r in res.collect():
            cur = got.get(r["user_id"])
            if cur is None or r["n_events"] > cur[0]:
                got[r["user_id"]] = (
                    r["n_events"], r["sum_value"], r["n_types"]
                )
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)

    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(
                    F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100)
                    .cast("long")
                )
                / 100.0
            ).alias("s"),
            F.count_distinct("event_type").alias("t"),
        )
    )
    want = {r["user_id"]: (r["n"], r["s"], r["t"]) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_rocksdb_state_store_provider(spark):
    """State-backend swap contract: the SAME windowed aggregation run on
    the default (HDFS-backed, heap-bound) provider and on RocksDB —
    the off-heap backend a 100 TB-state streaming job needs — must emit
    identical results; progress metrics prove RocksDB actually ran.
    (RocksDB is JVM-side rocksdbjni; unlike transformWithState it needs
    no Python protobuf.)"""
    from ecowatt_etl_spark.streaming.events_stream import (
        read_events_stream,
        run_to_completion,
        tumbling_counts,
    )

    def run(provider: str | None, name: str):
        key = "spark.sql.streaming.stateStore.providerClass"
        old = spark.conf.get(key, None)
        if provider:
            spark.conf.set(key, provider)
        try:
            agg = tumbling_counts(read_events_stream(spark, SF_SMOKE))
            # inline run (not run_to_completion) to keep the query handle
            # for progress metrics
            for q in spark.streams.active:
                if q.name == name:
                    q.stop()
            sp = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", "4")
            try:
                q = (
                    agg.writeStream.outputMode("append")
                    .format("memory")
                    .queryName(name)
                    .start()
                )
                try:
                    q.processAllAvailable()
                    progress = q.lastProgress
                finally:
                    q.stop()
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", sp)
            rows = {
                (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
                for r in spark.table(name).collect()
            }
            return rows, progress
        finally:
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)

    default_rows, _ = run(None, "ss_default")
    rocks_rows, progress = run(
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        "ss_rocksdb",
    )
    assert default_rows == rocks_rows and len(rocks_rows) > 0
    metrics = progress["stateOperators"][0].get("customMetrics", {})
    assert any("rocksdb" in k.lower() for k in metrics), metrics


def test_late_data_drop_accounting(spark, tmp_path):
    """VERY-LATE-DATA contract of windowed aggregation, measured
    against this Spark build (subtler than 'late rows are dropped').
    Three-phase replay, one file per micro-batch. The drop filter for
    batch N uses the watermark derived from event times through batch
    N-2 (one trigger MORE lag than the progress-displayed value — the
    round-5 controlled probes in SCALE.md pin this), so:
      phase A — even event_ids, full time range: seeds state and the
        watermark source (nothing emits or drops yet);
      phase B — the 50 newest odd rows: its filter watermark is still
        epoch, so B's own late rows merge into pending state silently
        and drop NOTHING, on any distribution;
      phase C — the remaining odd rows: its filter watermark is A's
        max minus the delay; every C group sits behind it (pinned by
        the assertion below on this dataset), dropped before touching
        state, and every closed window is emitted by end of replay.
    Pinned facts:
      (a) numRowsDroppedByWatermark counts dropped partial-aggregate
          GROUPS, not raw rows — map-side combine runs before the
          state-store lateness filter, so the metric equals C's
          distinct (window, event_type) count, and lateness alerting
          that reads it as a row count under-reports;
      (b) every closed window is emitted EXACTLY ONCE (no duplicate
          append keys, no re-opened windows), carrying the exact
          decimal aggregate of all rows that arrived before its
          eviction — bit-equal to the batch aggregate over phases
          A∪B below the final watermark."""
    import datetime as dt
    import glob as globmod
    import os
    import shutil

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ecowatt_etl_spark.functions.exact import exact_sum
    from ecowatt_etl_spark.sources.tables import load_table
    from ecowatt_etl_spark.streaming.events_stream import (
        read_events_stream,
        tumbling_counts,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    raw = spark.read.parquet(SF_SMOKE + "/events.parquet")
    odd = raw.filter(F.col("event_id") % 2 == 1).withColumn(
        "_rk",
        F.row_number().over(
            W.orderBy(F.col("ts").cast("timestamp").desc(), F.col("event_id"))
        ),
    )
    chunks = [
        raw.filter(F.col("event_id") % 2 == 0),  # A: seeds state + watermark
        odd.filter(F.col("_rk") <= 50).drop("_rk"),  # B: triggers eviction
        odd.filter(F.col("_rk") > 50).drop("_rk"),  # C: behind evicted windows
    ]
    for i, df in enumerate(chunks):
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"s{i}"))
        dst = str(in_dir / f"events-{i}.parquet")
        shutil.copy(
            globmod.glob(str(tmp_path / f"s{i}") + "/part-*.parquet")[0], dst
        )
        # FileStreamSource replays in modification-time order
        os.utime(dst, (1_000_000_000 + 100 * i, 1_000_000_000 + 100 * i))

    agg = tumbling_counts(
        read_events_stream(
            spark, str(in_dir), glob="events-*.parquet", max_files_per_trigger=1
        )
    )
    for q in spark.streams.active:
        if q.name == "late_drop":
            q.stop()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName("late_drop")
            .start()
        )
        try:
            q.processAllAvailable()
            progresses = list(q.recentProgress)
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    n_batches = len([p for p in progresses if p["numInputRows"] > 0])
    assert n_batches == 3, "maxFilesPerTrigger must replay one chunk per batch"

    # (a) drop accounting: C's windows were all evicted before batch 3,
    # so the metric must equal C's distinct group count exactly
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in progresses
        for op in p["stateOperators"]
    )
    ev = load_table(spark, SF_SMOKE, "events")
    odd_ev = ev.filter(F.col("event_id") % 2 == 1).withColumn(
        "_rk",
        F.row_number().over(W.orderBy(F.col("ts").desc(), F.col("event_id"))),
    )
    c_groups = (
        odd_ev.filter(F.col("_rk") > 50)
        .select(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .distinct()
        .count()
    )
    assert dropped == c_groups, (dropped, c_groups)

    # (b) exactly-once emission of each closed window, bit-equal to the
    # batch aggregate over the rows that arrived before eviction (A∪B)
    wm_iso = next(
        p["eventTime"]["watermark"]
        for p in reversed(progresses)
        if p["eventTime"].get("watermark", "").startswith("2")
    )
    wm = dt.datetime.fromisoformat(wm_iso.replace("Z", "+00:00")).replace(
        tzinfo=None
    )
    got = {}
    for r in spark.table("late_drop").collect():
        k = (r["window_start"], r["event_type"])
        assert k not in got, f"window {k} emitted more than once"
        got[k] = (r["n_events"], r["sum_value"])
    survivors = ev.filter(
        (F.col("event_id") % 2 == 0)
        | ev["event_id"].isin(
            [r["event_id"] for r in odd_ev.filter(F.col("_rk") <= 50).collect()]
        )
    )
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in survivors.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), exact_sum("value", "sum_value"))
        .filter(F.col("w.end") <= F.lit(wm))  # open tail windows never emit
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_tws_under_foreign_session():
    """THE claim behind q277: transformWithStateInPandas runs under a
    session the engine did not build — vanilla ``SparkSession.builder``,
    JVM launched with NO vendor environment (the external driver's
    exact shape). ``ensure_protobuf_on`` must flip it live post-launch
    by shipping the patched vendor zip through the per-function worker
    environment (``sc.addPyFile`` cannot: TWS's schema-validation
    driver worker never reads the includes list). Runs in a subprocess
    with the vendor scrubbed from PYTHONPATH so the parent suite's
    session.get_spark environment cannot leak in."""
    import os
    import subprocess
    import sys

    from ecowatt_etl_spark.streaming.proto_vendor import _CANDIDATES

    script = r"""
import sys
sys.path.insert(0, "/root/repo")
try:
    import google.protobuf  # noqa: F401
    raise SystemExit("NOT FOREIGN: google.protobuf importable at launch")
except ImportError:
    pass
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
spark = (SparkSession.builder.master("local[4]").appName("tws-foreign")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from ecowatt_etl_spark.queries.registry import all_queries
from ecowatt_etl_spark.sources.tables import load_table
sf = "/root/testdata/sf0.001"
got = {
    (r["user_id"], r["n_events"], r["sum_value"])
    for r in all_queries()["q277_stream_totals_tws"].fn(spark, sf).collect()
}
want = {
    (r["user_id"], r["n_events"], r["sum_value"])
    for r in load_table(spark, sf, "events")
    .groupBy("user_id")
    .agg(
        F.count("*").alias("n_events"),
        (F.sum(F.col("value").cast("decimal(18,2)")).cast("double")).alias(
            "sum_value"
        ),
    )
    .collect()
}
assert got == want and len(got) > 0, (len(got), len(want))
print("FOREIGN_TWS_MATCH", len(got))
"""
    env = dict(os.environ)
    env.pop("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and p not in _CANDIDATES
    )
    res = subprocess.run(
        [sys.executable, "-c", script],
        env=env,
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert res.returncode == 0 and "FOREIGN_TWS_MATCH" in res.stdout, (
        res.stdout[-2000:],
        res.stderr[-2000:],
    )
