"""Structural invariants for the round-4 operator families — properties
that must hold regardless of data, complementing the exact-oracle
parity checks (which pin values but not the reasons they are right).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _q(name):
    from ecowatt_etl_spark.queries.registry import all_queries

    return all_queries()[name]


def test_linear_attribution_reconciles_to_the_ledger(spark):
    """The sum of attributed value must equal, to the microunit, the
    exact value sum of every purchase that had >= 1 click in its
    7-day window — the auditability promise integer shares buy."""
    from ecowatt_etl_spark.queries.event_queries import _ATTR_WINDOW_US
    from ecowatt_etl_spark.sources.tables import load_table

    out = _q("q181_linear_attribution").fn(spark, SF_ORACLE)
    attributed = sum(
        int(round(r["attributed_value"] * 1_000_000)) for r in out.collect()
    )

    ev = load_table(spark, SF_ORACLE, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.unix_micros("ts").alias("c_us"),
        F.col("event_id").alias("c_id"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("p_us"),
        F.col("event_id").alias("p_id"),
        (F.col("value").cast("decimal(18,6)") * 1_000_000)
        .cast("bigint")
        .alias("v_us"),
    )
    touched = purch.join(
        clicks,
        (purch["user_id"] == clicks["user_id"])
        & (
            (F.col("c_us") < F.col("p_us"))
            | ((F.col("c_us") == F.col("p_us")) & (F.col("c_id") < F.col("p_id")))
        )
        & (F.col("c_us") > F.col("p_us") - _ATTR_WINDOW_US),
        "left_semi",
    )
    ledger = touched.agg(
        F.sum(F.col("v_us").cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]
    assert attributed == int(ledger)


def test_zorder_buckets_partition_the_table(spark):
    """Bucket row counts must sum to the table row count, and every
    bucket envelope must sit inside the global min/max."""
    from ecowatt_etl_spark.sources.tables import load_table

    out = _q("q168_zorder_layout").fn(spark, SF_ORACLE).collect()
    li = load_table(spark, SF_ORACLE, "lineitem")
    total = li.count()
    g = li.agg(
        F.min("l_partkey").alias("pmn"),
        F.max("l_partkey").alias("pmx"),
        F.min("l_suppkey").alias("smn"),
        F.max("l_suppkey").alias("smx"),
    ).collect()[0]
    assert sum(r["n_rows"] for r in out) == total
    for r in out:
        assert g["pmn"] <= r["part_lo"] <= r["part_hi"] <= g["pmx"]
        assert g["smn"] <= r["supp_lo"] <= r["supp_hi"] <= g["smx"]


def test_bloom_filter_has_zero_false_negatives(spark):
    """The structural bloom guarantee: every member is flagged."""
    row = _q("q179_bloom_audit").fn(spark, SF_ORACLE).collect()[0]
    assert row["n_member_hits"] == row["n_members"]
    assert 0 < row["n_set_bits"] <= row["m_bits"]


def test_winsorize_clips_at_most_the_tail_mass(spark):
    """percentile_disc fences: each tail clips strictly less than
    (n/100 + 1) observations, and the winsorized mean sits inside
    [p01, p99]."""
    for r in _q("q177_winsorize").fn(spark, SF_ORACLE).collect():
        bound = r["n"] // 100 + 1
        assert r["n_clipped_low"] < bound
        assert r["n_clipped_high"] < bound
        assert r["p01"] <= r["mean_winsorized"] <= r["p99"]


def test_segment_reconcile_localizes_exactly_the_drifted_segments(spark):
    """Drift was injected at k%1000 in {7, 13}: every segment of width
    1000 contains both residues, so NO segment may match — and the
    count delta per segment must equal the injected drop count."""
    rows = _q("q186_segment_reconcile").fn(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert not r["segments_match"]
        assert r["n_a"] - r["n_b"] >= 0


def test_locf_never_reads_the_future(spark):
    """Causality: a user's first observed day must have filled=false,
    and any NULL value_locf may appear only before the user's first
    observation."""
    out = _q("q166_locf_impute").fn(spark, SF_ORACLE)
    rows = out.collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for series in by_user.values():
        series.sort(key=lambda r: r["day"])
        seen_value = False
        for r in series:
            if r["value_locf"] is None:
                assert not seen_value  # NULLs only lead the series
                assert not r["filled"]
            else:
                seen_value = True


def test_theta_intersection_is_sane(spark):
    """Sketch-estimate sanity: n_below_theta never exceeds k, and the
    estimate is zero iff no common sketch hash sits below theta."""
    from ecowatt_etl_spark.queries.dedup_queries import _THETA_K

    for r in _q("q175_theta_intersection").fn(spark, SF_ORACLE).collect():
        assert 0 <= r["n_below_theta"] <= _THETA_K
        assert (r["inter_estimate"] == 0.0) == (r["n_below_theta"] == 0)


def test_compaction_actually_compacts_the_file_topology(spark):
    """q189's relational proof covers content identity; this pins the
    layout half: the fragmented write produces _COMPACT_FROM parquet
    files, the compacted rewrite exactly _COMPACT_TO."""
    import glob

    from ecowatt_etl_spark.operators.bucketing import bucket_token
    from ecowatt_etl_spark.queries.layout_queries import (
        _COMPACT_FROM,
        _COMPACT_TO,
    )
    from ecowatt_etl_spark.sources.formats import SCRATCH_ROOT

    _q("q189_compact_files").fn(spark, SF_ORACLE).collect()
    tok = bucket_token(SF_ORACLE)
    frag = glob.glob(f"{SCRATCH_ROOT}/{tok}/compact_frag/part-*.parquet")
    tight = glob.glob(f"{SCRATCH_ROOT}/{tok}/compact_tight/part-*.parquet")
    assert len(frag) == _COMPACT_FROM
    assert len(tight) == _COMPACT_TO


def test_erasure_removes_only_the_subject(spark):
    """After q188 runs, the scratch table must contain zero rows for
    the erased subject and the full row count for everyone else."""
    from ecowatt_etl_spark.operators.bucketing import bucket_token
    from ecowatt_etl_spark.queries.layout_queries import _ERASE_USER
    from ecowatt_etl_spark.sources.formats import SCRATCH_ROOT
    from ecowatt_etl_spark.sources.tables import load_table

    _q("q188_right_to_erasure").fn(spark, SF_ORACLE).collect()
    back = spark.read.parquet(
        f"{SCRATCH_ROOT}/{bucket_token(SF_ORACLE)}/erasure_events"
    )
    assert back.filter(F.col("user_id") == _ERASE_USER).count() == 0
    expected = (
        load_table(spark, SF_ORACLE, "events")
        .filter(F.col("user_id") != _ERASE_USER)
        .count()
    )
    assert back.count() == expected


def test_ivf_index_persists_partitioned_by_cell(spark):
    """q196's cells artifact must be physically laid out one directory
    per cell — the probe-locality layout the serve path prunes on."""
    import glob
    import os

    from ecowatt_etl_spark.operators.bucketing import bucket_token
    from ecowatt_etl_spark.sources.formats import SCRATCH_ROOT

    _q("q196_ivf_persist_serve").fn(spark, SF_ORACLE).collect()
    cells_dir = f"{SCRATCH_ROOT}/{bucket_token(SF_ORACLE)}/ivf_cells"
    part_dirs = [d for d in glob.glob(f"{cells_dir}/cid=*") if os.path.isdir(d)]
    assert len(part_dirs) > 1  # clustered by cell, not a flat dump


def test_k_anonymity_groups_partition_the_population(spark):
    """QI equivalence classes must PARTITION the customer table: every
    customer in exactly one group, so Σ n_individuals == |customer| —
    and no group may report more sensitive diversity than exists
    globally."""
    from ecowatt_etl_spark.sources.tables import load_table

    out = _q("q210_k_anonymity").fn(spark, SF_ORACLE).collect()
    n_cust = load_table(spark, SF_ORACLE, "customer").count()
    assert sum(r["n_individuals"] for r in out) == n_cust
    n_prio = (
        load_table(spark, SF_ORACLE, "orders")
        .select("o_orderpriority")
        .distinct()
        .count()
    )
    assert all(r["l_diversity"] <= n_prio for r in out)
    from ecowatt_etl_spark.queries.curation_queries import _KA_K, _KA_L

    assert all(r["k_anonymous"] == (r["n_individuals"] >= _KA_K) for r in out)
    assert all(r["l_diverse"] == (r["l_diversity"] >= _KA_L) for r in out)


def test_cuped_adjustment_is_mean_preserving_and_bounded(spark):
    """CUPED shifts per-variant means but may not move the GLOBAL mean
    (Σθ·(x−x̄) telescopes to zero over the whole population), and the
    variance reduction is ρ² ∈ [0, 1]."""
    rows = _q("q211_cuped").fn(spark, SF_ORACLE).collect()
    n = sum(r["n_users"] for r in rows)
    raw = sum(r["mean_y"] * r["n_users"] for r in rows) / n
    adj = sum(r["mean_y_adj"] * r["n_users"] for r in rows) / n
    assert abs(raw - adj) < 1e-9 * max(1.0, abs(raw))
    for r in rows:
        assert 0.0 <= r["var_reduction"] <= 1.0
        assert r["theta"] == rows[0]["theta"]  # global, not per-arm


def test_bfs_hops_satisfy_the_relaxation_equations(spark):
    """BFS certificate: every seed scores 0; every non-seed node's hop
    count is exactly 1 + the minimum hop count among its in-neighbors
    (within the bounded horizon) — the defining fixed-point of
    shortest-hop distance."""
    from ecowatt_etl_spark.queries.dedup_queries import (
        _BFS_SEED_MOD,
        _CLUSTER_T,
        q53_minhash_lsh_pairs,
    )

    dist = {
        r["doc_id"]: r["hops"]
        for r in _q("q212_bfs_hops").fn(spark, SF_ORACLE).collect()
    }
    assert dist, "near-dup graph unexpectedly empty"
    pairs = (
        q53_minhash_lsh_pairs(spark, SF_ORACLE)
        .filter(F.col("jaccard_sim") >= _CLUSTER_T)
        .collect()
    )
    nbrs: dict[int, set[int]] = {}
    for p in pairs:
        nbrs.setdefault(p["id_a"], set()).add(p["id_b"])
        nbrs.setdefault(p["id_b"], set()).add(p["id_a"])
    for node, d in dist.items():
        if node % _BFS_SEED_MOD == 0:
            assert d == 0
        else:
            best = min(
                (dist[m] for m in nbrs[node] if m in dist), default=None
            )
            assert best is not None and d == best + 1


def test_memorization_spans_are_consistent(spark):
    """Span accounting: coverage can't exceed the document, a span is
    at least one shingle wide, and spans can't outnumber the
    duplicated shingles they merge."""
    from ecowatt_etl_spark.queries.text_queries import _MEM_K

    rows = _q("q214_memorization_spans").fn(spark, SF_ORACLE).collect()
    assert len(rows) == 500
    flagged = 0
    for r in rows:
        assert 0 <= r["covered_tokens"] <= r["n_tokens"]
        assert 0 <= r["coverage_bp"] <= 10000
        assert r["n_spans"] <= r["n_dup_shingles"]
        if r["n_spans"] > 0:
            flagged += 1
            assert r["longest_span"] >= _MEM_K
            assert r["covered_tokens"] >= r["longest_span"]
    assert flagged > 0, "corpus unexpectedly has no cross-doc repeats"


def test_bootstrap_ci_brackets_the_point_estimate(spark):
    """Percentile-bootstrap sanity: the interval is non-degenerate,
    ordered, and (for a mean over 15k orders) tight around the
    full-sample point estimate."""
    [r] = _q("q215_bootstrap_ci").fn(spark, SF_ORACLE).collect()
    assert r["ci_lo"] < r["ci_hi"]
    assert r["ci_lo"] <= r["point_mean"] <= r["ci_hi"]
    width = r["ci_hi"] - r["ci_lo"]
    assert width < 0.1 * r["point_mean"]  # ~±1% at n=15k, not garbage


def test_rank_tests_match_brute_force_numpy(spark):
    """Independent-algorithm check: recompute Mann–Whitney U and the
    KS gap with numpy (searchsorted over the raw samples — no ranks,
    no windows) and require exact agreement with the distributed
    rank/ECDF construction."""
    import numpy as np

    from ecowatt_etl_spark.queries.analytics_queries import _MW_A, _MW_B
    from ecowatt_etl_spark.sources.tables import load_table

    ev = load_table(spark, SF_ORACLE, "events").filter(
        F.col("event_type").isin(_MW_A, _MW_B)
    )
    rows = ev.select("event_type", "value").collect()
    a = np.sort(np.array([r["value"] for r in rows if r["event_type"] == _MW_A]))
    b = np.sort(np.array([r["value"] for r in rows if r["event_type"] == _MW_B]))

    [mw] = _q("q216_mannwhitney").fn(spark, SF_ORACLE).collect()
    lt = np.searchsorted(b, a, side="left")
    le = np.searchsorted(b, a, side="right")
    u2_brute = int(lt.sum() + le.sum())  # 2U = Σ 2·(#B<aᵢ) + (#B==aᵢ)
    assert (mw["n_a"], mw["n_b"]) == (len(a), len(b))
    assert mw["u2_a"] == u2_brute

    [ks] = _q("q217_ks_test").fn(spark, SF_ORACLE).collect()
    grid = np.concatenate([a, b])
    ca = np.searchsorted(a, grid, side="right")
    cb = np.searchsorted(b, grid, side="right")
    d_num_brute = int(np.abs(ca * len(b) - cb * len(a)).max())
    assert ks["d_num"] == d_num_brute


def test_hll_merged_estimate_is_within_contract(spark):
    """The within_bound verdict q224 ships must reflect a real
    estimate: rebuild the merged sketch here and pin the estimate to
    the contract bound (and to >0) per event type."""
    from ecowatt_etl_spark.queries.relational import _HLL_BOUND_BP
    from ecowatt_etl_spark.sources.tables import load_table

    ev = load_table(spark, SF_ORACLE, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = {
        r["event_type"]: r["est"]
        for r in daily.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for t, n in exact.items():
        est = merged[t]
        assert est > 0
        assert abs(est - n) * 10_000 <= _HLL_BOUND_BP * n, (t, est, n)


def test_watermark_loss_curve_is_monotone(spark):
    """A longer watermark can only drop FEWER events, and a delay at
    least the jitter cap drops none."""
    from ecowatt_etl_spark.queries.event_queries import _WM_MAX_JITTER_US

    rows = {
        r["delay_min"]: r
        for r in _q("q229_watermark_tuning").fn(spark, SF_ORACLE).collect()
    }
    delays = sorted(rows)
    for a, b in zip(delays, delays[1:]):
        assert rows[a]["n_dropped"] >= rows[b]["n_dropped"]
    for d in delays:
        if d * 60_000_000 >= _WM_MAX_JITTER_US:
            assert rows[d]["n_dropped"] == 0


def test_equidepth_buckets_partition_the_rows(spark):
    """Equi-depth property: buckets tile the table exactly (cumulative
    last == n, per-bucket counts sum to n) and are balanced to within
    the heaviest distinct value's count."""
    from ecowatt_etl_spark.queries.relational import _EQD_B
    from ecowatt_etl_spark.sources.tables import load_table

    rows = sorted(
        _q("q231_equidepth_histogram").fn(spark, SF_ORACLE).collect(),
        key=lambda r: r["bucket_id"],
    )
    assert [r["bucket_id"] for r in rows] == list(range(1, _EQD_B + 1))
    li = load_table(spark, SF_ORACLE, "lineitem")
    n = li.count()
    assert rows[-1]["cum_rows"] == n
    assert sum(r["bucket_rows"] for r in rows) == n
    max_dv = (
        li.groupBy("l_extendedprice").count().agg(F.max("count")).collect()[0][0]
    )
    target = n / _EQD_B
    for r in rows:
        assert abs(r["bucket_rows"] - target) <= max_dv


def test_fd_discovery_flags_the_key_implied_dependency(spark):
    """The nation pair (lhs is the PK) must report a perfect FD; no
    strength may exceed 10000 bp."""
    rows = {r["dependency"]: r for r in _q("q232_fd_discovery").fn(spark, SF_ORACLE).collect()}
    nk = rows["nation.n_nationkey->n_regionkey"]
    assert nk["is_fd"] and nk["strength_bp"] == 10000
    for r in rows.values():
        assert 0 < r["strength_bp"] <= 10000
        assert r["is_fd"] == (r["ndv_lhs"] == r["ndv_pair"])


def test_schema_diff_reports_one_of_each_verdict(spark):
    """The bootstrapped contract fixtures exercise every verdict
    class exactly as constructed."""
    rows = {r["column_name"]: r["verdict"] for r in _q("q230_schema_diff").fn(spark, SF_ORACLE).collect()}
    assert rows == {
        "s_suppkey": "unchanged",
        "s_acctbal": "unchanged",
        "s_name": "dropped",
        "s_rating": "added",
        "s_nationkey": "type_changed",
    }


def test_delta_method_matches_numpy_reconstruction(spark):
    """Recompute the ratio, delta-method standard error, and z from
    the raw per-user pairs with numpy and require float-level
    agreement with the distributed exact-moment construction."""
    import math

    import numpy as np

    from ecowatt_etl_spark.sources.tables import load_table

    ev = load_table(spark, SF_ORACLE, "events")
    pu = (
        ev.groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    (F.col("value").cast("decimal(18,6)") * 1_000_000).cast(
                        "long"
                    ),
                ).otherwise(0)
            ).alias("x"),
            F.count("*").alias("y"),
        )
        .collect()
    )
    out = {r["variant"]: r for r in _q("q235_delta_method").fn(spark, SF_ORACLE).collect()}
    for variant in (0, 1):
        x = np.array([r["x"] for r in pu if r["user_id"] % 2 == variant], dtype=float)
        y = np.array([r["y"] for r in pu if r["user_id"] % 2 == variant], dtype=float)
        n = len(x)
        r_hat = x.sum() / y.sum()
        vx, vy = x.var(ddof=1), y.var(ddof=1)
        cxy = np.cov(x, y, ddof=1)[0, 1]
        se = math.sqrt(
            (vx - 2 * r_hat * cxy + r_hat**2 * vy) / n / (y.mean() ** 2)
        )
        got = out[variant]
        assert abs(got["revenue_per_event"] - r_hat / 1e6) < 1e-9 * abs(r_hat / 1e6)
        assert abs(got["std_err"] - se / 1e6) < 1e-6 * (se / 1e6)


def test_kaplan_meier_curve_is_a_valid_survival_function(spark):
    """S(t) must start below 1, be strictly within (0, 1], be
    non-increasing, and the risk set must shrink consistently with
    events + censorings at each step."""
    rows = sorted(
        _q("q240_kaplan_meier").fn(spark, SF_ORACLE).collect(),
        key=lambda r: r["duration_days"],
    )
    assert rows, "expected a non-degenerate KM table"
    prev_s, prev_risk_floor = 1.0, None
    for r in rows:
        assert 0.0 < r["survival"] <= prev_s <= 1.0
        assert r["n_events"] >= 1
        if prev_risk_floor is not None:
            assert r["n_risk"] <= prev_risk_floor
        prev_risk_floor = r["n_risk"] - r["n_events"] - r["n_censored"]
        prev_s = r["survival"]
    assert any(r["n_censored"] > 0 for r in rows) or rows[-1]["n_risk"] > 0


def test_holt_matches_pure_python_fold(spark):
    """q243's level/trend/forecast must equal a pure-CPython replay of
    the same fixed-order fold over the same daily series — IEEE double
    ops in identical order are engine-independent, so this is exact,
    and it validates the JVM fold against an implementation that
    shares no code with it."""
    from ecowatt_etl_spark.sources.tables import load_table

    out = {r["event_type"]: r for r in _q("q243_holt_forecast").fn(spark, SF_ORACLE).collect()}
    ev = load_table(spark, SF_ORACLE, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                (F.col("value").cast("decimal(18,6)") * 1_000_000).cast("bigint")
            ).alias("v_us")
        )
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["day"], r["v_us"]))
    assert out.keys() == series.keys()
    for et, pairs in series.items():
        xs = [v / 1_000_000.0 for _, v in sorted(pairs)]
        lvl, trd = xs[0], 0.0
        for x in xs[1:]:
            lvl, trd = (
                0.3 * x + 0.7 * (lvl + trd),
                0.2 * ((0.3 * x + 0.7 * (lvl + trd)) - lvl) + 0.8 * trd,
            )
        assert out[et]["n_days"] == len(xs)
        assert out[et]["level"] == lvl, et
        assert out[et]["trend"] == trd, et
        assert out[et]["forecast"] == lvl + 7.0 * trd, et


def test_nb_classifier_matches_pure_python_model(spark):
    """q245's confusion matrix must equal a from-scratch CPython Naive
    Bayes (same tokenization, same quantized weights) — an independent
    reimplementation of train + score + argmax, catching any silent
    divergence the shared-constant oracle could miss."""
    import math
    from collections import Counter

    from ecowatt_etl_spark.operators.text import STOPWORDS
    from ecowatt_etl_spark.sources.tables import load_table

    SCALE = 1 << 20
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text").collect()
    toks = {r["doc_id"]: r["text"].strip().lower().split() for r in docs}
    lab = {
        d: ("hi" if 10 * sum(1 for t in ws if t in STOPWORDS) >= len(ws) else "lo")
        for d, ws in toks.items()
    }
    train = [d for d in toks if d % 5 != 0]
    test = [d for d in toks if d % 5 == 0]
    cnt: Counter = Counter()
    for d in train:
        for t in toks[d]:
            cnt[(lab[d], t)] += 1
    classes = sorted({lab[d] for d in train})
    vocab = sorted({t for (_, t) in cnt})
    n_tok = {c: sum(n for (cc, _), n in cnt.items() if cc == c) for c in classes}
    wq = {
        (c, t): math.floor(
            math.log((cnt.get((c, t), 0) + 1) / (n_tok[c] + len(vocab))) * SCALE
        )
        for c in classes
        for t in vocab
    }
    n_docs = Counter(lab[d] for d in train)
    prior = {
        c: math.floor(math.log(n_docs[c] / len(train)) * SCALE) for c in classes
    }
    confusion: Counter = Counter()
    for d in test:
        scores = {
            c: prior[c] + sum(wq[(c, t)] for t in toks[d] if (c, t) in wq)
            for c in classes
        }
        pred = min(classes, key=lambda c: (-scores[c], c))
        confusion[(lab[d], pred)] += 1
    got = {
        (r["true_label"], r["pred_label"]): r["n_docs"]
        for r in _q("q245_nb_quality_classifier").fn(spark, SF_ORACLE).collect()
    }
    assert got == dict(confusion)
    assert sum(got.values()) == len(test)


def test_record_linkage_candidates_are_exactly_hamming1(spark):
    """q246's blocking must surface EXACTLY the Hamming<=1 key pairs:
    the classification histogram's total pair count equals a brute-
    force O(n^2) count over the zero-padded keys — no missed pairs
    (blocking recall 1.0 for this distance), no double-counted pairs
    (unique keys share at most one mask)."""
    from ecowatt_etl_spark.sources.tables import load_table

    out = _q("q246_record_linkage").fn(spark, SF_ORACLE).collect()
    n_pairs = sum(r["n_pairs"] for r in out)

    keys = [
        f"{r['c_custkey']:012d}"
        for r in load_table(spark, SF_ORACLE, "customer").select("c_custkey").collect()
    ]
    brute = sum(
        1
        for i in range(len(keys))
        for j in range(i + 1, len(keys))
        if sum(a != b for a, b in zip(keys[i], keys[j])) <= 1
    )
    assert n_pairs == brute and n_pairs > 0


def test_incremental_refresh_audit_is_clean_and_counts_check(spark):
    """q247's audit row: zero mismatched groups (incremental == full,
    the associativity guarantee), and the group/affected counts match
    independent recomputations."""
    from ecowatt_etl_spark.sources.tables import load_table

    row = _q("q247_incremental_view_refresh").fn(spark, SF_ORACLE).collect()[0]
    assert row["n_mismatch"] == 0
    li = load_table(spark, SF_ORACLE, "lineitem").select("l_orderkey")
    o = load_table(spark, SF_ORACLE, "orders").select("o_orderkey", "o_custkey")
    j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    assert row["n_groups"] == j.select("o_custkey").distinct().count()
    assert (
        row["n_affected"]
        == j.filter(F.col("l_orderkey") % 50 == 0)
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert 0 < row["n_affected"] < row["n_groups"]


def test_sql_script_matches_python_compounding(spark):
    """q248's procedural WHILE-loop trajectory must equal the same
    integer recurrence run in CPython from the same monthly
    aggregates."""
    from ecowatt_etl_spark.sources.tables import load_table

    row = _q("q248_sql_scripting").fn(spark, SF_ORACLE).collect()[0]
    o = load_table(spark, SF_ORACLE, "orders")
    monthly = (
        o.groupBy(F.date_trunc("MONTH", "o_orderdate").alias("mo"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)") * 100)
            .cast("bigint")
            .alias("c")
        )
        .orderBy("mo")
        .collect()
    )
    first_c, last_c = monthly[0]["c"], monthly[-1]["c"]
    g_bp = last_c * 10_000 // first_c
    proj = last_c
    for _ in range(6):
        proj = proj * g_bp // 10_000
    assert (
        row["first_month_cents"],
        row["last_month_cents"],
        row["growth_bp"],
        row["proj_6m_cents"],
    ) == (first_c, last_c, g_bp, proj)


def test_observed_metrics_equal_second_pass_aggregate(spark):
    """q244's accumulator-borne metrics must equal the same aggregates
    computed by an ordinary second scan — the Observation path changes
    WHERE the numbers are computed, never the numbers."""
    from ecowatt_etl_spark.functions.exact import exact_sum
    from ecowatt_etl_spark.sources.tables import load_table

    row = _q("q244_observed_metrics").fn(spark, SF_ORACLE).collect()[0]
    li = load_table(spark, SF_ORACLE, "lineitem").filter(
        (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
    )
    chk = li.agg(
        F.count("*").alias("n_rows"),
        exact_sum("l_quantity", "sum_qty"),
        F.min(F.to_date("l_shipdate")).alias("first_ship"),
        F.max(F.to_date("l_shipdate")).alias("last_ship"),
    ).collect()[0]
    assert row["n_rows"] == chk["n_rows"]
    assert row["sum_qty"] == chk["sum_qty"]
    assert row["first_ship"] == chk["first_ship"]
    assert row["last_ship"] == chk["last_ship"]


def test_gate_calibration_curve_is_monotone(spark):
    """q249: as the decile loosens, the threshold is non-increasing,
    kept/recall are non-decreasing, and the decile-rank contract
    n_kept >= ceil(d*n/10) holds (ties can only widen the kept set)."""
    rows = sorted(
        _q("q249_gate_calibration").fn(spark, SF_ORACLE).collect(),
        key=lambda r: r["decile"],
    )
    nn = max(r["n_kept"] for r in rows)  # decile 10 keeps everything
    for a, b in zip(rows, rows[1:]):
        assert b["margin_threshold"] <= a["margin_threshold"]
        assert b["n_kept"] >= a["n_kept"]
        assert b["recall_bp"] >= a["recall_bp"]
    for r in rows:
        assert r["n_kept"] >= (r["decile"] * nn + 9) // 10
        assert 0 <= r["precision_bp"] <= 10000
        assert 0 <= r["recall_bp"] <= 10000


def test_clamped_balance_matches_pure_python_and_streaming(spark):
    """q251 (batch fold) and q252 (GroupState live form) must both
    equal a from-scratch CPython replay of the saturating ledger —
    integer arithmetic end to end, so equality is exact."""
    from ecowatt_etl_spark.queries.event_queries import _BAL_CAP_US
    from ecowatt_etl_spark.sources.tables import load_table

    ev = (
        load_table(spark, SF_ORACLE, "events")
        .filter(F.col("event_type").isin("purchase", "error"))
        .select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            (F.col("value").cast("decimal(18,6)") * 1_000_000)
            .cast("bigint")
            .alias("v_us"),
        )
        .collect()
    )
    moves: dict = {}
    for r in ev:
        d = r["v_us"] if r["event_type"] == "purchase" else -r["v_us"]
        moves.setdefault(r["user_id"], []).append((r["ts"], r["event_id"], d))
    want = {}
    for u, ms in moves.items():
        bal = ncap = nflo = 0
        for _, _, d in sorted(ms):
            moved = bal + d
            ncap += moved > _BAL_CAP_US
            nflo += moved < 0
            bal = min(max(moved, 0), _BAL_CAP_US)
        want[u] = (len(ms), bal, ncap, nflo)
    for name in ("q251_clamped_balance", "q252_stream_clamped_balance"):
        got = {
            r["user_id"]: (
                r["n_moves"],
                r["balance_us"],
                r["n_capped"],
                r["n_floored"],
            )
            for r in _q(name).fn(spark, SF_ORACLE).collect()
        }
        assert got == want, name


def test_rolling_active_users_match_pure_python_sets(spark):
    """q253's sliding distincts against literal Python set unions."""
    import datetime as dt

    from ecowatt_etl_spark.sources.tables import load_table

    act = (
        load_table(spark, SF_ORACLE, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .collect()
    )
    by_day: dict = {}
    for r in act:
        by_day.setdefault(r["day"], set()).add(r["user_id"])
    for r in _q("q253_rolling_active_users").fn(spark, SF_ORACLE).collect():
        d = r["day"]
        window = set().union(
            *(by_day.get(d - dt.timedelta(days=k), set()) for k in range(7))
        )
        assert r["dau"] == len(by_day[d])
        assert r["wau"] == len(window)
        assert r["sticky_bp"] == r["dau"] * 10000 // r["wau"]
        assert r["dau"] <= r["wau"]


def test_bench_headline_names_resolve_and_are_oracle_backed(spark):
    """bench.py is the driver's per-round throughput probe: every
    HEADLINE name must resolve in the registry (a rename here would
    silently shrink the bench), and the four parity/recall extras
    must reference queries that still exist."""
    import bench
    from ecowatt_etl_spark.queries.registry import all_queries

    specs = all_queries()
    missing = [n for n in bench.HEADLINE if n not in specs]
    assert not missing, f"HEADLINE names not in registry: {missing}"
    for n in (
        "q61_cosine_topk",
        "q63_cosine_topk_matmul",
        "q64_lsh_topk",
        "q65_ivf_topk",
        "q156_ivfpq_topk",
        "q90_regr_by_type",
        "q91_regr_grouped_map",
    ):
        assert n in specs, n


def test_readme_query_counts_match_registry(spark):
    """README's headline counts are hand-edited and have drifted twice;
    pin them to the registry so every addition forces the doc update."""
    import re

    from ecowatt_etl_spark.queries.registry import all_queries

    specs = all_queries()
    n_total = len(specs)
    n_oracle = sum(1 for s in specs.values() if s.oracle is not None)
    text = open("README.md").read()
    m = re.search(
        r"(\d+) registered queries, (\d+) with DuckDB oracle twins", text
    )
    assert m, "README layout line missing"
    assert (int(m.group(1)), int(m.group(2))) == (n_total, n_oracle), (
        f"README says {m.group(1)}/{m.group(2)}, registry has "
        f"{n_total}/{n_oracle}"
    )


def test_retrieval_self_eval_matches_pure_python(spark):
    """q256's per-retriever hit/RR summary against a from-scratch
    CPython replay of both retrievers (same tokenization, same
    perturbation, same tie-breaks)."""
    from ecowatt_etl_spark.sources.tables import load_table

    docs = {
        r["doc_id"]: r["text"].strip().lower().split()
        for r in load_table(spark, SF_ORACLE, "documents")
        .select("doc_id", "text")
        .collect()
    }
    em = {
        r["vec_id"]: list(r["embedding"])
        for r in load_table(spark, SF_ORACLE, "embeddings").collect()
    }
    probes = sorted(d for d in docs if d % 25 == 0)

    def ranks(score_fn):
        out = {}
        for q in probes:
            scored = sorted(
                ((score_fn(q, c), -c) for c in docs), reverse=True
            )
            out[q] = next(
                i + 1 for i, (_, negc) in enumerate(scored) if -negc == q
            )
        return out

    def lex(q, c):
        terms = set(docs[q][:6])
        return len(terms & set(docs[c]))

    def vec(q, c):
        import math

        pq = [
            x * float((j + 1) * 7 % 11 + 95) / 100.0
            for j, x in enumerate(em[q])
        ]
        dot = norm_q = norm_c = 0.0
        for a, b in zip(pq, em[c]):
            dot += a * b
            norm_q += a * a
            norm_c += b * b
        return dot / (math.sqrt(norm_q) * math.sqrt(norm_c))

    got = {
        r["retriever"]: (r["n_queries"], r["hit1"], r["hit3"], r["rr_milli_sum"])
        for r in _q("q256_retrieval_self_eval").fn(spark, SF_ORACLE).collect()
    }
    for label, fn in (("lexical", lex), ("vector", vec)):
        rk = ranks(fn)
        want = (
            len(probes),
            sum(1 for v in rk.values() if v == 1),
            sum(1 for v in rk.values() if v <= 3),
            sum(1000 // v for v in rk.values()),
        )
        assert got[label] == want, (label, got[label], want)


def test_driver_window_leads_with_never_rowed_queries(spark):
    """The driver value-checks only the FIRST ~50 entries of queries()
    in iteration order, so the window is load-bearing state.

    Coverage-complete-era contract (r6 verdict item 1): through r6 the
    windows rotated until every oracle-backed query had a driver hash
    row, so the old invariant — "no slot on an already-checked query" —
    can never again be satisfied and was retired.  The invariant that
    MUST survive is: any registry entry with NO driver row of any kind
    (a brand-new registration, or a rows-only query never windowed)
    must occupy the FRONT of the window, before any re-certification
    slot.  That guarantees a new query cannot sit driver-unchecked for
    a round while the window re-certifies old green rows, which is
    exactly how q259/q260 slipped through the r6 freeze."""
    import glob
    import json

    from ecowatt_etl_spark.queries.registry import all_queries

    specs = all_queries()
    window = list(specs)[:50]
    rowed: set[str] = set()
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rowed |= set(json.load(open(path)))
    never_rowed = [n for n in specs if n not in rowed]
    # Every never-rowed query fits in (and leads) the window — unless
    # there are more than 50, in which case the window must be spent
    # entirely on them and the spill carries to the next round.
    lead = never_rowed[: len(window)]
    assert set(lead) <= set(window), sorted(set(lead) - set(window))
    prefix = window[: len(lead)]
    assert set(prefix) == set(lead), (
        "never-driver-rowed queries must occupy the front of the "
        f"window before re-certification slots: front={prefix} "
        f"expected={sorted(lead)}"
    )
