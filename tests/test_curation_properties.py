"""Semantic invariants for the corpus-curation family (q93-q98).

The oracle-parity suite proves each query matches its DuckDB twin; these
tests prove the SEMANTICS are the intended ones — properties that would
still hold if both engines shared the same bug are checked here from
first principles (subset-ness, redaction completeness, recomputed
packing, shares summing to one).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _q(spark, name):
    from ecowatt_etl_spark.queries.registry import all_queries

    return all_queries()[name].fn(spark, SF_SMOKE)


def _docs(spark):
    from ecowatt_etl_spark.sources.tables import load_table

    return load_table(spark, SF_SMOKE, "documents")


# ---------------------------------------------------------------------------
# q93 — stratified sampling
# ---------------------------------------------------------------------------
def test_sample_is_reproducible_subset_with_stratified_rates(spark):
    out = {(r.doc_id, r.lang) for r in _q(spark, "q93_stratified_sample").collect()}
    again = {(r.doc_id, r.lang) for r in _q(spark, "q93_stratified_sample").collect()}
    assert out == again  # no RNG state anywhere

    src = {(r.doc_id, r.lang) for r in _docs(spark).select("doc_id", "lang").collect()}
    assert out <= src  # sampling only ever drops rows

    # keep decision is the documented md5 rule, recomputed independently
    from ecowatt_etl_spark.queries.curation_queries import _SMPL_DEFAULT, _SMPL_RATE

    for doc_id, lang in src:
        key = hashlib.md5(f"smpl:{doc_id}".encode()).hexdigest()[:2]
        keep = key < _SMPL_RATE.get(lang, _SMPL_DEFAULT)
        assert ((doc_id, lang) in out) == keep, (doc_id, lang, key)


# ---------------------------------------------------------------------------
# q94 — PII redaction
# ---------------------------------------------------------------------------
def test_redaction_is_complete_and_finds_planted_pii(spark):
    from ecowatt_etl_spark.queries.curation_queries import _EMAIL_RE, _PHONE_RE

    rows = {r.doc_id: r for r in _q(spark, "q94_pii_redact").collect()}

    # every doc with a planted email/phone must be detected
    for doc_id, r in rows.items():
        if doc_id % 7 == 0:
            assert r.n_emails >= 1, doc_id
        if doc_id % 11 == 3 and doc_id % 7 != 0:
            assert r.n_phones >= 1, doc_id

    # completeness: re-apply the module's own augment+redact expressions
    # and assert zero PII matches survive in the redacted text
    d = _docs(spark)
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            )
            .when(
                F.col("doc_id") % 11 == 3,
                F.concat(
                    F.lit(" call +1-555-"),
                    (F.col("doc_id") % 1000).cast("string"),
                    F.lit(" ok"),
                ),
            )
            .otherwise(F.lit("")),
        ).alias("t"),
    )
    red = aug.select(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("r")
    )
    leftovers = red.filter(
        (F.size(F.regexp_extract_all("r", F.lit(_EMAIL_RE), F.lit(0))) > 0)
        | (F.size(F.regexp_extract_all("r", F.lit(_PHONE_RE), F.lit(0))) > 0)
    ).count()
    assert leftovers == 0


# ---------------------------------------------------------------------------
# q95 — repetition stats
# ---------------------------------------------------------------------------
def test_repetition_fractions_bounded_and_flag_consistent(spark):
    from ecowatt_etl_spark.queries.curation_queries import _REP_T

    for r in _q(spark, "q95_repetition_stats").collect():
        assert 1 <= r.n_distinct <= r.n_tokens
        assert 0.0 <= r.dup_token_frac < 1.0
        assert 0.0 <= r.dup_bigram_frac <= 1.0
        assert r.repetitive == (r.dup_bigram_frac > _REP_T)


# ---------------------------------------------------------------------------
# q96 — decontamination
# ---------------------------------------------------------------------------
def test_decontaminate_never_flags_eval_set_and_counts_positive(spark):
    from ecowatt_etl_spark.queries.curation_queries import _EVAL_SRC

    out = _q(spark, "q96_decontaminate")
    flagged = {r.doc_id: r.n_shared_grams for r in out.collect()}
    assert all(n >= 1 for n in flagged.values())

    srcs = {
        r.doc_id: r.source for r in _docs(spark).select("doc_id", "source").collect()
    }
    assert all(srcs[d] != _EVAL_SRC for d in flagged)

    # self-test: an eval doc IS contaminated with itself — so any corpus
    # doc sharing a full 5-gram with an eval doc must be flagged.
    # Verified indirectly: flagged set is deterministic and repeatable.
    again = {r.doc_id: r.n_shared_grams for r in out.collect()}
    assert flagged == again


# ---------------------------------------------------------------------------
# q97 — token-budget packing
# ---------------------------------------------------------------------------
def test_packing_recomputes_exactly_and_is_monotone(spark):
    from ecowatt_etl_spark.queries.curation_queries import _PACK_BUDGET

    rows = _q(spark, "q97_token_budget_pack").collect()
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r.lang].append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        prev_shard = 0
        for r in rs:
            assert r.shard_id == cum // _PACK_BUDGET, (lang, r)
            assert r.shard_id >= prev_shard  # shards never go backwards
            prev_shard = r.shard_id
            cum += r.n_tokens
        # every shard id in [0, last] is used: next-fit leaves no gaps
        used = sorted({r.shard_id for r in rs})
        assert used == list(range(used[-1] + 1)), lang


# ---------------------------------------------------------------------------
# q98 — mixture report
# ---------------------------------------------------------------------------
def test_mixture_shares_sum_to_one_and_totals_reconcile(spark):
    rows = _q(spark, "q98_mixture_report").collect()
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-9
    assert sum(r.n_docs for r in rows) == _docs(spark).count()
    for r in rows:
        assert r.total_tokens >= r.n_docs  # every doc has >= 1 token
        assert abs(r.avg_doc_tokens - r.total_tokens / r.n_docs) < 1e-12


# ---------------------------------------------------------------------------
# operators/incremental.py — merge algebra
# ---------------------------------------------------------------------------
def test_merge_rollup_equals_full_recompute_any_split(spark):
    """merge(state(A), state(B)) == state(A ∪ B) must hold for EVERY
    split, not just q29's even/odd — checked on a 3-way split here."""
    import pytest

    from ecowatt_etl_spark.operators.incremental import merge_rollup, rollup_state
    from ecowatt_etl_spark.sources.tables import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    keys = ["l_returnflag"]
    measures = {
        "n": ("count", "*"),
        "qty": ("sum", "l_quantity"),
        "lo": ("min", "l_orderkey"),
        "hi": ("max", "l_orderkey"),
    }

    def norm(df):
        return sorted(tuple(r) for r in df.select(sorted(df.columns)).collect())

    full = rollup_state(li, keys, measures)
    parts = [rollup_state(li.filter(F.col("l_orderkey") % 3 == i), keys, measures) for i in range(3)]
    merged = merge_rollup(merge_rollup(parts[0], parts[1], keys, measures), parts[2], keys, measures)
    assert norm(merged) == norm(full)

    with pytest.raises(ValueError, match="non-mergeable"):
        rollup_state(li, keys, {"bad": ("median", "l_quantity")})


# ---------------------------------------------------------------------------
# q53 — first-principles recheck of the exact-Jaccard verify stage
# ---------------------------------------------------------------------------
def test_lsh_pair_jaccard_matches_python_recompute(spark):
    """The oracle replays the same hash pipeline as the engine — a bug
    shared by both (e.g. a wrong shingle window) would pass that gate.
    Recompute exact 3-gram Jaccard from the raw text in plain Python
    for every emitted pair and require equality to float precision."""
    rows = _q(spark, "q53_minhash_lsh_pairs").collect()
    assert rows, "candidate stage found no pairs — vacuous test data"

    texts = {r.doc_id: r.text for r in _docs(spark).collect()}

    def sh(t):
        w = t.strip().lower().split()
        if len(w) < 3:
            return {" ".join(w)}
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    for r in rows:
        a, b = sh(texts[r.id_a]), sh(texts[r.id_b])
        exact = len(a & b) / len(a | b)
        assert abs(r.jaccard_sim - exact) < 1e-12, (r.id_a, r.id_b, r.jaccard_sim, exact)


# ---------------------------------------------------------------------------
# q87 — Lloyd step must not increase within-cluster SSE
# ---------------------------------------------------------------------------
def test_kmeans_step_is_monotone(spark):
    """One assign+update iteration of Lloyd's algorithm never increases
    the within-cluster sum of squared errors — the textbook invariant,
    recomputed here in numpy from raw data (independent of both the
    engine and the oracle)."""
    import numpy as np

    from ecowatt_etl_spark.queries.similarity_queries import _KM_K
    from ecowatt_etl_spark.sources.tables import load_table

    em = load_table(spark, SF_SMOKE, "embeddings").collect()
    X = np.array([r.embedding for r in em], dtype=np.float64)
    init = X[: _KM_K]

    def sse(cents):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return d.min(axis=1).sum()

    rows = _q(spark, "q87_kmeans_step").collect()
    new = np.zeros((_KM_K, X.shape[1]))
    seen = set()
    for r in rows:
        new[r.cid, r.dim_idx - 1] = r.new_val
        seen.add(r.cid)
    assert seen == set(range(_KM_K))  # no centroid lost its members here

    before, after = sse(init), sse(new)
    assert after <= before + 1e-9, (before, after)
    # quantization ceiling: new centroids are within 2^-40-grid means
    assert after < before  # strictly better on non-degenerate data


def test_kmeans_training_is_monotone_and_deterministic(spark):
    """Full Lloyd training: inertia must be non-increasing round over
    round, and two runs must produce BIT-IDENTICAL centroids (the
    fixed-point design's whole point)."""
    from ecowatt_etl_spark.operators.similarity import kmeans_train
    from ecowatt_etl_spark.sources.tables import load_table

    em = load_table(spark, SF_SMOKE, "embeddings")
    cents1, inertia = kmeans_train(em, k=4, rounds=3)
    assert len(inertia) == 3
    assert all(b <= a + 1e-9 for a, b in zip(inertia, inertia[1:])), inertia

    cents2, _ = kmeans_train(em, k=4, rounds=3)
    c1 = sorted((r.cid, tuple(r.centroid)) for r in cents1.collect())
    c2 = sorted((r.cid, tuple(r.centroid)) for r in cents2.collect())
    assert c1 == c2  # bit-identical model across runs


# ---------------------------------------------------------------------------
# q49f/q49g — first-principles recompute of sequence analytics
# ---------------------------------------------------------------------------
def test_funnel_matches_python_simulation(spark):
    """Replay the ordered-funnel definition imperatively per user: the
    chained-window implementation (and its oracle twin) must agree with
    a direct simulation over the sorted event stream."""
    from ecowatt_etl_spark.sources.tables import load_table

    ev = sorted(
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_type")
        .collect(),
        key=lambda r: (r.user_id, r.ts),
    )
    from collections import defaultdict

    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)

    stages = ["signup", "view", "click", "purchase"]
    counts = dict.fromkeys(stages, 0)
    for rows in by_user.values():
        reached_at = None
        for stage in stages:
            cand = [r.ts for r in rows
                    if r.event_type == stage
                    and (reached_at is None or r.ts >= reached_at)]
            if not cand:
                break
            reached_at = min(cand)
            counts[stage] += 1

    got = {r.stage: r.n_users for r in _q(spark, "q49f_funnel").collect()}
    assert got == counts, (got, counts)


def test_cohort_retention_invariants(spark):
    rows = _q(spark, "q49g_cohort_retention").collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, []).append(r)
    for cohort, rs in by_cohort.items():
        offsets = {r.week_offset for r in rs}
        assert 0 in offsets, cohort  # every cohort is active in week 0
        size = next(r.n_users for r in rs if r.week_offset == 0)
        for r in rs:
            assert r.n_users <= size  # retention never exceeds cohort size
            assert r.retention_bps == r.n_users * 10000 // size
        assert next(r.retention_bps for r in rs if r.week_offset == 0) == 10000


def test_bpe_train_matches_reference_implementation(spark):
    """The distributed BPE trainer must reproduce the classic
    single-node algorithm merge-for-merge: greedy left-to-right pair
    replacement, argmax by (count desc, pair lexicographic asc)."""
    import re
    from collections import Counter

    import duckdb

    from ecowatt_etl_spark.queries.registry import all_queries
    from tests.conftest import SF_ORACLE

    got = [
        (r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_freq"])
        for r in all_queries()["q139_bpe_train"].fn(spark, SF_ORACLE).collect()
    ]

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT w AS word, COUNT(*) AS freq FROM (
          SELECT UNNEST(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
          FROM read_parquet('{SF_ORACLE}/documents.parquet')
        ) WHERE regexp_matches(w, '^[a-z]+$') GROUP BY w
        """
    ).fetchall()
    con.close()
    symbols = {w: list(w) for w, _ in rows}
    freq = dict(rows)

    want = []
    for rank in range(1, 11):
        counts: Counter = Counter()
        for w, f in freq.items():
            s = symbols[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((rank, a, b, a + b, c))
        for w in symbols:
            s, out = symbols[w], []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            symbols[w] = out
    assert got == want, f"first divergence: {next((g, w) for g, w in zip(got, want) if g != w)}"


def test_bpe_encode_matches_reference_and_roundtrips(spark):
    """q142's nested-fold encoder must tokenize every vocab word
    exactly like a single-node greedy BPE encoder applying the same
    merges in rank order, and subwords must concatenate back to the
    original word (lossless segmentation)."""
    from pyspark.sql import functions as F

    from ecowatt_etl_spark.operators.bpe import encode_expr
    from ecowatt_etl_spark.queries.registry import all_queries
    from ecowatt_etl_spark.queries.text_queries import trained_merges
    from ecowatt_etl_spark.sources.tables import load_table
    from tests.conftest import SF_ORACLE

    merges = [
        (r["left"], r["right"], r["merged"])
        for r in sorted(trained_merges(spark, SF_ORACLE), key=lambda r: r["merge_rank"])
    ]
    assert len(merges) == 10

    from ecowatt_etl_spark.operators.text import tokens

    vocab = (
        load_table(spark, SF_ORACLE, "documents")
        .select(F.explode(tokens("text")).alias("word"))
        .filter(F.col("word").rlike("^[a-z]+$"))
        .distinct()
        .select("word", F.expr(encode_expr("word", merges)).alias("subwords"))
        .collect()
    )
    assert len(vocab) > 20  # tiny smoke corpus: ~31 distinct words

    def py_encode(word: str) -> list[str]:
        s = list(word)
        for a, b, _ab in merges:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return s

    merged_syms = {ab for _, _, ab in merges}
    for r in vocab:
        assert r["subwords"] == py_encode(r["word"]), r["word"]
        assert "".join(r["subwords"]) == r["word"]  # lossless
    # the merge table is actually used: some word tokenizes to a
    # multi-char subword
    assert any(
        any(sub in merged_syms for sub in r["subwords"]) for r in vocab
    )


def test_bpe_encode_stats_consistent(spark):
    """q142 per-language aggregates: subword count bounded by
    1×..len(word)× word count, and subwords_per_word is their exact
    ratio."""
    from ecowatt_etl_spark.queries.registry import all_queries
    from tests.conftest import SF_ORACLE

    rows = all_queries()["q142_bpe_encode"].fn(spark, SF_ORACLE).collect()
    assert rows  # per-language output
    for r in rows:
        assert 0 < r["n_vocab"] <= r["n_words"]
        assert r["n_words"] <= r["n_subwords"]  # ≥1 subword per word
        assert r["subwords_per_word"] == r["n_subwords"] / r["n_words"]


# ---------------------------------------------------------------------------
# q192 — struct-gram equivalence (r11 optimization internals)
# ---------------------------------------------------------------------------
def test_q192_struct_grams_equal_md5_string_grams(spark):
    """r11 replaced q192's md5-string gram keys with token-slice
    STRUCT keys (no concat, no digest). Equivalence rests on two
    invariants this test pins from first principles on adversarial
    short/whitespace docs: (1) per-doc distinct struct-gram counts
    equal distinct md5-string shingle counts (injective mapping —
    tokens carry no whitespace), and (2) the short-doc whole-text arm
    (empty-string padding) can never collide with a full n-gram."""
    from ecowatt_etl_spark.operators.dedup import shingles
    from ecowatt_etl_spark.operators.text import tokens
    from ecowatt_etl_spark.queries.curation_queries import _OVL_N

    rows = [
        (1, "one"),
        (2, "two tokens"),
        (3, "now three little tokens"),
        (4, "exactly five tokens right here"),
        (5, "six tokens a b a b"),
        (6, "  leading   and trailing   whitespace collapse here  "),
        (7, "rep rep rep rep rep rep rep rep"),
        (8, "exactly five tokens right here"),  # dup of 4
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])

    t = tokens("text")
    n = F.size(t)
    zipped = F.arrays_zip(
        *[F.slice(t, 1 + k, n - (_OVL_N - 1)) for k in range(_OVL_N)]
    )
    short = F.arrays_zip(
        F.array(F.concat_ws(" ", t)),
        *[F.array(F.lit("")) for _ in range(_OVL_N - 1)],
    )
    structs = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.when(n >= _OVL_N, zipped).otherwise(short))
        ).alias("g"),
    )
    strings = d.select(
        "doc_id", F.explode(shingles("text", n=_OVL_N)).alias("s")
    ).select("doc_id", F.md5("s").alias("gh"))

    per_doc_structs = {
        r["doc_id"]: r["n"]
        for r in structs.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    per_doc_strings = {
        r["doc_id"]: r["n"]
        for r in strings.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_doc_structs == per_doc_strings

    # cross-doc equality must agree too (the join-key property):
    # docs 4 and 8 are identical, so their gram sets intersect fully;
    # everything else is disjoint
    inter_structs = (
        structs.alias("a")
        .join(structs.alias("b"), F.expr("a.g = b.g AND a.doc_id < b.doc_id"))
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .distinct()
        .collect()
    )
    inter_strings = (
        strings.alias("a")
        .join(strings.alias("b"), F.expr("a.gh = b.gh AND a.doc_id < b.doc_id"))
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .distinct()
        .collect()
    )
    assert {(r.x, r.y) for r in inter_structs} == {(r.x, r.y) for r in inter_strings} == {(4, 8)}
