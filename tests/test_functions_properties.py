"""Property-based tests (hypothesis) for the scalar cleaning library.

These functions encode the pandas↔Spark semantic bridges (NaN vs NULL,
empty-string regex results, guarded ratios) — the places subtle data
bugs live. Properties are checked over one generated batch per test
(one Spark job), not per-example round-trips."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F
from pyspark.sql import types as T


def _run(spark, values, col_builder, schema=T.StringType()):
    df = spark.createDataFrame([(v,) for v in values], T.StructType([T.StructField("x", schema)]))
    return [r["y"] for r in df.select(col_builder(F.col("x")).alias("y")).collect()]


texts = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)), max_size=60
)


@settings(max_examples=8, deadline=None)
@given(st.lists(texts, min_size=1, max_size=40))
def test_normalize_header_idempotent(spark, names):
    from ecowatt_etl_spark.functions.cleaning import normalize_header

    for n in names:
        once = normalize_header(n)
        assert normalize_header(once) == once, (n, once)


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.floats(allow_nan=True, allow_infinity=True, width=64)),
            st.one_of(st.none(), st.floats(allow_nan=True, allow_infinity=True, width=64)),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_guarded_div_never_nonfinite(spark, pairs):
    """guarded_div mirrors the reference's safe ratios (main.py:304-331):
    whatever junk goes in, what comes out is a finite double or 0."""
    from ecowatt_etl_spark.functions.cleaning import guarded_div

    df = spark.createDataFrame(
        [(a, b) for a, b in pairs],
        T.StructType(
            [T.StructField("a", T.DoubleType()), T.StructField("b", T.DoubleType())]
        ),
    )
    out = [r["y"] for r in df.select(guarded_div("a", "b").alias("y")).collect()]
    for v in out:
        assert v is not None
        assert math.isfinite(v), v


@settings(max_examples=3, deadline=None)
@given(st.lists(st.one_of(texts, st.none()), min_size=1, max_size=50))
def test_try_double_null_or_parse(spark, raws):
    """try_double: every output is NULL or a float Python can also
    parse — never an error, never a junk coercion."""
    from ecowatt_etl_spark.functions.cleaning import try_double

    out = _run(spark, raws, try_double)
    for raw, v in zip(raws, out):
        if v is not None:
            assert isinstance(v, float)
            float(raw.strip())  # would raise if Spark accepted junk Python rejects


@settings(max_examples=3, deadline=None)
@given(st.lists(texts, min_size=1, max_size=50))
def test_fingerprint_bounded_and_deterministic(spark, docs):
    from ecowatt_etl_spark.operators.text import HASH_PRIME, fingerprint

    out1 = _run(spark, docs, fingerprint)
    out2 = _run(spark, docs, fingerprint)
    assert out1 == out2
    for v in out1:
        assert 0 <= v < HASH_PRIME


@settings(max_examples=3, deadline=None)
@given(st.lists(texts, min_size=1, max_size=30))
def test_shingles_nonempty_distinct(spark, docs):
    """Every doc yields ≥1 shingle (whole-doc fallback) and no
    duplicates — the invariants MinHash correctness rests on."""
    from ecowatt_etl_spark.operators.dedup import shingles

    out = _run(spark, docs, lambda c: shingles(c))
    for sh in out:
        assert len(sh) >= 1
        assert len(sh) == len(set(sh))


def test_salted_join_matches_plain_join(spark):
    """salted_join is an execution strategy, not a semantic change."""
    from ecowatt_etl_spark.operators.skew import salted_join
    from ecowatt_etl_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    c2 = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = {tuple(r) for r in o.join(c2, "o_custkey").collect()}
    salted = {tuple(r) for r in salted_join(o, c2, "o_custkey", n_salts=4).collect()}
    assert plain == salted and len(plain) > 0


def test_cosine_zero_vector_yields_null(spark):
    """ANSI mode makes plain '/' throw DIVIDE_BY_ZERO on an all-zero
    embedding; cosine() must instead yield NULL (matching DuckDB's
    double zero-division) so one degenerate vector can't kill a job."""
    from ecowatt_etl_spark.operators.similarity import cosine

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0])], "id long, emb array<double>"
    )
    a, b = df.alias("a"), df.alias("b")
    rows = (
        a.crossJoin(b)
        .select(
            F.col("a.id").alias("ia"),
            F.col("b.id").alias("ib"),
            cosine(F.col("a.emb"), F.col("b.emb")).alias("sim"),
        )
        .collect()
    )
    sims = {(r["ia"], r["ib"]): r["sim"] for r in rows}
    assert sims[(1, 1)] is None and sims[(1, 2)] is None and sims[(2, 1)] is None
    assert math.isclose(sims[(2, 2)], 1.0)


def test_edit_distance_block_cap(spark):
    """A block larger than _ED_BLK_CAP is dropped wholesale (per-block
    n² bound); small blocks still pair up."""
    from ecowatt_etl_spark.queries.dedup_queries import (
        _ED_BLK_CAP,
        edit_distance_pairs,
    )

    prefix = "same boilerplate "  # > 12 chars → one block
    rows = [(i, "en", prefix + f"doc {i}") for i in range(_ED_BLK_CAP + 10)]
    rows += [(1000, "de", "kleine abweichung eins"), (1001, "de", "kleine abweichung zwei")]
    d = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = edit_distance_pairs(d).collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {(1000, 1001)}


def test_approx_distinct_within_hll_error_bound(spark):
    """q09b's HLL++ sketch (rsd=0.01) must land within a conservative
    relative error of q09's exact distinct counts — the accuracy
    contract that justifies the fixed-size sketch as the 100 TB path."""
    from ecowatt_etl_spark.queries.registry import all_queries
    from tests.conftest import SF_ORACLE

    qs = all_queries()
    exact = qs["q09_distinct_count"].fn(spark, SF_ORACLE).collect()[0]
    approx = qs["q09b_approx_distinct"].fn(spark, SF_ORACLE).collect()[0]
    for e_col, a_col in (("n_parts", "n_parts_approx"), ("n_supps", "n_supps_approx")):
        e, a = exact[e_col], approx[a_col]
        assert e > 0
        # rsd 0.01 → 5σ margin; generous but still catches a broken sketch
        assert abs(a - e) / e <= 0.05, (e_col, e, a)


def test_percentile_approx_within_rank_error_bound(spark):
    """q25b's approximate median must respect percentile_approx's
    documented rank-error contract: with accuracy=10000 the returned
    value's true rank is within n/10000 of the target rank (≤ 1 rank
    here), so it must lie between the exact neighboring order
    statistics around the median of each group."""
    from ecowatt_etl_spark.queries.registry import all_queries
    from tests.conftest import SF_ORACLE

    qs = all_queries()
    approx = {
        r["o_orderpriority"]: r["median_price_approx"]
        for r in qs["q25b_percentile_approx"].fn(spark, SF_ORACLE).collect()
    }
    from ecowatt_etl_spark.sources.tables import load_table

    rows = load_table(spark, SF_ORACLE, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    groups: dict[str, list[float]] = {}
    for r in rows:
        groups.setdefault(r["o_orderpriority"], []).append(r["o_totalprice"])
    assert set(approx) == set(groups)
    for g, vals in groups.items():
        vals.sort()
        n = len(vals)
        target = 0.5 * (n - 1)
        slack = max(1, n // 10000)  # accuracy=10000 rank-error bound
        lo = vals[max(0, int(target) - slack)]
        hi = vals[min(n - 1, int(target) + 1 + slack)]
        assert lo <= approx[g] <= hi, (g, lo, approx[g], hi)


def test_dq_audit_fires_on_seeded_dirty_warehouse(spark, tmp_path):
    """q152's checks must actually detect violations: a miniature
    warehouse seeded with one violation per check produces exactly the
    expected non-zero counts (and zero for the clean check)."""
    from pyspark.sql import functions as F

    from ecowatt_etl_spark.queries.registry import all_queries

    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, 5.0, 0.05), (99, -2.0, 0.05), (1, 3.0, 1.5)],
        "l_orderkey long, l_quantity double, l_discount double",
    ).write.parquet(f"{sf}/lineitem.parquet")
    spark.createDataFrame(
        [(1, 10), (2, None), (3, 777)],
        "o_orderkey long, o_custkey long",
    ).write.parquet(f"{sf}/orders.parquet")
    spark.createDataFrame(
        [(10, 0), (11, 404)], "c_custkey long, c_nationkey long"
    ).write.parquet(f"{sf}/customer.parquet")
    spark.createDataFrame([(0,)], "n_nationkey long").write.parquet(
        f"{sf}/nation.parquet"
    )
    spark.createDataFrame(
        [("2024-01-01 00:00:00",), ("2031-01-01 00:00:00",), (None,)],
        "s string",
    ).select(F.col("s").cast("timestamp").alias("ts")).write.parquet(
        f"{sf}/events.parquet"
    )

    got = {
        r["check_name"]: r["n_violations"]
        for r in all_queries()["q152_dq_audit"].fn(spark, sf).collect()
    }
    assert got == {
        "lineitem_orphan_orderkey": 1,  # orderkey 99
        "lineitem_nonpositive_quantity": 1,  # -2.0
        "lineitem_discount_out_of_range": 1,  # 1.5
        "orders_null_custkey": 1,  # order 2
        "orders_orphan_custkey": 2,  # 777 and NULL custkey match nothing
        "customer_orphan_nationkey": 1,  # 404
        "events_null_or_future_ts": 2,  # 2031 + NULL
    }
