"""Round-6 invariants: the r5 ADVICE fixes, pinned.

1. q90/q91 degenerate-denominator parity — a constant-timestamp group
   must yield NULL slope/intercept on BOTH paths (Spark's Divide is
   NULL on a zero divisor; the grouped-map worker previously emitted
   NaN, silently breaking the claimed q90≡q91 bit-identity).
2. The plan guard's simple-mode fallback must count whole-stage-
   codegen-annotated tree lines ("+- *(2) Shape") — the previous
   prefix class missed them, so a capped waiver could pass with more
   real occurrences than the cap.
3. The parity sweep's comparator must be hash-faithful to the driver:
   both sides through pandas dtype rendering, float fast-path only
   when BOTH sides are floats — so the q176 failure class (DuckDB
   HUGEINT → float64 "500.0" vs Spark bigint "500") FLAGS in
   simulation instead of passing via int coercion.
4. run_to_completion's progress log is listener-collected and
   complete — not capped at spark.sql.streaming.numRecentProgress-
   Updates entries like query.recentProgress.
"""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


def _write_tiny_events(path: str) -> None:
    """events.parquet with one constant-ts group ('flat' — degenerate
    OLS denominator) and one normal group ('var')."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = 1_700_000_000_000_000  # epoch micros
    rows = {
        "event_id": [1, 2, 3, 4, 5, 6],
        "ts": [t0, t0, t0, t0, t0 + 60_000_000, t0 + 120_000_000],
        "user_id": [1, 1, 2, 1, 2, 3],
        "event_type": ["flat", "flat", "flat", "var", "var", "var"],
        "value": [10.25, 11.75, 9.50, 1.00, 2.50, 4.75],
        "props": ["{}"] * 6,
    }
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    pq.write_table(pa.table(rows, schema=schema), path)


def test_regr_degenerate_group_is_null_on_both_paths(spark, tmp_path):
    """All-equal x in a group: q90's Spark Divide yields NULL and the
    q91 grouped-map worker must emit None (NOT NaN) for slope AND
    intercept, so the q90≡q91 bit-identity holds unconditionally —
    including on the constant-timestamp groups the warehouse data
    happens not to contain (r5 ADVICE, analytics_queries.py)."""
    from ecowatt_etl_spark.queries.registry import all_queries

    _write_tiny_events(str(tmp_path / "events.parquet"))
    specs = all_queries()
    by_type = {}
    for name in ("q90_regr_by_type", "q91_regr_grouped_map"):
        rows = specs[name].fn(spark, str(tmp_path)).collect()
        by_type[name] = {r["event_type"]: r for r in rows}
    for name, groups in by_type.items():
        flat = groups["flat"]
        assert flat["slope"] is None, (name, flat)
        assert flat["intercept"] is None, (name, flat)
        assert flat["n"] == 3, (name, flat)
    # the non-degenerate group stays bit-identical across the paths
    v90 = by_type["q90_regr_by_type"]["var"]
    v91 = by_type["q91_regr_grouped_map"]["var"]
    assert (v90["slope"], v90["intercept"]) == (v91["slope"], v91["intercept"])
    assert not math.isnan(v90["slope"])


def test_shape_count_sees_codegen_annotated_simple_mode_lines():
    """Simple-mode plans wrap codegen'd nodes as '*(2) Shape'; the
    tree-position fallback must count those too, else a mixed plan
    understates and a {shape: 1} waiver absorbs an uncounted real
    occurrence (r5 ADVICE, plans/guard.py)."""
    from ecowatt_etl_spark.plans.guard import _shape_count

    plan = (
        "== Physical Plan ==\n"
        "*(3) Project [a]\n"
        "+- BroadcastNestedLoopJoin BuildRight, Inner\n"
        "   :- *(2) BroadcastNestedLoopJoin BuildLeft, Cross\n"
        "   +- Scan parquet [b]\n"
    )
    assert _shape_count(plan, "BroadcastNestedLoopJoin") == 2
    # formatted-mode details sections still count via the (id) path
    formatted = "(4) BroadcastNestedLoopJoin\n(7) Scan parquet\n"
    assert _shape_count(formatted, "BroadcastNestedLoopJoin") == 1


def test_parity_comparator_flags_dtype_divergence():
    """eq() must NOT coerce a float-vs-int pair equal (the exact class
    the driver failed q176 on), and pdf_rows must render a DuckDB
    HUGEINT through pandas as float — so the sweep sees '500.0' vs
    Spark's 500 and flags, exactly like the driver's hash."""
    import duckdb

    from tools.parity_sweep import eq, pdf_rows

    assert not eq(500, 500.0)  # dtype divergence must flag
    assert eq(500.0, 500.0)
    assert eq(float("nan"), float("nan"))
    assert not eq(None, float("nan"))
    assert eq("x", "x") and not eq("x", "y")
    # DATE must compare EQUAL across the two pandas paths — Spark
    # toPandas yields datetime.date, DuckDB fetchdf yields midnight
    # Timestamps, and the driver demonstrably hashes them equal
    # (8 driver-green queries emit raw date columns)
    import datetime as dt

    import pandas as pd

    from tools.parity_sweep import _plain

    spark_side = _plain(dt.date(1992, 1, 2))
    duck_side = _plain(pd.Timestamp("1992-01-02 00:00:00"))
    assert eq(spark_side, duck_side)
    assert str(spark_side) == str(duck_side)

    con = duckdb.connect()
    pdf = con.execute(
        "SELECT SUM(x) OVER () AS tot FROM "
        "(SELECT CAST(100 AS BIGINT) AS x UNION ALL SELECT 400) LIMIT 1"
    ).fetchdf()
    (row,) = pdf_rows(pdf)
    assert isinstance(row[0], float) and str(row[0]) == "500.0"
    # and the fixed q176 oracle casts that HUGEINT back to BIGINT
    pdf2 = con.execute(
        "SELECT CAST(SUM(x) OVER () AS BIGINT) AS tot FROM "
        "(SELECT CAST(100 AS BIGINT) AS x UNION ALL SELECT 400) LIMIT 1"
    ).fetchdf()
    (row2,) = pdf_rows(pdf2)
    assert str(row2[0]) == "500"


def test_progress_log_is_uncapped_and_per_query():
    """The listener log must retain EVERY progress event (recentProgress
    keeps only the last 100 — a >100-batch replay could age out early
    data-carrying batches and defeat the update-mode tripwire, r5
    ADVICE) and filter by query id; wait_terminated resolves only for
    the terminated query."""
    import json
    from types import SimpleNamespace

    from ecowatt_etl_spark.streaming.events_stream import _ProgressLog

    log = _ProgressLog()
    for i in range(150):
        prog = SimpleNamespace(
            id="q-main", json=json.dumps({"batchId": i, "numInputRows": 1})
        )
        log.onQueryProgress(SimpleNamespace(progress=prog))
    log.onQueryProgress(
        SimpleNamespace(
            progress=SimpleNamespace(
                id="q-other", json=json.dumps({"batchId": 0, "numInputRows": 9})
            )
        )
    )
    mine = [p for i, p in log.progress if i == "q-main"]
    assert len(mine) == 150  # nothing aged out
    assert [p["batchId"] for p in mine] == list(range(150))
    assert not log.wait_terminated("q-main", timeout=0.05)
    log.onQueryTerminated(SimpleNamespace(id="q-main"))
    assert log.wait_terminated("q-main", timeout=5)
    assert not log.wait_terminated("q-other", timeout=0.05)


def test_q176_oracle_total_rows_is_bigint_typed():
    """The q176 oracle's total_rows must come back from DuckDB's
    pandas fetch as an INTEGER dtype — the r5 driver miss was this
    exact column rendering '500.0' (HUGEINT->float64) against Spark's
    bigint '500'."""
    import duckdb

    from ecowatt_etl_spark.queries.registry import all_queries
    from tools.parity_sweep import pdf_rows

    spec = all_queries()["q176_skew_report"]
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    pdf = con.execute(spec.oracle).fetchdf()
    rows = pdf_rows(pdf)
    col = list(pdf.columns).index("total_rows")
    for r in rows:
        assert isinstance(r[col], int), (
            "total_rows must render integral under the driver's pandas "
            f"fetch, got {type(r[col])} {r[col]!r}"
        )


def test_vocab_growth_is_cumulative_and_exact(spark):
    """q259's curve must be monotone per source, end at exactly the
    source's distinct-token count, and its token total must equal
    q70-style whole-source token counts — an independent replay of
    the checkpoint math against plain aggregates."""
    from ecowatt_etl_spark.operators.text import token_count, tokens
    from ecowatt_etl_spark.queries.registry import all_queries
    from ecowatt_etl_spark.sources.tables import load_table

    import pyspark.sql.functions as F

    rows = (
        all_queries()["q259_vocab_growth"]
        .fn(spark, SF_ORACLE)
        .collect()
    )
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    d = load_table(spark, SF_ORACLE, "documents")
    totals = {
        r["source"]: (r["n_tok"], r["n_vocab"])
        for r in d.select(
            "source", F.explode(tokens("text")).alias("token")
        )
        .groupBy("source")
        .agg(F.count_distinct("token").alias("n_vocab"))
        .join(
            d.select("source", token_count("text").alias("nt"))
            .groupBy("source")
            .agg(F.sum("nt").alias("n_tok")),
            "source",
        )
        .collect()
    }
    for src, rs in by_src.items():
        rs = sorted(rs, key=lambda r: r["decile"])
        assert [r["decile"] for r in rs] == list(range(1, 11)), src
        for a, b in zip(rs, rs[1:]):
            assert b["docs_cum"] >= a["docs_cum"]
            assert b["tokens_cum"] >= a["tokens_cum"]
            assert b["vocab_cum"] >= a["vocab_cum"]
        n_tok, n_vocab = totals[src]
        assert rs[-1]["tokens_cum"] == n_tok, src
        assert rs[-1]["vocab_cum"] == n_vocab, src


def test_zipf_fit_matches_pure_python_replay(spark):
    """q260's slope/intercept/r2 against a from-scratch replay:
    re-derive the top-K frequencies with plain Spark aggregates, then
    redo the ln/OLS fold in this test — bit-identical, and the slope
    must be negative with r2 in (0, 1] on natural-ish text."""
    import math

    import pyspark.sql.functions as F

    from ecowatt_etl_spark.operators.text import tokens
    from ecowatt_etl_spark.queries.registry import all_queries
    from ecowatt_etl_spark.queries.text_queries import _ZIPF_K
    from ecowatt_etl_spark.sources.tables import load_table

    (row,) = all_queries()["q260_zipf_fit"].fn(spark, SF_ORACLE).collect()
    freqs = [
        r["freq"]
        for r in load_table(spark, SF_ORACLE, "documents")
        .select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(_ZIPF_K)
        .collect()
    ]
    n = float(len(freqs))
    xs = [math.log(float(i + 1)) for i in range(len(freqs))]
    ys = [math.log(float(f)) for f in freqs]

    def fold(vals):
        acc = 0.0
        for v in vals:
            acc = acc + v
        return acc

    sx, sy = fold(xs), fold(ys)
    sxx, syy = fold([x * x for x in xs]), fold([y * y for y in ys])
    sxy = fold([x * y for x, y in zip(xs, ys)])
    den = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / den
    assert row["n_ranks"] == len(freqs)
    assert row["slope"] == slope  # bit-identical
    assert row["intercept"] == (sy - slope * sx) / n
    assert row["slope"] < 0
    assert 0 < row["r2"] <= 1
