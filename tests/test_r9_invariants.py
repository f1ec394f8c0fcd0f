"""Round-9 invariants: q155's corpus-scaled cell-band cap (r8 verdict
item 2) — the bits-per-band parameter must be the SAME integer in both
engines at any corpus size, the banded candidate union must be
duplicate-free and a subset of the within-cell pair space, and at
every parity scale the cap must be a no-op (b = 0) so the certified
history stays bit-identical."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ecowatt_etl_spark.queries.similarity_queries import (  # noqa: E402
    _BAND_STRIDE,
    _CELL_BANDS,
    _CELL_TARGET,
    _IVF_K,
    _SQL_SUBBAND_BITS,
    _subband_bits,
)

from tests.conftest import SF_ORACLE, SF_SMOKE  # noqa: E402


def test_subband_bits_matches_sql_twin_exactly():
    """b(N) is the parity linchpin: if the Python (Spark-side) and SQL
    (oracle-side) computations ever disagree at some N, the two
    engines build different blockings and every value diverges. Check
    the integer compare-count twin at boundary-heavy N values."""
    con = duckdb.connect()
    kt = _IVF_K * _CELL_TARGET
    probe = sorted(
        {1, 2, 500, 2000, 2048, 2049, 200000, 10**7, 10**12}
        | {kt, kt + 1, 2 * kt, 2 * kt + 1, 4 * kt - 1, 4 * kt}
        | {kt * (1 << 16), kt * (1 << 16) + 1, kt * (1 << 20)}
    )
    for n in probe:
        sql_b = con.execute(
            f"SELECT {_SQL_SUBBAND_BITS} FROM (SELECT CAST({n} AS BIGINT) AS n)"
        ).fetchone()[0]
        assert sql_b == _subband_bits(n), n


def test_subband_bits_shape():
    """b = 0 at every parity scale (500 / 2000 vectors — the cap must
    not perturb certified history), grows monotonically with N, holds
    the expected (cell, band-bucket) population at _CELL_TARGET, and
    saturates at _BAND_STRIDE (the coordinate-axis construction has
    only stride-many disjoint dims per band)."""
    assert _subband_bits(500) == 0
    assert _subband_bits(2000) == 0
    # r11: _CELL_TARGET 64 shifts the curve one down vs r10 (the
    # measured-recall frontier move: 8189 -> 8524 bp at the 100x
    # operating point); sf0.1's 4000-entry dual index is back to b=0
    assert _subband_bits(4000) == 0
    assert _subband_bits(4097) == 1
    assert _subband_bits(200000) == 6
    # the r10 dual-assignment index feeds ~2N entries: the 100x sweep
    # corpus (200k vectors -> 400k index entries) resolves b = 7
    assert _subband_bits(400000) == 7
    prev = 0
    for e in range(1, 40):
        b = _subband_bits(2**e)
        assert b >= prev
        prev = b
    assert _subband_bits(10**12) == _BAND_STRIDE
    # population invariant below saturation: N / (K * 2^b) <= target
    for n in (10**4, 10**5, 10**6, 10**7):
        b = _subband_bits(n)
        if b < _BAND_STRIDE:
            assert n / (_IVF_K * (1 << b)) <= _CELL_TARGET


def test_band_dims_disjoint():
    """Band keys must draw sign bits from DISJOINT dimensions or the
    bands are correlated and the any-band recall math is wrong: the
    highest bit of band j (stride-1) must not reach band j+1's range,
    and all bands must fit the 64-dim embedding."""
    assert _CELL_BANDS * _BAND_STRIDE <= 64


def test_banded_candidates_duplicate_free_and_subset(spark):
    """Pair-ownership invariants under dual assignment (r10):
    first-matching-band × min-shared-cell ownership must emit every
    pair AT MOST once (no distinct shuffle relied on), and at smoke
    scale b = 0, so the union must equal the DISTINCT pairs sharing at
    least one dual cell — exactly once each, however many cells or
    bands they share."""
    from pyspark.sql import functions as F

    from ecowatt_etl_spark.queries.similarity_queries import (
        _banded_candidates,
        _ivf_cells_dual,
        _trained_centroids,
    )
    from ecowatt_etl_spark.sources.tables import load_table

    cand = _banded_candidates(spark, SF_SMOKE).select("id_a", "id_b")
    n_cand = cand.count()
    assert cand.distinct().count() == n_cand, "duplicate candidate pairs"
    em = load_table(spark, SF_SMOKE, "embeddings")
    cent = F.broadcast(_trained_centroids(spark, SF_SMOKE, em))
    cells = _ivf_cells_dual(spark, SF_SMOKE, em, cent)
    a = cells.select(F.col("vec_id").alias("id_a"), "cid")
    b = cells.select(F.col("vec_id").alias("id_b"), "cid")
    shared = (
        a.join(b, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .count()
    )
    assert n_cand == shared, (
        "b=0 must cover every pair sharing a dual cell exactly once"
    )


def test_q285_recall_is_total_at_parity_scale(spark):
    """At parity scales b = 0 ⇒ the blocking generates every
    within-cell pair, so any truth pair co-located in a cell is found;
    recall below 10000 bp here measures CELL-assignment misses, which
    the audit also exposes (found=false on a same-cell pair would be a
    blocking bug, not an S-curve cost)."""
    from ecowatt_etl_spark.queries.registry import all_queries

    rows = (
        all_queries()["q285_semantic_recall_audit"]
        .fn(spark, SF_ORACLE)
        .collect()
    )
    assert rows, "audit must report at least one decile"
    for r in rows:
        assert r["n_truth"] >= r["n_found"] >= 0
        assert 0 <= r["recall_bp"] <= 10000


def test_ledger_has_no_unknown_states_for_driver_rowed_queries():
    """r8 verdict item 4, made time-robust per the r9 judge: a
    driver-rowed query whose fingerprint cannot be joined to its
    evidence round (stale=None → UNKNOWN) silently weakens the
    staleness ordering the 50-slot window depends on — for ANCHORED
    rounds. A round newer than the latest ``round N: verdict`` commit
    is *pending* (the driver dropped CORRECTNESS_rN.json but the
    verdict commit that pins its evidence parent doesn't exist yet),
    so its fingerprints are legitimately unsnapshottable and it is
    excluded here; the suite must be green at every checkout,
    including the driver-drop-to-verdict window. Still red for an
    anchored OLD round missing fingerprints — run
    tools/evidence_ledger.py --backfill."""
    from tools import evidence_ledger as EL

    anchored = EL.latest_anchored_round()
    led = EL.ledger()
    unknown = sorted(
        n
        for n, r in led.items()
        if r["latest_round"] is not None
        and r["latest_round"] <= anchored
        and r["stale"] is None
    )
    assert not unknown, (
        f"{len(unknown)} driver-rowed queries have UNKNOWN staleness for "
        f"anchored rounds <= r{anchored} "
        f"(run tools/evidence_ledger.py --backfill): {unknown[:10]}"
    )
