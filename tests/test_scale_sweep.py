"""Exact-parity spot-check at sf0.1 for magnitude-sensitive queries.

The full oracle-parity suite runs at sf0.01; these queries carry
arithmetic whose overflow headroom shrinks with data volume
(HUGEINT/decimal(38,0) products of micro/pico units, cross-multiplied
rationals, digest sums). A 10× scale-up is exactly where a silent
precision cliff would first appear — so the riskiest ones get the
same exact value check at sf0.1.
"""

from __future__ import annotations

import math

import pytest

SF_BIG = "/root/testdata/sf0.1"

_SWEEP = [
    "q165_time_weighted_avg",   # micro-value × micro-duration products
    "q173_pareto_suppliers",    # picounit sums, cross-multiplied dominance
    "q175_theta_intersection",  # 2^60-scaled estimates
    "q181_linear_attribution",  # integer share splits + remainders
    "q182_ratio_to_report",     # picounit revenue, share basis points
    "q184_diurnal_profile",     # cross-multiplied mean deviation
    "q186_segment_reconcile",   # 60-bit digest sums
    "q200_dataset_card",        # decimal-quantized mean + doubled median
    "q262_sequence_packing",    # token-offset integer division bins
    "q265_incremental_packing", # committed-offset continuation + audit
    "q266_embedding_covariance",  # decimal(38,0) fixed-point product sums
]


@pytest.fixture(scope="module")
def duck_big():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_BIG}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        [tuple(r[i] for i in order) for r in rows],
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


def _veq(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return str(fa) == str(fb)
    return str(a) == str(b)


@pytest.mark.parametrize("name", _SWEEP)
def test_exact_parity_at_sf01(spark, duck_big, name):
    from ecowatt_etl_spark.queries.registry import all_queries

    spec = all_queries()[name]
    sdf = spec.fn(spark, SF_BIG)
    s_rows = _norm([tuple(r) for r in sdf.collect()], sdf.columns)
    res = duck_big.execute(spec.oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = _norm([tuple(r) for r in res.fetchall()], d_cols)
    assert sorted(sdf.columns) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    for a, b in zip(s_rows, d_rows):
        assert all(_veq(x, y) for x, y in zip(a, b)), (a, b)
