"""Full-registry oracle parity sweep at an arbitrary scale factor.

Runs EVERY oracle-backed registry query against its DuckDB oracle at
$PARITY_SF (default sf0.1 — 10x the driver's gate scale) with the same
normalization the driver applies (sort columns by name, compare values
as strings, NaN==NaN). The handful of file-path-pinned oracles
(q137/q222/q230 — parquet_metadata()/parquet_schema()/binaryFile
audits, whose DuckDB twins must name real files because table views
carry no file paths) are parameterized here by rewriting the pinned
ORACLE_SF_DIR (and its scratch-root bucket token) to the sweep
directory, so the sweep covers the full oracle-backed registry instead
of skipping them.

Usage:  PARITY_SF=/root/testdata/sf0.1 python tools/parity_sweep.py
        PARITY_SF=... python tools/parity_sweep.py q250 q252   # filter
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from ecowatt_etl_spark.operators.bucketing import bucket_token
from ecowatt_etl_spark.queries.registry import all_queries
from ecowatt_etl_spark.session import get_spark
from ecowatt_etl_spark.sources.tables import ORACLE_SF_DIR

SF = os.environ.get("PARITY_SF", "/root/testdata/sf0.1")


def retarget(oracle: str) -> str:
    """Point a file-path-pinned oracle at the sweep directory."""
    return oracle.replace(
        bucket_token(ORACLE_SF_DIR), bucket_token(SF)
    ).replace(ORACLE_SF_DIR, SF)


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        [tuple(r[i] for i in order) for r in rows],
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return str(fa) == str(fb)
    return str(a) == str(b)


def main() -> None:
    only = sys.argv[1:]
    spark = get_spark(app_name="parity-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{SF}/{t}.parquet')"
        )
    n_ok = n_bad = n_skip = 0
    for name, spec in all_queries().items():
        if only and not any(name.startswith(p) for p in only):
            continue
        if spec.oracle is None:
            n_skip += 1
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, SF)
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(retarget(spec.oracle))
            dcols = [d[0] for d in res.description]
            drows = [tuple(r) for r in res.fetchall()]
            ok = sorted(sdf.columns) == sorted(dcols) and len(srows) == len(
                drows
            )
            if ok:
                ns, nd = norm(srows, sdf.columns), norm(drows, dcols)
                ok = all(
                    all(eq(a, b) for a, b in zip(rs, rd))
                    for rs, rd in zip(ns, nd)
                )
            if ok:
                n_ok += 1
            else:
                n_bad += 1
                print(
                    f"FAIL {name} ({time.time() - t0:.1f}s) "
                    f"spark={len(srows)} duck={len(drows)}",
                    flush=True,
                )
        except Exception as e:  # noqa: BLE001 — sweep must finish
            n_bad += 1
            print(f"ERROR {name}: {str(e)[:200]}", flush=True)
    print(
        f"DONE ok={n_ok} bad={n_bad} rows_only_skipped={n_skip}", flush=True
    )
    spark.stop()


if __name__ == "__main__":
    main()
