import sys, math, os, time
sys.path.insert(0, "/root/repo")
import duckdb
from ecowatt_etl_spark.queries.registry import all_queries
from ecowatt_etl_spark.session import get_spark

SF = os.environ.get("PARITY_SF", "/root/testdata/sf0.1")
spark = get_spark(app_name="parity-all")
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted([tuple(r[i] for i in order) for r in rows],
                  key=lambda t: tuple((v is None, str(v)) for v in t))
def eq(a, b):
    if a is None or b is None: return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb): return math.isnan(fa) and math.isnan(fb)
        return str(fa) == str(fb)
    return str(a) == str(b)
n_ok = n_bad = n_skip = 0
for name, spec in all_queries().items():
    if spec.oracle is None:
        n_skip += 1
        continue
    t0 = time.time()
    try:
        sdf = spec.fn(spark, SF)
        srows = [tuple(r) for r in sdf.collect()]
        res = con.execute(spec.oracle)
        dcols = [d[0] for d in res.description]; drows = [tuple(r) for r in res.fetchall()]
        ok = (sorted(sdf.columns) == sorted(dcols) and len(srows) == len(drows))
        if ok:
            ns, nd = norm(srows, sdf.columns), norm(drows, dcols)
            ok = all(all(eq(a, b) for a, b in zip(rs, rd)) for rs, rd in zip(ns, nd))
        if ok:
            n_ok += 1
        else:
            n_bad += 1
            print(f"FAIL {name} ({time.time()-t0:.1f}s) spark={len(srows)} duck={len(drows)}", flush=True)
    except Exception as e:
        n_bad += 1
        print(f"ERROR {name}: {str(e)[:200]}", flush=True)
print(f"DONE ok={n_ok} bad={n_bad} rows_only_skipped={n_skip}", flush=True)
spark.stop()
