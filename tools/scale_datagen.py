"""Synthetic scale-up generator for scaling-curve measurements.

Replicates a base warehouse directory K times into $SCALE_OUT with
structure-preserving transforms, so the headline bench can be measured
at 10x / 100x the gate scale and the runtime-vs-SF curve recorded in
SCALE.md (the direct evidence behind every "this shape scales" claim):

* region/nation — fixed dimensions, copied as-is (TPC-H semantics:
  dims do not scale with SF).
* customer/supplier/part/orders/lineitem — copy k offsets every
  primary AND foreign key by k * (base_max_key + 1), so each copy is
  a self-consistent shard: join fan-outs, key densities, and
  group-by cardinalities scale exactly like dbgen's SF does.
* events — ids offset; timestamps staggered by k seconds so replicas
  don't collide on identical event times (same hour/session windows,
  K x the rows per window — how real traffic growth looks).
* documents — doc_id offset; copy k's text is a deterministic
  stride-permutation of the base tokens (multiplicative index map,
  stride coprime with the token count). Token multisets — and thus
  length/quality/vocabulary statistics — are preserved exactly,
  while shingle sets across copies are disjoint, so dedup workloads
  scale by corpus size rather than exploding quadratically on
  artificial cross-copy near-duplicates.
* embeddings — vec_id offset; copy k permutes the 64 dimensions with
  a copy-specific permutation: within-copy distance structure is
  preserved bit-for-bit, cross-copy vectors decorrelate, and ANN
  queries (vec_id < NQ probes hit copy 0) see a K x corpus.

Usage: SCALE_K=10 SCALE_OUT=/tmp/sf_x10 python tools/scale_datagen.py
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SCALE_SRC", "/root/testdata/sf0.1")
K = int(os.environ.get("SCALE_K", "10"))
OUT = os.environ.get("SCALE_OUT", f"/tmp/sf_x{K}")

# table -> columns to offset by k * (base max of the COLUMN'S home
# table key + 1); FK entries name (home_table, home_column)
_OFFSET_COLS: dict[str, dict[str, tuple[str, str]]] = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}
_COPY_AS_IS = ("region", "nation")


def _coprime_stride(n: int, k: int) -> int:
    s = 2 * k + 1
    while math.gcd(s, n) != 1:
        s += 2
    return s


def _permute_text(text: str, k: int) -> str:
    toks = text.split()
    n = len(toks)
    if n < 2:
        return text
    s = _coprime_stride(n, k)
    return " ".join(toks[(s * i) % n] for i in range(n))


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    base = {
        t: pq.read_table(f"{SRC}/{t}.parquet")
        for t in list(_OFFSET_COLS) + list(_COPY_AS_IS)
    }
    maxima = {
        (ht, hc): pa.compute.max(base[ht][hc]).as_py() + 1
        for cols in _OFFSET_COLS.values()
        for (ht, hc) in cols.values()
    }
    for t in _COPY_AS_IS:
        pq.write_table(base[t], f"{OUT}/{t}.parquet")
    for t, cols in _OFFSET_COLS.items():
        copies = []
        for k in range(K):
            tbl = base[t]
            arrays, names = [], tbl.column_names
            emb_perm = None
            if t == "embeddings" and k > 0:
                dim = len(tbl["embedding"][0])
                emb_perm = np.random.default_rng(k).permutation(dim)
            for name in names:
                col = tbl[name]
                if name in cols:
                    off = k * maxima[cols[name]]
                    col = pa.compute.add(col, off)
                elif t == "events" and name == "ts" and k > 0:
                    col = pa.compute.add(
                        col, pa.scalar(k * 1_000_000, type=pa.duration("us"))
                    )
                elif t == "documents" and name == "text" and k > 0:
                    col = pa.array(
                        [_permute_text(v.as_py(), k) for v in col.combine_chunks()],
                        type=pa.string(),
                    )
                elif t == "documents" and name == "n_chars" and k > 0:
                    # recompute: permutation normalizes inter-token
                    # whitespace, so char counts can shift slightly
                    txt = [
                        _permute_text(v.as_py(), k)
                        for v in tbl["text"].combine_chunks()
                    ]
                    col = pa.array([len(x) for x in txt], type=pa.int64())
                elif t == "embeddings" and name == "embedding" and k > 0:
                    mat = np.array(
                        [v.as_py() for v in col.combine_chunks()],
                        dtype=np.float32,
                    )[:, emb_perm]
                    col = pa.array(list(mat), type=tbl.schema.field(name).type)
                arrays.append(col)
            copies.append(pa.table(dict(zip(names, arrays))))
        out = pa.concat_tables(copies)
        pq.write_table(out, f"{OUT}/{t}.parquet")
        print(f"{t}: {len(base[t])} -> {len(out)} rows", flush=True)


if __name__ == "__main__":
    main()
