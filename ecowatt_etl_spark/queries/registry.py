"""Named-query registry.

Every operator the engine claims (SURVEY §2 inventory + the
beyond-reference pipeline operators) registers here as a callable
``(spark, sf_dir) -> DataFrame`` plus, when the semantics are
ANSI-SQL-expressible, a DuckDB oracle string over the same parquet
tables. ``__spark_entry__.py`` is a thin view over this registry.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None → rows-only check
    doc: str


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query (and optional DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def _load_all() -> None:
    """Import every query module so registrations run."""
    import ecowatt_etl_spark.queries.analytics_queries  # noqa: F401
    import ecowatt_etl_spark.queries.curation_queries  # noqa: F401
    import ecowatt_etl_spark.queries.dedup_queries  # noqa: F401
    import ecowatt_etl_spark.queries.ecowatt_queries  # noqa: F401
    import ecowatt_etl_spark.queries.event_queries  # noqa: F401
    import ecowatt_etl_spark.queries.layout_queries  # noqa: F401
    import ecowatt_etl_spark.queries.multimodal_queries  # noqa: F401
    import ecowatt_etl_spark.queries.relational  # noqa: F401
    import ecowatt_etl_spark.queries.similarity_queries  # noqa: F401
    import ecowatt_etl_spark.queries.text_queries  # noqa: F401
    import ecowatt_etl_spark.queries.timeseries_queries  # noqa: F401
    import ecowatt_etl_spark.queries.tpch_queries  # noqa: F401


# The driver's correctness gate value-checks only the FIRST ~50 entries
# of ``queries()`` in iteration order.  Since round 8 this window is
# COMPUTED, not curated: ``python tools/evidence_ledger.py --window``
# derives it from behavior fingerprints (transitive source closure +
# oracle string) at each round's evidence commit vs HEAD, joined with
# the CORRECTNESS_r*.json rows — never-driver-rowed entries first,
# then queries rewritten this round (same-round certification), then
# older drift stalest-evidence-first.  tests/test_r8_invariants.py is
# red if a rewrite ships without its window slot, or if a slot is
# spent on a current-evidence query while stale ones wait.
#
# r8 ledger summary (tools/evidence_ledger.py, fingerprint v3):
# 0 never-rowed, 97 stale of 289 — the automated closure walk found
# ~80 queries whose shared helpers (scan layer, streaming teardown,
# signature operators) drifted after their last driver row without the
# hand ledger ever noticing; 50 re-certify this round, the remainder
# spill to r9 exactly like the r3–r6 rotation era.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # ---- r8 window (50 slots, regenerated after the prefix_sum
    # width change re-flagged the packing family): 22 rewritten this
    # round (LSH corpus-scaled cap family, Avro commit/deflate,
    # q263/q264 integer DIV, q262/q265/q267 prefix_sum width), then
    # oldest-evidence drift
    "q134_boilerplate_shingles",
    "q135_dedup_impact",
    "q171_tfidf_shingle_pairs",
    "q175_theta_intersection",
    "q226_cross_source_dups",
    "q120_pagerank_neardup",
    "q121_contrastive_triplets",
    "q127_incremental_neardup",
    "q169_sorted_neighborhood",
    "q212_bfs_hops",
    "q219_lsh_recall_audit",
    "q261_avro_roundtrip",
    "q262_sequence_packing",
    "q263_repetition_ratio",
    "q264_mixture_weights",
    "q265_incremental_packing",
    "q267_source_packing",
    "q53_minhash_lsh_pairs",
    "q54_ngram_jaccard_pairs",
    "q57_dedup_clusters",
    "q59_dedup_keep_list",
    "q89_neardup_triangles",
    "q02_filter_in_projection",
    "q03_recode_map",
    "q04_groupby_count",
    "q06_pivot_by_year",
    "q08_distinct_sorted",
    "q40_tumbling_window",
    "q41_sliding_window",
    "q43_sessionize_lag",
    "q46_asof_join",
    "q48_range_lookback",
    "q49a_interval_join",
    "q49c_stream_dedup",
    "q49d_gap_fill_rollup",
    "q49e_stream_serving_table",
    "q50_exact_dedup",
    "q51_hash_dedup",
    "q52_minhash_signatures",
    "q55_simhash",
    "q56_simhash_neardup",
    "q92_stats_moments",
    "q10_minmax_normalize",
    "q11_full_outer_join",
    "q14_anti_join",
    "q15_unpivot",
    "q16_union_by_name",
    "q17_top10_revenue",
    "q18_surrogate_keys",
    "q19_regex_extract_cast",
    # ---- round-8 window cutoff (50) — slots below only order the
    # tail (r9 spill continues from here)
    "q20_try_cast_junk",
    "q21_guarded_ratio",
    "q22_window_yoy",
    "q23_topk_per_group",
    "q24_rollup",
    "q25_percentiles",
    "q26_cube",
    "q27_set_ops",
)
    # q103–q126 TPC-H tail + q140–q170; r05 green (49/50; q176


def all_queries() -> dict[str, QuerySpec]:
    _load_all()
    prio = [n for n in _DRIVER_PRIORITY if n in _REGISTRY]
    rest = [n for n in _REGISTRY if n not in _DRIVER_PRIORITY]
    oracle_backed = [n for n in rest if _REGISTRY[n].oracle is not None]
    rows_only = [n for n in rest if _REGISTRY[n].oracle is None]
    return {n: _REGISTRY[n] for n in prio + oracle_backed + rows_only}


def oracle_map() -> dict[str, str]:
    return {n: s.oracle for n, s in all_queries().items() if s.oracle is not None}
