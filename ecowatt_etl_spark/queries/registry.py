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
# of ``queries()`` in iteration order.  Spend those slots deliberately:
# oracle-backed queries with no prior driver evidence first (the SURVEY
# §2 relational core and the LLM-pipeline text/similarity families),
# then queries whose implementation changed this round, then everything
# else oracle-backed, with rows-only queries last so they never consume
# a value-check slot.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # Round-5 rotation — drain the r4 spill (VERDICT r4 item 1: freeze
    # net-new queries, spend every slot on oracle-backed queries with
    # no driver row yet). Evidence ledger: r01 green q01–q09, q40–q49e,
    # q50–q56, q80/q83, q90/q92; r02 green q10–q37, q39, q47, q57–q66,
    # q70–q76, q82, qe03/qe04; r03 green (50/50) q38 + curation
    # q93–q102/q121/q122/q128/q130, dedup q89/q119/q120/q127/q134/
    # q135, event q49f–q49j/q45b/q131–q133/q136, multimodal q84/q137,
    # relational q69/q85/q101/q104, similarity q67/q87/q117/q118/
    # q123/q129, text q68/q78/q79/q86/q138, TPC-H q106/q107/q115;
    # r04 green (50/50) q140–q152 + TPC-H tail q103/q105/q108–q114/
    # q116/q124–q126, streaming re-checks q44/q45/q49/q49b, reworked
    # q65/qe05/qe06, and the r4 additions q153–q170.
    # Round-5 window (the ~50-slot cutoff falls after the last entry
    # of the second block below): (a) the riskiest never-checked
    # shapes per the r4 verdict — streaming replay/GroupState, live
    # Derby JDBC, artifact round-trip, SQL scripting, custom Python
    # data sources, UDTF, cogroup, mapInArrow, k-means train; (b) the
    # three queries oracle-backed THIS round (qe07 golden minmax
    # replay, q63 exact-fold re-score, q91 exact-int closed form) —
    # their r1 `err: no_oracle` rows convert to green on re-check;
    # (c) the q171+ bulk in registry order. The remainder (q210+,
    # ~42 queries) SPILLS to round 6 — rotate it to the front then,
    # exactly as this round promoted the r4 spill.
    # (a) riskiest never-checked shapes first
    "q250_stream_late_audit", "q252_stream_clamped_balance",
    "q237_jdbc_roundtrip", "q247_incremental_view_refresh",
    "q248_sql_scripting", "q193_python_datasource",
    "q194_python_stream_source", "q213_dynamic_udtf",
    "q190_cogroup_order_audit", "q255_charset_profile",
    "q88_kmeans_train",
    # (b) oracle-backed in round 5 — stale r1 rows convert to green
    "qe07_normalized_scores", "q63_cosine_topk_matmul",
    "q91_regr_grouped_map",
    # (c) the r4-spill bulk, registry order (36 slots to the cutoff)
    "q171_tfidf_shingle_pairs", "q172_chisq_variant",
    "q173_pareto_suppliers", "q174_stream_ohlc",
    "q175_theta_intersection", "q176_skew_report", "q177_winsorize",
    "q178_pit_join", "q179_bloom_audit", "q180_length_calibration",
    "q181_linear_attribution", "q182_ratio_to_report", "q183_top_paths",
    "q184_diurnal_profile", "q185_feature_hashing",
    "q186_segment_reconcile", "q187_lateral_topk",
    "q188_right_to_erasure", "q189_compact_files",
    "q191_chunk_dedup_report", "q192_ngram_overlap_report",
    "q195_sql_udf", "q196_ivf_persist_serve",
    "q197_ivf_incremental_ingest", "q198_curation_funnel",
    "q199_pipe_syntax", "q200_dataset_card", "q201_filtered_ann",
    "q202_hybrid_rrf", "q203_forecast_backtest",
    "q204_cusum_changepoint", "q205_benford_audit", "q206_gini_revenue",
    "q207_basket_rules", "q208_rfm_segments", "q209_join_size_estimate",
    # ---- round-5 window cutoff (50) — everything below spills to r6
    "q210_k_anonymity", "q211_cuped", "q212_bfs_hops",
    "q214_memorization_spans", "q215_bootstrap_ci", "q216_mannwhitney",
    "q217_ks_test", "q218_spearman", "q219_lsh_recall_audit",
    "q220_mixed_language", "q221_permutation_test",
    "q222_parquet_meta_audit", "q223_column_stats",
    "q224_hll_merge_audit", "q225_dp_histogram",
    "q226_cross_source_dups", "q227_sequential_monitoring",
    "q228_map_profile", "q229_watermark_tuning", "q230_schema_diff",
    "q231_equidepth_histogram", "q232_fd_discovery", "q233_median_ci",
    "q234_stats_merge_audit", "q235_delta_method",
    "q236_conformal_intervals", "q238_drift_report",
    "q239_diff_in_diff", "q240_kaplan_meier", "q241_power_analysis",
    "q242_logrank", "q243_holt_forecast", "q244_observed_metrics",
    "q245_nb_quality_classifier", "q246_record_linkage",
    "q249_gate_calibration", "q251_clamped_balance",
    "q253_rolling_active_users", "q254_parameterized_sql",
    "q256_retrieval_self_eval", "q257_null_semantics",
    "q258_federated_join",
)


def all_queries() -> dict[str, QuerySpec]:
    _load_all()
    prio = [n for n in _DRIVER_PRIORITY if n in _REGISTRY]
    rest = [n for n in _REGISTRY if n not in _DRIVER_PRIORITY]
    oracle_backed = [n for n in rest if _REGISTRY[n].oracle is not None]
    rows_only = [n for n in rest if _REGISTRY[n].oracle is None]
    return {n: _REGISTRY[n] for n in prio + oracle_backed + rows_only}


def oracle_map() -> dict[str, str]:
    return {n: s.oracle for n, s in all_queries().items() if s.oracle is not None}
