"""Physical-plan assertions — the scale contract, enforced.

Correctness tests say the answers are right; these say the PLANS are
right: filters reach the parquet scan, scans prune columns, small dims
broadcast instead of shuffling, scan-local operators stay scan-local,
per-group top-k prunes before the final shuffle. A regression that
keeps answers correct but degrades any of these (e.g. a UDF that blocks
pushdown, a join that silently becomes sort-merge) fails here long
before it would show up as a 100 TB incident.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    from ecowatt_etl_spark.queries.registry import all_queries

    df = all_queries()[name].fn(spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "q01_pricing_summary")
    assert "PushedFilters: [" in plan
    # the shipdate predicate must be pushed, not evaluated post-scan only
    assert "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0]


def test_column_pruning_reaches_scan(spark):
    plan = _plan(spark, "q05_multiagg_conditional")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # lineitem has 16 columns; this query needs few — comment alone
    # doesn't prove it, the ReadSchema does
    assert "l_comment" not in read_schema
    assert "l_shipdate" not in read_schema


def test_star_join_broadcasts_dims(spark):
    plan = _plan(spark, "q12_star_join")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_semi_join_is_semi_not_inner_distinct(spark):
    plan = _plan(spark, "q13_semi_join")
    assert "LeftSemi" in plan


def test_embedding_norms_has_no_shuffle(spark):
    plan = _plan(spark, "q60_embedding_norms")
    assert "Exchange" not in plan, "norms must be scan-local (array fold)"


def test_minhash_signatures_single_shuffle(spark):
    """Explode → codegen'd md5 → ONE aggregate: exactly one
    key-partitioned shuffle (on doc_id), with map-side partial mins
    before it. The round-robin exchange is the small-file fan-out
    (operators/dedup.py fan_out — structural no-op at scale), not part
    of the aggregation pattern."""
    plan = _plan(spark, "q52_minhash_signatures")
    tree = plan.split("\n\n")[0]
    # formatted-mode tree lines don't show partitioning; resolve each
    # Exchange node's Arguments from the details section
    import re

    ids = re.findall(r"Exchange \((\d+)\)", tree)
    kinds = []
    for i in ids:
        m = re.search(rf"\({i}\) Exchange\n(?:.*\n)*?Arguments: (\w+)", plan)
        kinds.append(m.group(1) if m else "?")
    hash_shuffles = [k for k in kinds if k.startswith("hashpartitioning")]
    rr = [k for k in kinds if k.startswith("RoundRobinPartitioning")]
    assert len(hash_shuffles) == 1, (kinds, tree)
    assert len(hash_shuffles) + len(rr) == len(kinds), (kinds, tree)
    assert "HashAggregate" in tree


def test_simhash_neardup_no_cartesian(spark):
    """Band self-join must stay an equi-join on the band key (broadcast
    or shuffled-hash), never a cartesian/nested-loop pairing."""
    tree = _plan(spark, "q56_simhash_neardup").split("\n\n")[0]
    assert "CartesianProduct" not in tree and "NestedLoop" not in tree
    # signature pipeline appears at most twice (once per join side);
    # anything more means the aggregate is being recomputed downstream
    assert tree.count("Scan parquet") <= 2


def test_topk_per_group_uses_window_group_limit(spark):
    plan = _plan(spark, "q23_topk_per_group")
    assert "WindowGroupLimit" in plan, (
        "rank<=k must prune per-partition before the final window sort"
    )


def test_cosine_topk_broadcasts_queries(spark):
    plan = _plan(spark, "q61_cosine_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_text_quality_is_single_scan_no_python(spark):
    plan = _plan(spark, "q71_quality_scores")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
        "quality features must be pure Column expressions, not UDFs"
    )


def test_no_row_at_a_time_python_anywhere(spark):
    """Row-at-a-time Python UDFs are banned engine-wide; Python is only
    allowed Arrow-batched (mapInPandas / pandas_udf)."""
    from ecowatt_etl_spark.queries.registry import all_queries

    for name in [
        "q21_guarded_ratio",
        "q50_exact_dedup",
        "q55_simhash",
        "q73_fingerprints",
    ]:
        df = all_queries()[name].fn(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert "BatchEvalPython" not in plan, f"{name} uses a row-wise Python UDF"


def test_ivf_topk_no_cartesian_on_corpus(spark):
    """IVF: centroid fan-outs must be broadcast products (tiny side),
    and the probe ⋈ cells join an equi-join on cid — never a
    cartesian pairing of corpus rows."""
    plan = _plan(spark, "q65_ivf_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_bm25_no_python_and_no_cartesian(spark):
    """BM25: the whole scoring pipeline must stay JVM-side (tokenize,
    tf, saturation, pivoted add are Column expressions; idf enters as
    a literal), and the 1-row stats frame must ride a broadcast, not a
    cartesian pairing."""
    plan = _plan(spark, "q153_bm25_search")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_ivfpq_refine_no_cartesian(spark):
    """IVF-PQ serve path: routing, code joins, and the ADC lookup join
    are all broadcast/equi joins on small or keyed sides — a cartesian
    against corpus rows would be the 100 TB failure mode."""
    plan = _plan(spark, "q156_ivfpq_topk")
    assert "CartesianProduct" not in plan


def test_semantic_neardup_pairs_by_cell_key(spark):
    """Trained-cell near-dup: the pair space must form via the cid
    equi-join (SortMerge/Hash on the cell key), never a cartesian of
    corpus rows."""
    plan = _plan(spark, "q155_semantic_neardup")
    assert "CartesianProduct" not in plan


def test_heavy_hitters_reuses_count_exchange(spark):
    """Exact heavy hitters: the corpus-total branch shares the token
    count's shuffle. The static plan shows the pipeline twice; AQE
    dedupes identical exchanges at runtime — assert on the FINAL
    (post-execution) adaptive plan."""
    from ecowatt_etl_spark.queries.registry import all_queries

    df = all_queries()["q76_vocab_heavy_hitters"].fn(spark, SF_SMOKE)
    df.collect()  # materialize so AQE finalizes the plan
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan, (
        "total-tokens branch must reuse the token-count shuffle, "
        "not rescan + rehash the corpus"
    )


def test_gap_fill_fact_side_is_one_aggregate(spark):
    """Gap-filled rollup: the events fact feeds exactly two aggregate
    pipelines (sparse rollup + 1-row bounds) and the grid join is
    broadcast — no sort-merge of the fact against the grid."""
    plan = _plan(spark, "q49d_gap_fill_rollup")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_bucketed_join_elides_join_shuffle(spark):
    """Fact ⋈ fact on bucketed tables: the join itself must be
    exchange-free (co-located buckets), leaving the tiny final
    aggregate as the plan's only shuffle."""
    plan = _plan(spark, "q32_bucketed_join")
    tree = plan.split("\n\n")[0]
    shuffles = [l for l in tree.splitlines() if "Exchange" in l]
    assert len(shuffles) == 1, tree
    assert "SortMergeJoin" in tree
    assert "Bucketed: true" in plan


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Facts written partitionBy(YEAR) must give static partition
    pruning: a YEAR filter shows up as PartitionFilters on the scan,
    not a post-scan filter over all partitions."""
    from pyspark.sql import functions as F

    from ecowatt_etl_spark.sources.tables import load_table

    out = str(tmp_path / "orders_by_year")
    o = load_table(spark, SF_SMOKE, "orders").withColumn(
        "YEAR", F.year("o_orderdate")
    )
    o.write.mode("overwrite").partitionBy("YEAR").parquet(out)

    df = spark.read.parquet(out).filter(F.col("YEAR") == 1995)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "YEAR" in pf
    assert df.count() > 0


def test_stratified_sample_is_scan_local(spark):
    """q93's keep decision is a pure filter — any Exchange would mean
    the sampling shuffles data it should only be scanning."""
    plan = _plan(spark, "q93_stratified_sample")
    assert "Exchange" not in plan


def test_decontaminate_broadcasts_eval_set(spark):
    """q96: the eval-set hash side must broadcast — a sort-merge join
    here would shuffle the full corpus shingle stream on n-gram keys."""
    plan = _plan(spark, "q96_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pii_redact_is_scan_local(spark):
    plan = _plan(spark, "q94_pii_redact")
    assert "Exchange" not in plan


def _exchange_args(plan: str) -> list[str]:
    """Partitioning argument of every Exchange node, tree order
    (formatted mode hides partitioning in the details section)."""
    import re

    tree = plan.split("\n\n")[0]
    args = []
    for i in re.findall(r"Exchange \((\d+)\)", tree):
        m = re.search(rf"\({i}\) Exchange\n(?:.*\n)*?Arguments: ([^,]+)", plan)
        args.append(m.group(1) if m else "?")
    return args


def test_funnel_windows_share_one_exchange(spark):
    """q49f chains four stage-reach Windows over the same user_id
    partitioning; if any stage re-shuffled, the funnel would cost four
    corpus-sized exchanges at 100 TB instead of one. (SinglePartition
    is the final 4-counter global agg — constant-size input.)"""
    plan = _plan(spark, "q49f_funnel")
    hashed = [a for a in _exchange_args(plan) if a.startswith("hashpartitioning")]
    assert len(hashed) == 1, hashed
    assert "user_id" in hashed[0]
    assert plan.split("\n\n")[0].count("Window") >= 4


def test_cohort_corpus_shuffle_is_user_id(spark):
    """q49g's only corpus-sized shuffle must be the per-user reduction;
    the (cohort, offset) agg and retention window run on O(weeks^2)
    post-aggregation rows."""
    plan = _plan(spark, "q49g_cohort_retention")
    tree = plan.split("\n\n")[0]
    assert "Generate" in tree  # active-week fan-out is post-agg explode
    hashed = [a for a in _exchange_args(plan) if a.startswith("hashpartitioning")]
    assert any("user_id" in a for a in hashed), hashed


def test_doc_chunking_is_scan_local(spark):
    """q79's doc->chunk explosion (tokenize, slice, hash) must stay
    inside the projection — any Exchange would shuffle the full corpus
    text to produce a row-local transform."""
    plan = _plan(spark, "q79_doc_chunks")
    assert "Exchange" not in plan
    assert "Generate" in plan  # the chunk-index explode


def test_curation_e2e_never_shuffles_on_ngram_keys(spark):
    """q100's decontamination stage must keep the eval hash set on the
    broadcast side — a sort-merge join on n-gram keys would shuffle the
    exploded corpus shingle stream at 100 TB."""
    plan = _plan(spark, "q100_curation_e2e")
    tree = plan.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree
    # the only h-keyed exchange allowed is the EVAL side's own distinct
    # (structurally tiny, feeds the broadcast); the corpus stream joins
    # via broadcast hash, never a sort-merge shuffle on n-gram keys
    assert "SortMergeJoin" not in tree
    h_exchanges = [a for a in _exchange_args(plan) if a.startswith("hashpartitioning(h")]
    assert len(h_exchanges) <= 1, h_exchanges


def test_q106_dims_broadcast_fact_filter_pushed(spark):
    """Q9 shape: part/supplier/nation broadcast; the only sort-merge
    candidate is the orders equi-join (fact-fact, AQE decides); the
    part-name filter prunes before the fact joins."""
    plan = _plan(spark, "q106_nation_year_profit")
    assert plan.count("BroadcastHashJoin") >= 3
    read_schemas = plan.split("ReadSchema:")
    # lineitem scan must not read l_comment-equivalents it doesn't need
    assert all("l_returnflag" not in rs.splitlines()[0] for rs in read_schemas[1:])


def test_q111_topk_is_take_ordered(spark):
    """Q18 shape: the final top-20 must be TakeOrderedAndProject (per-
    partition prune + single merge), never a global Sort + Limit."""
    plan = _plan(spark, "q111_large_orders")
    assert "TakeOrderedAndProject" in plan
    tree = plan.split("\n\n")[0]
    assert "Sort " not in tree or "TakeOrderedAndProject" in tree


def test_q110_blacklist_is_broadcast_anti(spark):
    """Q16 shape: the NOT-IN complaint filter must plan as a broadcast
    anti join, not a shuffled one."""
    plan = _plan(spark, "q110_supplier_relation")
    assert "LeftAnti, BuildRight" in plan or (
        "LeftAnti" in plan and "BroadcastHashJoin" in plan
    )


def test_q112_derives_single_side_prefilters(spark):
    """Q19 shape: Catalyst must derive the implied per-side prefilters
    from the OR-of-ANDs and push the lineitem quantity envelope into
    the scan."""
    plan = _plan(spark, "q112_disjunctive_pred")
    pushed = [
        seg.split("]")[0]
        for seg in plan.split("PushedFilters: [")[1:]
    ]
    assert any("l_quantity" in p for p in pushed), pushed


def test_q117_projection_is_scan_local(spark):
    """JL projection must stay a scan-local projection: no Exchange in
    the plan at all."""
    plan = _plan(spark, "q117_random_projection")
    assert "Exchange" not in plan


def test_q118_single_aggregate_shuffle(spark):
    """posexplode + dim-keyed agg: exactly one hash-partitioned
    exchange (the 64-key aggregate)."""
    import re

    plan = _plan(spark, "q118_embedding_dim_stats")
    tree = plan.split("\n\n")[0]
    ids = re.findall(r"Exchange \((\d+)\)", tree)
    kinds = []
    for i in ids:
        m = re.search(rf"\({i}\) Exchange\n(?:.*\n)*?Arguments: (\w+)", plan)
        kinds.append(m.group(1) if m else "?")
    assert len([k for k in kinds if k.startswith("hashpartitioning")]) == 1, kinds


def test_q127_batch_bands_broadcast(spark):
    """Incremental dedup: at gate scale the optimizer should still
    pick a broadcast for the (here, small) batch band keys — from the
    checkpointed index's REAL size stats, not a hint. The hint was
    removed after the 100x probe: q127's "batch" is a fixed fraction
    of the corpus, so forcing a broadcast made the build side grow
    with corpus size (measured driver OOM at 100x); unhinted, the
    same plan degrades gracefully to a shuffled equi-join when the
    batch is genuinely large."""
    plan = _plan(spark, "q127_incremental_neardup")
    assert "BroadcastHashJoin" in plan
    # Pin the PLAN property (no forced build side), not the source
    # text (r6 ADVICE — a comment mentioning the API or a hint moved
    # into a helper defeated the old inspect.getsource check): a
    # broadcast() hint anywhere in q127's tree would survive analysis
    # as ResolvedHint (strategy=broadcast). The e-arm's deliberate
    # MERGE hints stay legal.
    from ecowatt_etl_spark.queries.registry import all_queries

    from tests.conftest import SF_ORACLE

    df = all_queries()["q127_incremental_neardup"].fn(spark, SF_ORACLE)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "strategy=broadcast" not in analyzed, (
        "q127 must not hint-force a broadcast build side"
    )


def test_no_query_plan_recomputes_sources_excessively(spark):
    """Global recompute cap: no registered query's physical plan may
    contain more than 16 source scans. Catalyst doesn't dedup identical
    lazy subtrees across join arms, so a derived frame referenced N
    times executes N times unless materialized — this caught q89's
    32-scan wedge-close and q53's 16-scan verify pipeline (both now
    checkpoint their shared index). tools/audit_scans.py prints the
    full ranked list.

    Per-query exemption: q223's r12 shape (the 100x multi-distinct
    Expand OOM fix, NDV fan-out removed in r12) deliberately scans
    each audited COLUMN once for its raw-typed single-distinct
    aggregate plus each of the 10 tables once for the wide min/max
    aggregate — 61 scans, but every NDV scan is pruned to a single
    column (total bytes = the old two-full-scans shape), pinned
    exactly by test_q223_scan_shape below."""
    import sys

    sys.path.insert(0, ".")
    from ecowatt_etl_spark.queries.registry import all_queries
    from tools.audit_scans import SKIP_PREFIXES, scan_count

    caps = {"q223_column_stats": 61}
    worst = []
    for name, spec in all_queries().items():
        if name.startswith(SKIP_PREFIXES):
            continue
        c = scan_count(spark, spec.fn(spark, SF_SMOKE))
        if c > caps.get(name, 16):
            worst.append((c, name))
    assert not worst, f"plans recompute sources: {sorted(worst, reverse=True)}"


def test_runtime_bloom_filter_prunes_shuffle_join(spark):
    """Runtime row-level filtering: when a selectively-filtered build
    side feeds a shuffle join, Catalyst injects a bloom_filter_agg on
    the build side and a BloomFilterMightContain predicate on the probe
    side — probe rows that cannot match are dropped BEFORE the shuffle.
    At 100 TB this is the difference between shuffling the whole fact
    table and shuffling only the ~matching fraction. Locally the
    application-side scan is far below the 10 GiB default threshold, so
    the test scopes the thresholds down (and disables broadcast to
    force a shuffle join — broadcast joins get the cheaper DPP/reuse
    path instead); on a cluster the defaults fire on real sizes."""
    from pyspark.sql import functions as F

    overrides = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "10KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(SF_SMOKE + "/lineitem.parquet")
        od = spark.read.parquet(SF_SMOKE + "/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("sum_qty"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "BloomFilterMightContain" in plan or "might_contain" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_variant_props_single_hash_aggregate(spark):
    """q136: variant extraction must stay a one-shuffle HASH aggregate.
    Variant-typed agg children (or a declarative MIN over a string
    buffer) silently demote the whole aggregate to SortAggregate — a
    full partial sort of the scan at 100 TB; the query's
    project-then-collect_set structure exists to prevent exactly that."""
    plan = _plan(spark, "q136_variant_props")
    assert "SortAggregate" not in plan
    assert "ObjectHashAggregate" in plan or "HashAggregate" in plan
    assert plan.count("Exchange") <= 2  # one shuffle (+AQE wrapper noise)


def test_binary_ingest_prunes_payload_and_stays_scan_local(spark):
    """q137: metadata projection over binaryFile must not shuffle and
    must not read the content column (a petabyte listing, not a read)."""
    plan = _plan(spark, "q137_binary_ingest")
    assert "Exchange" not in plan
    assert "content" not in plan.split("ReadSchema:")[1].splitlines()[0]


def test_sentence_udtf_is_arrow_and_scan_local(spark):
    """q138: the UDTF lateral join must run Arrow-batched (not
    row-pickled) and stay scan-local — a generator expansion needs no
    shuffle."""
    plan = _plan(spark, "q138_sentence_udtf")
    assert "ArrowEvalPythonUDTF" in plan
    assert "BatchEvalPythonUDTF" not in plan
    assert "Exchange" not in plan


def test_q140_semi_join_with_pushed_quarter_filter(spark):
    """TPC-H Q4 shape: the EXISTS must stay a semi-join (one existence
    probe, no distinct-then-inner), the quarter filter must reach the
    orders scan, and the lineitem side must prune to the join columns."""
    plan = _plan(spark, "q140_priority_late_count")
    assert "LeftSemi" in plan
    assert "o_orderdate" in plan.split("PushedFilters")[1].split("]")[0]
    li_schema = [
        seg.splitlines()[0]
        for seg in plan.split("ReadSchema:")[1:]
        if "l_orderkey" in seg.splitlines()[0]
    ]
    assert li_schema and all("l_extendedprice" not in s for s in li_schema)


def test_q141_single_aggregate_with_pushed_year_filter(spark):
    """TPC-H Q12 shape: the high/low priority split must be ONE hash
    aggregate (conditional sums), not two filtered passes, and the year
    filter must reach the lineitem scan."""
    import re

    plan = _plan(spark, "q141_shipclass_priority")
    assert "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0]
    # partial + final, one pair (formatted mode prints tree + details,
    # so count distinct operator ids, not substring occurrences)
    assert len(set(re.findall(r"HashAggregate \((\d+)\)", plan))) == 2


def test_q143_evolved_read_nullfills_missing_column(spark):
    """Schema evolution: the merged read must surface s_acctbal for
    pre-evolution files as NULL (count matches the evolved half only),
    and the read schema must carry the evolved column."""
    from pyspark.sql import functions as F

    from ecowatt_etl_spark.queries.registry import all_queries

    rows = all_queries()["q143_schema_evolution"].fn(spark, SF_SMOKE).collect()
    assert rows
    total = sum(r["n_suppliers"] for r in rows)
    with_bal = sum(r["n_with_bal"] for r in rows)
    assert 0 < with_bal < total  # both generations present, nulls real


def test_q146_partition_pruning_reaches_listing(spark):
    """The day predicate must resolve as a PartitionFilter (directory
    pruning), not a data filter: only the selected day's partition may
    survive into the scan."""
    plan = _plan(spark, "q146_partitioned_write_prune")
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "2024-01-15" in pf or "d#" in pf
    # the day predicate is FULLY consumed by the listing: no residual
    # post-scan Filter node remains in the tree
    tree = plan.split("\n\n")[0]
    assert "Filter" not in tree, tree


def _hash_exchange_count(plan: str) -> int:
    import re

    tree = plan.split("\n\n")[0]
    n = 0
    for i in re.findall(r"Exchange \((\d+)\)", tree):
        m = re.search(rf"\({i}\) Exchange\n(?:.*\n)*?Arguments: (\w+)", plan)
        if m and m.group(1).startswith("hashpartitioning"):
            n += 1
    return n


def test_q164_ohlc_is_windowless_single_aggregate(spark):
    """OHLC bars must be ONE hash aggregate (min_by/max_by over the
    composite ordering key) — zero Window/Sort nodes and a single
    exchange keyed on (type, day). A per-bar row_number formulation
    would per-partition sort the whole event log at 100 TB."""
    plan = _plan(spark, "q164_ohlc_bars")
    assert "Window" not in plan
    assert "Sort" not in plan
    assert _hash_exchange_count(plan) == 1


def test_q165_twa_reuses_window_partitioning_for_agg(spark):
    """The lead() window and the per-user aggregate must share ONE
    user_id exchange — the event log is shuffled once, not twice."""
    plan = _plan(spark, "q165_time_weighted_avg")
    assert _hash_exchange_count(plan) == 1


def test_q168_zorder_audit_is_windowless_and_codegen(spark):
    """The Morton key must be pure codegen arithmetic: no Window, no
    Sort, no Python evaluation anywhere in the plan; the only
    hash-partitioned exchange is the per-bucket aggregate (the 1-row
    min/max frame arrives via broadcast)."""
    plan = _plan(spark, "q168_zorder_layout")
    assert "Window" not in plan
    assert "Sort" not in plan
    assert "Python" not in plan
    assert _hash_exchange_count(plan) == 1
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row stats frame


def test_q170_weighted_sample_is_take_ordered(spark):
    """The weighted lottery must compile to TakeOrderedAndProject —
    per-partition local top-k merged on the driver — never a global
    sort of the corpus."""
    plan = _plan(spark, "q170_weighted_sample")
    assert "TakeOrderedAndProject" in plan


def test_q169_snm_has_no_global_sort(spark):
    """Blocked-SNM contract: ranking sorts WITHIN block partitions
    (window exchanges are hash-partitioned); nothing funnels the
    corpus through a single partition."""
    plan = _plan(spark, "q169_sorted_neighborhood")
    assert "Exchange SinglePartition" not in plan


def test_q187_lateral_decorrelates_to_rank_window(spark):
    """The correlated LATERAL LIMIT subquery must decorrelate into a
    rank-window plan joined broadcast — never a nested-loop re-run of
    the subquery per outer row."""
    plan = _plan(spark, "q187_lateral_topk")
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    assert "BroadcastHashJoin" in plan


def test_q214_shuffles_carry_only_digests_and_ids(spark):
    """Memorization-span contract: corpus text may never shuffle —
    every hash-partitioned exchange must be keyed by the 8-byte
    shingle digest, doc_id, or the islands key. (Text stays inside
    scan-local projections.)"""
    import re

    plan = _plan(spark, "q214_memorization_spans")
    keys = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert keys, "expected hash exchanges in the q214 plan"
    for k in keys:
        names = {c.split("#")[0].strip() for c in k.split(",") if "#" in c}
        assert names <= {"h", "doc_id", "island"}, names


def test_q215_bootstrap_is_one_pass(spark):
    """Poisson-bootstrap contract: the ×B explosion must be reduced
    map-side — the replicate aggregate's exchange carries only the
    replicate id — and orders is scanned exactly twice (replicates +
    point estimate), never once per replicate."""
    import re

    from ecowatt_etl_spark.queries.registry import all_queries
    from tools.audit_scans import scan_count

    spec = all_queries()["q215_bootstrap_ci"]
    assert scan_count(spark, spec.fn(spark, SF_SMOKE)) == 2
    plan = _plan(spark, "q215_bootstrap_ci")
    keys = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    names = {
        c.split("#")[0].strip() for k in keys for c in k.split(",") if "#" in c
    }
    assert "b" in names and "k" not in names, names


def test_q223_scan_shape(spark):
    """ANALYZE-sweep contract after the r12 rewrite: 51 column stats
    from 10 wide min/max table scans + 51 single-distinct NDV scans,
    where every NDV scan is COLUMN-PRUNED to exactly its own column
    (total scan bytes = the old two-full-scans stack shape) and the
    plan never contains the multi-distinct Expand: Catalyst's Expand
    rewrite carries EVERY audited column on every duplicated row
    (~720M wide rows on 100x lineitem, measured task OOM in the r8
    exec sweep). The r8-r11 stack fan-out (one spillable group-
    distinct over ~N×rows stringified values, ~156 s at 100×) is
    gone with it."""
    import re

    from ecowatt_etl_spark.queries.registry import all_queries
    from tools.audit_scans import scan_count

    spec = all_queries()["q223_column_stats"]
    assert scan_count(spark, spec.fn(spark, SF_SMOKE)) == 61
    plan = _plan(spark, "q223_column_stats")
    assert "Expand" not in plan
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    single = [s for s in schemas if s.count(":") == 1]
    assert len(single) == 51, f"expected 51 pruned NDV scans, got {len(single)}"
    analyzed = spec.fn(spark, SF_SMOKE)._jdf.queryExecution().analyzed().toString()
    assert "stack(" not in analyzed


def test_q243_holt_is_two_aggregates_no_window(spark):
    plan = _plan(spark, "q243_holt_forecast")
    # daily rollup + per-type series: two hash-aggregate exchanges and
    # nothing else — the fold itself must be scan-local expression work
    assert plan.count("Exchange (") <= 2  # tree nodes, not detail echoes
    assert "WindowExec" not in plan and "Window\n" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q244_observe_rides_pushed_filter_scan(spark):
    from ecowatt_etl_spark.queries.layout_queries import observed_pass

    from ecowatt_etl_spark.plans.guard import physical_plan

    observed, _ = observed_pass(spark, SF_SMOKE)
    plan = physical_plan(observed)
    # the telemetry is an accumulator node on the SAME pass…
    assert "CollectMetrics" in plan
    # …and must not break pushdown of the pipeline's own filter
    assert "l_discount" in plan.split("PushedFilters")[1].split("]")[0]
    # metrics add no exchange: the observed segment is exchange-free
    assert "Exchange" not in plan


def test_q245_nb_scoring_broadcasts_weights(spark):
    plan = _plan(spark, "q245_nb_quality_classifier")
    # the model (weights + priors) broadcasts onto the token stream;
    # nothing may sort-merge, and scoring stays JVM-side
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q246_linkage_has_no_quadratic_join(spark):
    plan = _plan(spark, "q246_record_linkage")
    # deletion-neighborhood blocking must surface as an EQUI-join on the
    # masked key — any nested-loop/cartesian shape means the blocking
    # degenerated to all-pairs
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q247_refresh_merge_is_keyed_not_nested_loop(spark):
    plan = _plan(spark, "q247_incremental_view_refresh")
    # base-view + delta merge and the audit arm are keyed equi-joins;
    # a nested-loop/cartesian here would mean the refresh re-pairs the
    # world instead of merging on the group key
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q253_rolling_distincts_have_no_nested_loop(spark):
    plan = _plan(spark, "q253_rolling_active_users")
    # the x7 fan-out must be GENERATED (explode of sequence) and
    # aggregated on an equi key — a nested-loop against the day grid
    # is the O(history^2) failure mode this query exists to avoid
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Expand" in plan  # the two distincts share one aggregation


def test_plan_guard_blocks_and_allows(spark):
    """The runtime admission guard (plans/guard.py) must reject the
    shapes this file pins against — and accept both a healthy plan and
    an explicitly-allowed exception."""
    import pytest

    from ecowatt_etl_spark.plans.guard import PlanGuardError, assert_scalable
    from ecowatt_etl_spark.queries.registry import all_queries

    a = spark.range(10)
    b = spark.range(10)
    cart = a.crossJoin(b)
    with pytest.raises(PlanGuardError, match="CartesianProduct|NestedLoop"):
        assert_scalable(cart)
    # a written justification whitelists the shape
    assert assert_scalable(
        cart, allow={"CartesianProduct", "BroadcastNestedLoopJoin"}
    ) is cart
    # occurrence-capped waiver: one justified site does not silence a
    # second banned occurrence of the same shape
    cart2 = cart.crossJoin(spark.range(5).withColumnRenamed("id", "id3"))
    with pytest.raises(PlanGuardError, match="allowed 1"):
        assert_scalable(cart2, allow={"BroadcastNestedLoopJoin": 1})

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    slow = a.select(F.udf(lambda x: x + 1, LongType())("id"))
    with pytest.raises(PlanGuardError, match="BatchEvalPython"):
        assert_scalable(slow)

    healthy = all_queries()["q01_pricing_summary"].fn(spark, SF_SMOKE)
    assert assert_scalable(healthy) is healthy


def test_parquet_aggregate_pushdown_is_metadata_only(spark):
    """COUNT/MIN/MAX over parquet can resolve from row-group METADATA
    (PushedAggregation) under the DSv2 read path — the stats-only scan
    that answers table-profile queries without touching data pages.
    Exercised as a test rather than a registry query because enabling
    it requires flipping the session-global useV1SourceList (which
    would silently re-plan every other parquet read in the session —
    the q222/tables.py global-mutation lesson). Values must equal the
    ordinary scan's aggregates exactly."""
    from pyspark.sql import functions as F

    keys = ("spark.sql.sources.useV1SourceList", "spark.sql.parquet.aggregatePushdown")
    old = {k: spark.conf.get(k, None) for k in keys}
    try:
        spark.conf.set(keys[0], "")
        spark.conf.set(keys[1], "true")
        df = spark.read.parquet(SF_SMOKE + "/lineitem.parquet")
        agg = df.agg(
            F.count("*").alias("n"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_extendedprice").alias("max_price"),
        )
        from ecowatt_etl_spark.plans.guard import physical_plan

        plan = physical_plan(agg)
        assert "PushedAggregation: [COUNT(*), MIN(l_quantity), MAX(l_extendedprice)]" in plan
        got = agg.collect()[0]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    want = (
        spark.read.parquet(SF_SMOKE + "/lineitem.parquet")
        .agg(F.count("*"), F.min("l_quantity"), F.max("l_extendedprice"))
        .collect()[0]
    )
    assert tuple(got) == tuple(want)


def test_plans_md_freshness(spark):
    """PLANS.md is regenerated manually (tools/dump_plans.py), so it
    could silently go stale after an operator change (r6 verdict item
    8). Re-derive one pinned plan per audited family under the same
    session shape the generator uses (local[4], sf0.001) and diff the
    tree against the checked-in text — a shape change without a
    PLANS.md regen fails here."""
    import re

    from ecowatt_etl_spark.queries.registry import all_queries

    from tools.dump_plans import AUDITED

    text = open("PLANS.md").read()
    audited_names = [n for n, _ in AUDITED]
    # every audited query must still have a section, and vice versa
    sections = re.findall(r"^## (\S+)$", text, re.M)
    assert sections == audited_names, "PLANS.md sections drifted from AUDITED"

    specs = all_queries()
    # one representative per family — cheap plans with no build-time
    # side computation: relational agg, dedup explode, similarity
    # zero-exchange, timeseries agg, layout fan-out
    probes = (
        "q01_pricing_summary",
        "q52_minhash_signatures",
        "q117_random_projection",
        "q164_ohlc_bars",
        "q253_rolling_active_users",
    )
    for name in probes:
        df = specs[name].fn(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        tree = plan.split("\n\n")[0].rstrip()
        m = re.search(
            rf"^## {name}\n\n_[^\n]*_\n\n```\n(.*?)\n```", text, re.S | re.M
        )
        assert m, f"PLANS.md lost its {name} section"
        assert tree == m.group(1).rstrip(), (
            f"PLANS.md is stale for {name} — the derived plan shape "
            "changed; regenerate with `python tools/dump_plans.py`"
        )


def test_q274_explode_runs_after_broadcast_prune(spark):
    """q274 materializes only the first K bins, so the expensive
    per-token Generate must sit ABOVE the broadcast join that filters
    to contributing docs (start_off < K*C) — explode-after-prune is
    what keeps the gate query's fan-out constant in corpus size. Also
    pins the prefix_sum contract: exactly one order-only window, and
    it runs on the bucket-TOTALS frame (the documented bounded global
    phase), every other window bucket-partitioned."""
    import re

    plan = _plan(spark, "q274_packed_shards")
    tree = plan.split("\n\n")[0]
    lines = tree.splitlines()
    gen = [i for i, l in enumerate(lines) if "Generate" in l]
    bhj = [i for i, l in enumerate(lines) if "BroadcastHashJoin" in l]
    assert len(gen) == 1, "exactly one explode"
    assert any(i > gen[0] for i in bhj), (
        "the doc-pruning broadcast join must be INSIDE the Generate's "
        "subtree (explode after prune)"
    )
    specs = re.findall(r"windowspecdefinition\((.*?)specifiedwindowframe", plan)
    order_only = [s for s in specs if re.match(r"\s*\w+#\d+L? (ASC|DESC)", s)]
    assert len(order_only) == 1, (specs,)


def test_q275_every_window_is_partitioned(spark):
    """q275's whole point is rank assignment WITHOUT corpus-wide
    windows: every windowspecdefinition in the plan must carry at
    least one partition column before its sort spec, and no
    SinglePartition exchange may appear anywhere (the histogram-base
    and tie-group phases are all source-keyed)."""
    import re

    plan = _plan(spark, "q275_length_batching")
    assert "Exchange SinglePartition" not in plan
    specs = re.findall(r"windowspecdefinition\((.*?)specifiedwindowframe", plan)
    assert specs, "expected window phases in the plan"
    for s in specs:
        assert not re.match(r"\s*\w+#\d+L? (ASC|DESC)", s), (
            f"unpartitioned window spec: {s[:80]}"
        )


def test_q276_no_corpus_rescan(spark):
    """q276 references the 20-row mixture plan on both sides of its
    report join; without lineage cuts Spark re-derives it from source
    each time — 9 corpus tokenize-scans in the naive plan. Since r9
    the tokenize scan lives in the session-shared doc_token_stats
    checkpoint, so the returned plan must touch NO parquet at all
    (totals and keep pass both reread the stats frame), with the keep
    decision joined by broadcast and no window anywhere."""
    plan = _plan(spark, "q276_mixture_sampler")
    tree = plan.split("\n\n")[0]
    scans = [l for l in tree.splitlines() if "Scan parquet" in l]
    assert len(scans) == 0, (
        f"expected zero parquet scans (shared stats frame), got "
        f"{len(scans)} — the tokenize scan is being re-derived"
    )
    assert "windowspecdefinition" not in plan
    assert "BroadcastHashJoin" in tree, "keep join must broadcast the plan"
