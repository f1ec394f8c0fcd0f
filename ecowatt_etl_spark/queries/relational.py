"""Core relational operator queries (SURVEY §2.2–§2.8 inventory).

Each query exercises one (or one family of) operator(s) from the
reference inventory on the synthetic warehouse, with a DuckDB oracle.
All float aggregates go through exact decimal (functions/exact.py) so
value hashes are order-independent and engine-independent.

Scale notes are attached per query: what shuffles, what broadcasts,
what pushes down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ecowatt_etl_spark.functions.cleaning import (
    guarded_div,
    minmax_normalize,
    recode,
    regexp_extract_null,
    scrub_nonfinite,
)
from ecowatt_etl_spark.functions.exact import (
    dec,
    exact_avg,
    exact_sum,
    exact_sum_product,
    sql_exact_avg,
    sql_exact_sum,
    sql_exact_sum_product,
)
from ecowatt_etl_spark.queries.registry import query
from ecowatt_etl_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# q01 — flagship: filter → grouped multi-agg (conditional counts) → order
# (SURVEY §7 phase 0: P5 filter, A2 multi-agg, F9-style derived ratio, O1 sort)
# ---------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           {sum_qty}, {sum_base_price}, {sum_disc_price}, {avg_qty}, {avg_price},
           {avg_disc},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """.format(
        sum_qty=sql_exact_sum("l_quantity", "sum_qty"),
        sum_base_price=sql_exact_sum("l_extendedprice", "sum_base_price"),
        sum_disc_price=sql_exact_sum_product(
            "l_extendedprice", "1 - l_discount", "sum_disc_price"
        ),
        avg_qty=sql_exact_avg("l_quantity", "avg_qty"),
        avg_price=sql_exact_avg("l_extendedprice", "avg_price"),
        avg_disc=sql_exact_avg("l_discount", "avg_disc"),
    ),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary (TPC-H Q1 shape) — the flagship.

    Reference shapes covered: post-scan filter (main.py:49), grouped
    multi-aggregate (main.py:70-76 builds 5 separate groupbys; here one
    hash aggregate), ordered output (app.py:182).

    Scale: filter pushes to the Parquet scan (PushedFilters), the
    aggregate is a 2-phase hash agg (map-side partial → shuffle on the
    2 low-cardinality keys → final) — shuffle volume is O(groups), not
    O(rows). No join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity", "sum_qty"),
            exact_sum("l_extendedprice", "sum_base_price"),
            exact_sum_product(
                "l_extendedprice", F.lit(1) - F.col("l_discount"), "sum_disc_price"
            ),
            exact_avg("l_quantity", "avg_qty"),
            exact_avg("l_extendedprice", "avg_price"),
            exact_avg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# q02 — IN-list filter + projection (P2, P3)
# ---------------------------------------------------------------------------
@query(
    "q02_filter_in_projection",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderstatus IN ('O', 'F') AND o_totalprice > 100000
    """,
)
def q02_filter_in_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list membership filter + column-subset projection.

    Reference: FUEL_TYPE ∈ {BEV, PHEV} (main.py:49); projection
    main.py:91. Both the IN filter and the > predicate push down to the
    Parquet scan; only 3 of 6 columns are read (ReadSchema pruning).
    """
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F") & (F.col("o_totalprice") > 100000)
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


# ---------------------------------------------------------------------------
# q03 — dict-map value recode (P7)
# ---------------------------------------------------------------------------
@query(
    "q03_recode_map",
    oracle="""
    SELECT CASE event_type
             WHEN 'click' THEN 'engagement'
             WHEN 'view' THEN 'engagement'
             WHEN 'purchase' THEN 'conversion'
             WHEN 'signup' THEN 'conversion'
             ELSE event_type
           END AS event_class,
           COUNT(*) AS n_events,
           {sum_value}
    FROM events
    GROUP BY 1
    """.format(sum_value=sql_exact_sum("value", "sum_value")),
)
def q03_recode_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value recode through a literal mapping, then aggregate.

    Reference: station→suburb dict .map() (main.py:134-146). The map is
    a Catalyst literal MAP lookup — constant-folded into the projection;
    no join, no extra shuffle beyond the aggregate's own.
    """
    ev = load_table(spark, sf_dir, "events")
    mapping = {
        "click": "engagement",
        "view": "engagement",
        "purchase": "conversion",
        "signup": "conversion",
    }
    return (
        ev.withColumn("event_class", recode("event_type", mapping))
        .groupBy("event_class")
        .agg(F.count("*").alias("n_events"), exact_sum("value", "sum_value"))
    )


# ---------------------------------------------------------------------------
# q04 — group-by count (A1)
# ---------------------------------------------------------------------------
@query(
    "q04_groupby_count",
    oracle="SELECT c_mktsegment, c_nationkey, COUNT(*) AS n FROM customer GROUP BY 1, 2",
)
def q04_groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupby(size) — reference main.py:67. Two-phase hash aggregate."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment", "c_nationkey").agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# q05 — multi-agg with conditional counts (A2)
# ---------------------------------------------------------------------------
@query(
    "q05_multiagg_conditional",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS total_customers,
           COUNT(*) FILTER (WHERE c_acctbal > 5000) AS rich_count,
           COUNT(*) FILTER (WHERE c_acctbal < 0) AS debt_count,
           {avg_bal}
    FROM customer
    GROUP BY c_mktsegment
    """.format(avg_bal=sql_exact_avg("c_acctbal", "avg_bal")),
)
def q05_multiagg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass multi-aggregate with conditional counts.

    Reference builds this from FIVE separate groupbys + merges
    (main.py:70-76); one hash aggregate with count_if replaces them —
    one scan, one shuffle, instead of five of each.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count("*").alias("total_customers"),
        F.count_if(F.col("c_acctbal") > 5000).alias("rich_count"),
        F.count_if(F.col("c_acctbal") < 0).alias("debt_count"),
        exact_avg("c_acctbal", "avg_bal"),
    )


# ---------------------------------------------------------------------------
# q06 — pivot aggregation (A3, R2)
# ---------------------------------------------------------------------------
@query(
    "q06_pivot_by_year",
    oracle="""
    SELECT o_orderpriority,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) FILTER (WHERE year(o_orderdate)=1995) AS VARCHAR) AS DOUBLE) AS sum_1995,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) FILTER (WHERE year(o_orderdate)=1996) AS VARCHAR) AS DOUBLE) AS sum_1996,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) FILTER (WHERE year(o_orderdate)=1997) AS VARCHAR) AS DOUBLE) AS sum_1997
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q06_pivot_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide per year) with an explicit value list.

    Reference: pivot_table per (suburb, year) (main.py:155-160).
    Explicit pivot values matter at scale: without them Spark runs an
    extra distinct job to discover columns.
    """
    o = load_table(spark, sf_dir, "orders").withColumn("o_year", F.year("o_orderdate"))
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_year", [1995, 1996, 1997])
        .agg(F.sum(dec("o_totalprice")).cast("double"))
    )
    return piv.select(
        "o_orderpriority",
        F.col("1995").alias("sum_1995"),
        F.col("1996").alias("sum_1996"),
        F.col("1997").alias("sum_1997"),
    )


# ---------------------------------------------------------------------------
# q07 — global KPIs (A4) + derived ratio
# ---------------------------------------------------------------------------
@query(
    "q07_global_kpis",
    oracle="""
    SELECT COUNT(*) AS total_orders,
           {sum_price},
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS finished_orders,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) / COUNT(*) * 100 AS finished_pct
    FROM orders
    """.format(sum_price=sql_exact_sum("o_totalprice", "sum_price")),
)
def q07_global_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (ungrouped) KPI sums + derived percentage.

    Reference: dashboard KPI row (app.py:158-175). Ungrouped agg →
    partials from every partition reduce to one row; no wide shuffle.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("total_orders"),
        exact_sum("o_totalprice", "sum_price"),
        F.count_if(F.col("o_orderstatus") == "F").alias("finished_orders"),
        (F.count_if(F.col("o_orderstatus") == "F").cast("double") / F.count("*") * 100).alias(
            "finished_pct"
        ),
    )


# ---------------------------------------------------------------------------
# q08 — sorted distinct (A5, O3)
# ---------------------------------------------------------------------------
@query(
    "q08_distinct_sorted",
    oracle="SELECT DISTINCT p_brand, p_type FROM part ORDER BY p_brand, p_type",
)
def q08_distinct_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted distinct — reference sorted(unique()) (main.py:226).

    distinct is a hash aggregate (partial dedup map-side); the sort is
    a final range-partitioned exchange on already-tiny data.
    """
    p = load_table(spark, sf_dir, "part")
    return p.select("p_brand", "p_type").distinct().orderBy("p_brand", "p_type")


# ---------------------------------------------------------------------------
# q09 — distinct counts, exact + approximate (A6)
# ---------------------------------------------------------------------------
@query(
    "q09_distinct_count",
    oracle="""
    SELECT COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem
    """,
)
def q09_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts (reference nunique(), main.py:398-401).

    At 100 TB prefer approx_count_distinct (HLL sketch, no expand) —
    exposed by q09b below as a rows-only check since it is approximate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query("q09b_approx_distinct")  # approximate → no value oracle (rows-only)
def q09b_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct — the 100 TB path for A6: a fixed-size
    sketch per partition instead of an exact distinct expansion."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("n_parts_approx"),
        F.approx_count_distinct("l_suppkey", 0.01).alias("n_supps_approx"),
    )


# ---------------------------------------------------------------------------
# q10 — min–max normalization (F13)
# ---------------------------------------------------------------------------
@query(
    "q10_minmax_normalize",
    oracle="""
    WITH bal AS (
      SELECT c_custkey, c_acctbal,
             MIN(c_acctbal) OVER () AS lo, MAX(c_acctbal) OVER () AS hi
      FROM customer
    )
    SELECT c_custkey, c_acctbal,
           CASE WHEN hi = lo THEN 50.0
                ELSE (c_acctbal - lo) / (hi - lo) * 100 END AS c_acctbal_score
    FROM bal
    """,
)
def q10_minmax_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global min–max scaling to [0,100], degenerate range → 50.

    Reference: dashboard normalization (app.py:352-359,388-398). The
    1-row bounds aggregate is broadcast onto the scan — two stages
    total, no per-column driver round-trips.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    return minmax_normalize(c, ["c_acctbal"])


# ---------------------------------------------------------------------------
# q11 — full-outer conformance join with key coalescing (J1/J2) + null fill
# ---------------------------------------------------------------------------
@query(
    "q11_full_outer_join",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
               FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
               FROM supplier GROUP BY 1)
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
)
def q11_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer equi-join with coalesced key + zero null-fill.

    Reference: the EV⋈electricity⋈pollution conformance merges
    (main.py:176-179) + fillna(0) (main.py:182-195). Spark's
    named-column join form coalesces the key like pandas merge does.
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return cust.join(supp, "nationkey", "full_outer").na.fill(
        {"n_customers": 0, "n_suppliers": 0}
    )


# ---------------------------------------------------------------------------
# q12 — star-schema broadcast join chain (J3–J6)
# ---------------------------------------------------------------------------
@query(
    "q12_star_join",
    oracle="""
    SELECT r_name AS region_name, n_name AS nation_name,
           COUNT(*) AS n_orders, {revenue}
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderstatus <> 'P'
    GROUP BY 1, 2
    """.format(revenue=sql_exact_sum("o_totalprice", "revenue")),
)
def q12_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact→dimension join chain, dimensions broadcast.

    Reference: fact⋈dim_suburb left joins (app.py:89-104). Every dim
    here is orders-of-magnitude smaller than the fact: broadcast-hash
    joins keep the fact table un-shuffled — the only shuffle in the
    whole plan is the final group-by. At 100 TB this is the difference
    between 3 sort-merge shuffles of the fact and zero.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "P")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(F.count("*").alias("n_orders"), exact_sum("o_totalprice", "revenue"))
    )


# ---------------------------------------------------------------------------
# q13 — semi join (the scale-out form of isin-against-keys, main.py:145)
# ---------------------------------------------------------------------------
@query(
    "q13_semi_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def q13_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join — customers with ≥1 urgent order.

    Reference's isin-against-mapping-keys (main.py:145) is a semi-join
    in disguise; left_semi is the distributed form (no row duplication,
    right side reduced to distinct keys before probing).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# ---------------------------------------------------------------------------
# q14 — anti join (complement of q13; beyond-reference but core engine surface)
# ---------------------------------------------------------------------------
@query(
    "q14_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q14_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — customers with no orders at all (NOT EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# q15 — unpivot / melt (R1)
# ---------------------------------------------------------------------------
@query(
    "q15_unpivot",
    oracle="""
    SELECT p_partkey, 'retailprice' AS measure, p_retailprice AS value FROM part
    UNION ALL
    SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
    """,
)
def q15_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long unpivot (pandas melt, reference main.py:121-127).

    Uses the native unpivot operator (Spark ≥3.4) — a generate node,
    no shuffle at all; NULL measures are kept, matching pandas melt.
    """
    p = load_table(spark, sf_dir, "part").withColumn(
        "p_size_d", F.col("p_size").cast("double")
    )
    return (
        p.unpivot("p_partkey", ["p_retailprice", "p_size_d"], "measure", "value")
        .withColumn(
            "measure",
            F.when(F.col("measure") == "p_retailprice", "retailprice").otherwise("size"),
        )
        .select("p_partkey", "measure", "value")
    )


# ---------------------------------------------------------------------------
# q16 — vertical concat / union-all (R3)
# ---------------------------------------------------------------------------
@query(
    "q16_union_by_name",
    oracle="""
    SELECT o_orderkey, 1995 AS snapshot_year, o_totalprice FROM orders
    WHERE year(o_orderdate) = 1995
    UNION ALL
    SELECT o_orderkey, 1996 AS snapshot_year, o_totalprice FROM orders
    WHERE year(o_orderdate) = 1996
    """,
)
def q16_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-all of two year slices with a literal snapshot column.

    Reference: 2023 facts unioned with synthesized 2022 rows
    (main.py:343). unionByName is position-independent — schema drift
    between branches fails loudly instead of silently misaligning.
    """
    o = load_table(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select(
        "o_orderkey", F.lit(1995).alias("snapshot_year"), "o_totalprice"
    )
    y96 = o.filter(F.year("o_orderdate") == 1996).select(
        "o_orderkey", F.lit(1996).alias("snapshot_year"), "o_totalprice"
    )
    return y95.unionByName(y96)


# ---------------------------------------------------------------------------
# q17 — sort + limit (O1, O4)
# ---------------------------------------------------------------------------
@query(
    "q17_top10_revenue",
    oracle="""
    SELECT o_custkey, {revenue}, COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    ORDER BY revenue DESC, o_custkey
    LIMIT 10
    """.format(revenue=sql_exact_sum("o_totalprice", "revenue")),
)
def q17_top10_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 customers by revenue (sort desc + limit, app.py:182 /
    TOP 10 default app.py:524). Spark plans orderBy+limit as
    TakeOrderedAndProject — per-partition top-K then a K-row merge on
    the driver; the full sort never happens. Deterministic tie-break on
    the key."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(exact_sum("o_totalprice", "revenue"), F.count("*").alias("n_orders"))
        .orderBy(F.desc("revenue"), F.asc("o_custkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q18 — deterministic surrogate keys (O5) + literal dims (O6)
# ---------------------------------------------------------------------------
@query(
    "q18_surrogate_keys",
    oracle="""
    SELECT ROW_NUMBER() OVER (ORDER BY n_name) AS id_nation, n_name AS nation_name
    FROM (SELECT DISTINCT n_name FROM nation)
    """,
)
def q18_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contiguous surrogate keys for a dimension.

    Reference: range(1, len+1) row ids (main.py:218,225,255,271).
    row_number over a global order is exact but single-partition for
    the final numbering — correct for dimension tables (small by
    definition). For 100 TB fact keys use hash keys (xxhash64) or
    zipWithIndex-style partition-offset ids instead; see
    operators/keys.py.
    """
    from ecowatt_etl_spark.operators.keys import add_surrogate_key

    n = load_table(spark, sf_dir, "nation").select(F.col("n_name").alias("nation_name")).distinct()
    return add_surrogate_key(n, "id_nation", order_by=["nation_name"]).select(
        "id_nation", "nation_name"
    )


# ---------------------------------------------------------------------------
# q19 — regex extract with NULL-on-miss (F2) + safe cast (F4)
# ---------------------------------------------------------------------------
@query(
    "q19_regex_extract_cast",
    oracle="""
    SELECT CAST(NULLIF(regexp_extract(o_orderpriority, '(\\d+)', 1), '') AS INTEGER)
             AS priority_rank,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
)
def q19_regex_extract_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction with pandas NaN-on-miss semantics + cast.

    Reference: model-year extract (main.py:55), station-name extract
    (main.py:130). Spark regexp_extract returns '' on miss where pandas
    returns NaN — regexp_extract_null wraps with nullif.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn(
            "priority_rank", regexp_extract_null("o_orderpriority", r"(\d+)").cast("int")
        )
        .groupBy("priority_rank")
        .agg(F.count("*").alias("n"))
        .orderBy("priority_rank")
    )


# ---------------------------------------------------------------------------
# q20 — try_cast junk → NULL (F4) with junk synthesized from clean ints
# ---------------------------------------------------------------------------
@query(
    "q20_try_cast_junk",
    oracle="""
    WITH t AS (
      SELECT CASE WHEN p_size % 5 = 0 THEN 'N/A'
                  WHEN p_size % 7 = 0 THEN CAST(p_size AS VARCHAR) || '*'
                  ELSE CAST(p_size AS VARCHAR) END AS size_text,
             p_partkey
      FROM part
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(TRY_CAST(size_text AS DOUBLE)) AS n_parsed,
           COUNT(TRY_CAST(replace(size_text, '*', '') AS DOUBLE)) AS n_parsed_after_strip,
           CAST(CAST(SUM(CAST(COALESCE(TRY_CAST(replace(size_text,'*','') AS DOUBLE), 0)
                         AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_size
    FROM t
    """,
)
def q20_try_cast_junk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safe numeric cast over dirty text (junk → NULL, '123*' → 123).

    Reference: to_numeric(errors='coerce') on '*'-suffixed prices
    (main.py:58-59) and junk ranges (main.py:62). Junk is synthesized
    deterministically from p_size so both engines see identical text.
    """
    from ecowatt_etl_spark.functions.cleaning import strip_literal, try_double

    p = load_table(spark, sf_dir, "part").withColumn(
        "size_text",
        F.when(F.col("p_size") % 5 == 0, F.lit("N/A"))
        .when(F.col("p_size") % 7 == 0, F.concat(F.col("p_size").cast("string"), F.lit("*")))
        .otherwise(F.col("p_size").cast("string")),
    )
    cleaned = try_double(strip_literal("size_text", "*"))
    return p.agg(
        F.count("*").alias("n_rows"),
        F.count(try_double("size_text")).alias("n_parsed"),
        F.count(cleaned).alias("n_parsed_after_strip"),
        F.sum(dec(F.coalesce(cleaned, F.lit(0.0)))).cast("double").alias("total_size"),
    )


# ---------------------------------------------------------------------------
# q21 — guarded division + non-finite scrub (F9, F10)
# ---------------------------------------------------------------------------
@query(
    "q21_guarded_ratio",
    oracle="""
    WITH s AS (
      SELECT s_nationkey,
             CAST(CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS bal_sum,
             COUNT(*) FILTER (WHERE s_acctbal < 0) AS n_neg
      FROM supplier GROUP BY 1
    )
    SELECT s_nationkey,
           CASE WHEN n_neg <= 0 THEN 0.0
                WHEN bal_sum IS NULL THEN 0.0
                WHEN abs(bal_sum / n_neg) > 1e15 THEN 0.0
                ELSE bal_sum / n_neg END AS bal_per_neg
    FROM s
    """,
)
def q21_guarded_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero/NULL/∞-guarded division as a pure `when` chain.

    Reference: safe_ev_per_energy / safe_no2_per_ev applied row-wise via
    df.apply(axis=1) (main.py:304-331) — a scalar Python loop. Here the
    same semantics are a codegen'd Column expression: no UDF, no Python
    in the hot path.
    """
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(
            F.sum(dec("s_acctbal")).cast("double").alias("bal_sum"),
            F.count_if(F.col("s_acctbal") < 0).alias("n_neg"),
        )
    )
    return s.select(
        "s_nationkey",
        scrub_nonfinite(guarded_div("bal_sum", "n_neg")).alias("bal_per_neg"),
    )


# ---------------------------------------------------------------------------
# q22 — window lag: year-over-year change (§2.8)
# ---------------------------------------------------------------------------
@query(
    "q22_window_yoy",
    oracle="""
    WITH yearly AS (
      SELECT n_name AS nation_name, year(o_orderdate) AS order_year,
             {revenue}
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    )
    SELECT nation_name, CAST(order_year AS INTEGER) AS order_year, revenue,
           revenue - LAG(revenue) OVER (PARTITION BY nation_name ORDER BY order_year)
             AS revenue_delta
    FROM yearly
    """.format(revenue=sql_exact_sum("o_totalprice", "revenue")),
)
def q22_window_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue delta via a lag window.

    The reference computes YoY from wide columns (main.py:104-106,
    165-167); over a long fact table the idiomatic Spark form is
    lag().over(partitionBy(key).orderBy(year)) — SURVEY §2.8. The window
    reuses the aggregate's shuffle partitioning on nation_name.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    yearly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(exact_sum("o_totalprice", "revenue"))
    )
    w = W.partitionBy("nation_name").orderBy("order_year")
    return yearly.select(
        "nation_name",
        "order_year",
        "revenue",
        (F.col("revenue") - F.lag("revenue").over(w)).alias("revenue_delta"),
    )


# ---------------------------------------------------------------------------
# q23 — top-k per group (window row_number; guide's OLAP pattern)
# ---------------------------------------------------------------------------
@query(
    "q23_topk_per_group",
    oracle="""
    WITH ranked AS (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rk
      FROM customer
    )
    SELECT c_mktsegment, c_custkey, c_acctbal, rk
    FROM ranked WHERE rk <= 3
    """,
)
def q23_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per market segment.

    Window row_number + filter: Spark pushes a per-partition group
    limit (WindowGroupLimit) before the shuffle, so only k rows per
    group per partition move — the canonical scalable top-k.
    """
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select("c_mktsegment", "c_custkey", "c_acctbal")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )


# ---------------------------------------------------------------------------
# q24 — rollup (beyond reference: SURVEY §2.4 "not present" extensions)
# ---------------------------------------------------------------------------
@query(
    "q24_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {sum_qty}
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """.format(sum_qty=sql_exact_sum("l_quantity", "sum_qty")),
)
def q24_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP — listed in SURVEY §2.4 as a
    Catalyst built-in the engine surface should expose."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), exact_sum("l_quantity", "sum_qty")
    )


# ---------------------------------------------------------------------------
# q25 — percentile / median (SURVEY §2.4 extension)
# ---------------------------------------------------------------------------
@query(
    "q25_percentiles",
    oracle="""
    SELECT o_orderpriority,
           median(o_totalprice) AS median_price,
           quantile_cont(o_totalprice, 0.95) AS p95_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q25_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median / p95 per group (continuous interpolation).

    Exact percentiles need the full value multiset per group — fine for
    grouped data that fits per-key; the 100 TB path is
    percentile_approx (t-digest-style sketch, bounded memory), exposed
    as q25b rows-only.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("median_price"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("p95_price"),
    )


@query("q25b_percentile_approx")  # sketch-based → rows-only check
def q25b_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles — bounded-memory sketch, the scale path."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("median_price_approx"),
    )


# ---------------------------------------------------------------------------
# q26 — cube (multi-dimensional subtotal lattice)
# ---------------------------------------------------------------------------
@query(
    "q26_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_exact_sum("o_totalprice", "sum_price")}
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q26_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping sets in ONE pass —
    Catalyst expands the lattice map-side (Expand node), so the input
    is scanned once and shuffled once regardless of how many subtotal
    levels the cube adds. Subtotal rows carry NULL group keys,
    identically in both engines."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"), exact_sum("o_totalprice", "sum_price")
    )


# ---------------------------------------------------------------------------
# q27 — set operations (INTERSECT / EXCEPT)
# ---------------------------------------------------------------------------
@query(
    "q27_set_ops",
    oracle="""
    WITH urgent AS (SELECT DISTINCT o_custkey FROM orders
                    WHERE o_orderpriority = '1-URGENT'),
    finished AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
    SELECT 'urgent_and_finished' AS tag, o_custkey
    FROM (SELECT o_custkey FROM urgent INTERSECT SELECT o_custkey FROM finished)
    UNION ALL
    SELECT 'urgent_only', o_custkey
    FROM (SELECT o_custkey FROM urgent EXCEPT SELECT o_custkey FROM finished)
    """,
)
def q27_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT and EXCEPT (distinct set semantics) between two
    filtered key sets, tagged and unioned. Catalyst rewrites both to
    semi/anti hash joins on the key — one shuffle each on o_custkey,
    no sort. (The reference has no set ops beyond union-all; these
    complete the engine's set-operator surface.)"""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey").distinct()
    finished = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    both = urgent.intersect(finished).select(
        F.lit("urgent_and_finished").alias("tag"), "o_custkey"
    )
    only = urgent.exceptAll(finished).select(F.lit("urgent_only").alias("tag"), "o_custkey")
    return both.unionByName(only)


# ---------------------------------------------------------------------------
# q28 — salted two-stage aggregation (skew mitigation; same answer)
# ---------------------------------------------------------------------------
@query(
    "q28_salted_agg",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           {sql_exact_sum("o_totalprice", "total")}
    FROM orders GROUP BY o_orderpriority
    """,
)
def q28_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count+sum per priority computed as a salted TWO-STAGE aggregate
    (operators/skew.py): stage 1 groups (key, salt) so a hot key's rows
    spread across 8 reducers, stage 2 merges the 8 partials per key.
    The oracle is the plain GROUP BY — salting is pure execution
    strategy, the answer is identical (sums stay exact-decimal through
    both stages)."""
    from ecowatt_etl_spark.functions.exact import dec
    from ecowatt_etl_spark.operators.skew import SALT, with_salt

    o = load_table(spark, sf_dir, "orders")
    salted = with_salt(o, 8)
    partial = salted.groupBy("o_orderpriority", SALT).agg(
        F.count("*").alias("__pc"), F.sum(dec("o_totalprice")).alias("__ps")
    )
    return partial.groupBy("o_orderpriority").agg(
        F.sum("__pc").alias("n"), F.sum("__ps").cast("double").alias("total")
    )


# ---------------------------------------------------------------------------
# q30 — deep star join: revenue by nation within a region (TPC-H Q5 shape)
# ---------------------------------------------------------------------------
@query(
    "q30_region_nation_revenue",
    oracle=f"""
    SELECT n_name,
           {sql_exact_sum_product("l_extendedprice", "(1 - l_discount)", "revenue")},
           COUNT(*) AS n_items
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'AMERICA'
    GROUP BY n_name
    """,
)
def q30_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-table star join (lineitem → supplier → nation → region) with
    a region filter and exact-decimal revenue. The dims broadcast in
    size order, so the 100 TB fact never shuffles for the join — the
    only exchange is the final per-nation aggregate; the region filter
    prunes through the broadcast side before any fact rows move."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    return (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(
            exact_sum_product(
                "l_extendedprice", 1 - F.col("l_discount"), "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q31 — shipping-priority revenue top-10 (TPC-H Q3 shape)
# ---------------------------------------------------------------------------
@query(
    "q31_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_exact_sum_product("l_extendedprice", "(1 - l_discount)", "revenue")},
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY l_orderkey, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q31_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-filtered customer ⋈ orders ⋈ lineitem, revenue per order,
    top 10. The segment filter reaches the customer scan (pushdown) and
    shrinks that join side before the fact join; the final TopK is a
    TakeOrderedAndProject — no global sort materialization. Exact
    decimal revenue keeps the top-10 cut deterministic (a float sum
    could reorder near-ties between engines)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(
            exact_sum_product("l_extendedprice", 1 - F.col("l_discount"), "revenue")
        )
        .select("l_orderkey", "revenue", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q32 — exchange-free fact ⋈ fact join via bucketed tables
# ---------------------------------------------------------------------------
@query(
    "q32_bucketed_join",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           {sql_exact_sum("l_extendedprice", "total_price")}
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q32_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ fact join on co-located bucketed tables: both sides are
    written `bucketBy(8, orderkey)` + `sortBy` once, then the join
    scans carry matching HashPartitioning and the planner elides the
    join shuffle — the only Exchange left in the plan is the final
    5-row priority aggregate (asserted in tests/test_plans.py). This is
    the 100 TB answer for repeated fact-fact joins: the shuffle is paid
    once at ingest, not per query. Sizing notes in
    operators/bucketing.py."""
    from ecowatt_etl_spark.operators.bucketing import (
        BUCKET_ROOT,
        bucket_token,
        write_bucketed,
    )

    tok = bucket_token(sf_dir)
    li = write_bucketed(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice"),
        f"li_bkt_{tok}",
        "l_orderkey",
        8,
        f"{BUCKET_ROOT}/{tok}/lineitem",
    )
    o = write_bucketed(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
        f"o_bkt_{tok}",
        "o_orderkey",
        8,
        f"{BUCKET_ROOT}/{tok}/orders",
    )
    return (
        li.join(o.hint("merge"), li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            exact_sum("l_extendedprice", "total_price"),
        )
    )


# ---------------------------------------------------------------------------
# q33/q34 — JSONL and ORC source/sink round-trips
# ---------------------------------------------------------------------------
@query(
    "q33_jsonl_roundtrip",
    oracle=f"""
    SELECT s_nationkey, COUNT(*) AS n_suppliers,
           {sql_exact_sum("s_acctbal", "bal_sum")}
    FROM supplier GROUP BY s_nationkey
    """,
)
def q33_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier → JSONL sink → schema-explicit JSONL source → aggregate;
    equals the same aggregate over the parquet original (the oracle).
    Exercises the text-format sink/source path end-to-end: doubles
    round-trip bit-exactly (shortest-repr write, correctly-rounded
    parse), FAILFAST read, no schema inference pass. See
    sources/formats.py for the at-scale option rationale."""
    from ecowatt_etl_spark.sources.formats import (
        SCRATCH_ROOT,
        read_jsonl,
        write_jsonl,
    )
    from ecowatt_etl_spark.operators.bucketing import bucket_token

    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    path = f"{SCRATCH_ROOT}/{bucket_token(sf_dir)}/supplier_jsonl"
    write_jsonl(s, path)
    back = read_jsonl(spark, path, s.schema)
    return back.groupBy("s_nationkey").agg(
        F.count("*").alias("n_suppliers"), exact_sum("s_acctbal", "bal_sum")
    )


@query(
    "q34_orc_roundtrip",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           {sql_exact_sum("o_totalprice", "price_sum")}
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY o_orderpriority
    """,
)
def q34_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → ORC sink → ORC source with a date filter → aggregate.
    The filter is applied on the ORC scan (predicate pushdown works on
    ORC exactly as on Parquet — PushedFilters in the plan), proving the
    format swap loses no scan-side optimization."""
    from ecowatt_etl_spark.sources.formats import SCRATCH_ROOT, read_orc, write_orc
    from ecowatt_etl_spark.operators.bucketing import bucket_token

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate"
    )
    path = f"{SCRATCH_ROOT}/{bucket_token(sf_dir)}/orders_orc"
    write_orc(o, path)
    back = read_orc(spark, path)
    return (
        back.filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"), exact_sum("o_totalprice", "price_sum"))
    )


# ---------------------------------------------------------------------------
# q35/q36 — SQL surface: correlated EXISTS/NOT EXISTS, GROUPING SETS
# ---------------------------------------------------------------------------
_Q35_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


@query("q35_exists_subquery", oracle=_Q35_SQL)
def q35_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the ad-hoc SQL surface
    (SURVEY §2.1 S5) — the identical ANSI text runs on both engines.
    Catalyst decorrelates to a LeftSemi ⋈ LeftAnti pair on c_custkey
    (no per-row subquery execution); both probe joins shuffle on the
    same key, so at scale they pipeline into one exchange of customer.
    """
    from ecowatt_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_Q35_SQL)


# Shared ANSI text except the exact-sum rendering: Spark's decimal→double
# cast is correctly rounded directly; DuckDB's must route via VARCHAR
# (see functions/exact.py) — and Spark's parser rejects bare VARCHAR.
_Q36_TEMPLATE = """
SELECT c_mktsegment, c_nationkey,
       GROUPING(c_mktsegment) AS g_seg, GROUPING(c_nationkey) AS g_nat,
       COUNT(*) AS n,
       {bal_sum}
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey), (c_mktsegment), ())
"""
_Q36_SPARK = _Q36_TEMPLATE.format(
    bal_sum="CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS bal_sum"
)


@query(
    "q36_grouping_sets",
    oracle=_Q36_TEMPLATE.format(bal_sum=sql_exact_sum("c_acctbal", "bal_sum")),
)
def q36_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind q24 rollup / q26
    cube) with GROUPING() markers disambiguating real NULL keys from
    subtotal rows. Spark expands to a single Expand + one hash
    aggregate — one pass over the fact, one shuffle, regardless of how
    many sets are requested."""
    from ecowatt_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("customer",))
    return spark.sql(_Q36_SPARK)


# ---------------------------------------------------------------------------
# q37 — ranking/distribution window-function sampler
# ---------------------------------------------------------------------------
@query(
    "q37_window_funcs",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER()   OVER w_key AS rn,
           RANK()         OVER w_pri AS rnk,
           DENSE_RANK()   OVER w_pri AS drnk,
           NTILE(4)       OVER w_key AS quartile,
           PERCENT_RANK() OVER w_key AS pct_rank,
           CUME_DIST()    OVER w_key AS cume,
           LAG(o_orderkey)  OVER w_key AS prev_key,
           LEAD(o_orderkey) OVER w_key AS next_key,
           NTH_VALUE(o_orderkey, 2) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_key
    FROM orders
    WINDOW w_key AS (PARTITION BY o_custkey ORDER BY o_orderkey),
           w_pri AS (PARTITION BY o_custkey ORDER BY o_orderpriority)
    """,
)
def q37_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking/distribution window-function surface in one
    query: row_number/rank/dense_rank/ntile/percent_rank/cume_dist/
    lag/lead/nth_value per customer. All values are integers or exact
    small-fraction doubles ((rank−1)/(n−1)), so the cross-engine match
    is exact. One shuffle on o_custkey serves every function (all
    windows share the partition key); nth_value gets an explicit
    full-partition frame because default frames stop at CURRENT ROW.
    """
    o = load_table(spark, sf_dir, "orders")
    w_key = W.partitionBy("o_custkey").orderBy("o_orderkey")
    w_pri = W.partitionBy("o_custkey").orderBy("o_orderpriority")
    w_full = w_key.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w_key).alias("rn"),
        F.rank().over(w_pri).alias("rnk"),
        F.dense_rank().over(w_pri).alias("drnk"),
        F.ntile(4).over(w_key).alias("quartile"),
        F.percent_rank().over(w_key).alias("pct_rank"),
        F.cume_dist().over(w_key).alias("cume"),
        F.lag("o_orderkey").over(w_key).alias("prev_key"),
        F.lead("o_orderkey").over(w_key).alias("next_key"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_key"),
    )


# ---------------------------------------------------------------------------
# q38 — array aggregation + array functions
# ---------------------------------------------------------------------------
@query(
    "q38_array_agg",
    oracle="""
    WITH s AS (
      SELECT o_custkey, list_sort(list(DISTINCT o_orderpriority)) AS priorities
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           array_to_string(priorities, '|') AS priorities,
           len(priorities) AS n_priorities,
           priorities[1] AS first_priority,
           list_contains(priorities, '1-URGENT') AS has_urgent
    FROM s
    """,
)
def q38_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation surface: per-customer DISTINCT priorities as a
    SORTED array (collect_set alone has nondeterministic order — the
    array_sort is what makes the result verifiable at all), plus
    element access / length / membership on the array. Arrays stay a
    single column through the one aggregate shuffle — no re-explode.

    The array column is emitted '|'-joined: the driver's pandas
    canonicalizer sorts on every output column and list values are
    unhashable there, so the wire format must be scalar (the array ops
    themselves still run on the real array type)."""
    o = load_table(spark, sf_dir, "orders")
    s = o.groupBy("o_custkey").agg(
        F.array_sort(F.collect_set("o_orderpriority")).alias("priorities")
    )
    return s.select(
        "o_custkey",
        F.array_join("priorities", "|").alias("priorities"),
        F.size("priorities").alias("n_priorities"),
        F.element_at("priorities", 1).alias("first_priority"),
        F.array_contains("priorities", "1-URGENT").alias("has_urgent"),
    )


# ---------------------------------------------------------------------------
# q39 — date/time function sampler
# ---------------------------------------------------------------------------
@query(
    "q39_date_funcs",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           year(o_orderdate) AS y,
           quarter(o_orderdate) AS q,
           month(o_orderdate) AS m,
           dayofweek(o_orderdate) + 1 AS dow,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS quarter_start,
           datediff('day', o_orderdate, TIMESTAMP '1998-12-31 00:00:00') AS days_to_eoy
    FROM orders
    WHERE o_orderkey % 37 = 0
    """,
)
def q39_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface in one query: parts (year/quarter/
    month/day-of-week), interval arithmetic, month/quarter boundaries,
    day differences. All values render as strings or integers, so the
    cross-engine check is exact; Spark's dayofweek (1=Sunday) matches
    DuckDB's dayofweek+1. Scan-local projection — the o_orderkey%37
    sample filter pushes down; no shuffle at all."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 37 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(d, "yyyy-MM-dd").alias("order_date"),
        F.year(d).alias("y"),
        F.quarter(d).alias("q"),
        F.month(d).alias("m"),
        F.dayofweek(d).alias("dow"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_trunc("quarter", d), "yyyy-MM-dd").alias("quarter_start"),
        F.datediff(F.lit("1998-12-31").cast("date"), d.cast("date")).alias("days_to_eoy"),
    )


# ---------------------------------------------------------------------------
# q29 — incremental rollup maintenance (mergeable aggregate state)
# ---------------------------------------------------------------------------
@query(
    "q29_incremental_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           {sql_exact_sum('l_quantity', 'sum_qty')},
           strftime(MIN(l_shipdate), '%Y-%m-%d') AS min_ship,
           strftime(MAX(l_shipdate), '%Y-%m-%d') AS max_ship
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q29_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-rollup maintenance: the table arrives as two
    batches (even/odd orderkeys standing in for yesterday/today's
    partitions); each batch reduces to mergeable aggregate state
    (count/sum/min/max monoids, exact-decimal sums) and the states are
    FOLDED — the base data is never rescanned. The oracle recomputes
    the rollup over the whole table, so the check proves
    merge(state(A), state(B)) == rollup(A ∪ B) exactly.

    Scale shape: each batch is one map-side-combined aggregate; the
    merge shuffles only |groups| state rows per batch regardless of
    how many raw rows built the previous state — the algebra behind
    incremental 100 TB pipelines and streaming aggregation state.
    """
    from ecowatt_etl_spark.operators.incremental import merge_rollup, rollup_state

    li = load_table(spark, sf_dir, "lineitem")
    keys = ["l_returnflag", "l_linestatus"]
    measures = {
        "n_rows": ("count", "*"),
        "sum_qty_state": ("sum", dec("l_quantity")),
        "min_ship": ("min", "l_shipdate"),
        "max_ship": ("max", "l_shipdate"),
    }
    batch_a = rollup_state(li.filter(F.col("l_orderkey") % 2 == 0), keys, measures)
    batch_b = rollup_state(li.filter(F.col("l_orderkey") % 2 == 1), keys, measures)
    merged = merge_rollup(batch_a, batch_b, keys, measures)
    return merged.select(
        "l_returnflag",
        "l_linestatus",
        "n_rows",
        F.col("sum_qty_state").cast("double").alias("sum_qty"),
        F.date_format("min_ship", "yyyy-MM-dd").alias("min_ship"),
        F.date_format("max_ship", "yyyy-MM-dd").alias("max_ship"),
    )


# ---------------------------------------------------------------------------
# q69 — correlated scalar-subquery threshold (TPC-H Q17 shape)
# ---------------------------------------------------------------------------
@query(
    "q69_below_avg_quantity",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sum_qty,
             COUNT(*) AS n
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_small_orders,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR)
                AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem JOIN per_part USING (l_partkey)
    WHERE CAST(l_quantity AS DECIMAL(18,6)) * 5 * n < sum_qty
    """,
)
def q69_below_avg_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from line items whose quantity is below
    20% of their part's average — the correlated-scalar-subquery
    pattern, decorrelated into a per-part aggregate joined back to the
    fact.

    Float hazard, solved by rearrangement: `qty < 0.2 * avg` divides
    and multiplies doubles (engines disagree at the boundary), so the
    predicate is algebraically rewritten to `5 * qty * n < sum_qty` —
    exact decimal/integer math on both sides, bit-identical verdicts.
    Only the final displayed division by 7.0 touches floating point.

    Scale shape: at small SF the planner broadcasts the projected fact
    side outright; at 100 TB both sides hash-partition on l_partkey —
    a co-partitioned join where the aggregate side has already been
    reduced to one row per part. The threshold filter is
    joined-row-local and the final global aggregate is a two-phase
    reduction to one row.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(dec("l_quantity")).alias("sum_qty"), F.count("*").alias("n")
    )
    joined = li.select("l_partkey", "l_quantity", "l_extendedprice").join(
        per_part, "l_partkey"
    )
    small = joined.filter(dec("l_quantity") * 5 * F.col("n") < F.col("sum_qty"))
    return small.agg(
        F.count("*").alias("n_small_orders"),
        (F.sum(dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"),
    )


# ---------------------------------------------------------------------------
# q85 — fixed-width histogram via exact integer binning
# ---------------------------------------------------------------------------
_HIST_BIN_CENTS = 500_000  # $5,000-wide bins


@query(
    "q85_price_histogram",
    oracle=f"""
    WITH binned AS (
      SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * 100 AS BIGINT)
               // {_HIST_BIN_CENTS} AS bin_id
      FROM lineitem
    )
    SELECT bin_id,
           bin_id * {_HIST_BIN_CENTS} AS bin_lo_cents,
           COUNT(*) AS n_items
    FROM binned GROUP BY bin_id
    ORDER BY bin_id
    """,
)
def q85_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width price histogram — the profiling/viz primitive. The
    double price is converted to exact integer CENTS through the
    decimal bridge before binning, so bin boundaries are integer
    comparisons — no float x/width whose rounding could flip a
    boundary row between engines. One map-side-combined aggregate to
    |bins| rows; scan-local binning."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = (dec("l_extendedprice") * 100).cast("long")
    binned = li.select(
        cents.alias("cents")
    ).select(F.expr(f"cents DIV {_HIST_BIN_CENTS}").alias("bin_id"))
    return (
        binned.groupBy("bin_id")
        .agg(F.count("*").alias("n_items"))
        .select(
            "bin_id",
            (F.col("bin_id") * _HIST_BIN_CENTS).alias("bin_lo_cents"),
            "n_items",
        )
        .orderBy("bin_id")
    )


# ---------------------------------------------------------------------------
# q101 — snapshot diff (CDC between two table versions)
# ---------------------------------------------------------------------------
@query(
    "q101_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey % 97 <> 0
    ),
    new AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 89 <> 0
    ),
    j AS (
      SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             CASE
               WHEN o.o_orderkey IS NULL THEN 'added'
               WHEN n.o_orderkey IS NULL THEN 'removed'
               WHEN o.o_orderstatus <> n.o_orderstatus
                    OR o.o_totalprice <> n.o_totalprice THEN 'changed'
               ELSE 'unchanged'
             END AS status
      FROM old o FULL OUTER JOIN new n USING (o_orderkey)
    )
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
    FROM j GROUP BY status
    """,
)
def q101_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the CDC/reconciliation operator: given two
    versions of a keyed table (yesterday/today, source/replica),
    classify every key as added / removed / changed / unchanged. The
    two versions here are deterministic slices of `orders` (drop-mod-97
    vs drop-mod-89 with a price bump on mod-7) so both engines derive
    identical inputs.

    Scale shape: ONE full-outer join on the key — both sides shuffle
    once on 8-byte keys; the change predicate compares columns
    row-locally (at wide schemas, compare an md5 of the concatenated
    non-key columns instead — same plan, constant-width compare); the
    status rollup is a 4-group aggregate. This is the q11 conformance
    join pointed at data operations instead of ETL.
    """
    o = load_table(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = o.filter(F.col("o_orderkey") % 89 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    j = old.alias("o").join(new.alias("n"), "o_orderkey", "full_outer").select(
        "o_orderkey",
        F.when(F.col("o.o_orderstatus").isNull(), "added")
        .when(F.col("n.o_orderstatus").isNull(), "removed")
        .when(
            (F.col("o.o_orderstatus") != F.col("n.o_orderstatus"))
            | (F.col("o.o_totalprice") != F.col("n.o_totalprice")),
            "changed",
        )
        .otherwise("unchanged")
        .alias("status"),
    )
    return j.groupBy("status").agg(
        F.count("*").alias("n_rows"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


# ---------------------------------------------------------------------------
# q104 — sole-faulty-supplier analysis (TPC-H Q21 shape)
# ---------------------------------------------------------------------------
@query(
    "q104_sole_fault_supplier",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
               AS n_fault,
             MIN(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS fault_supp
      FROM lineitem GROUP BY l_orderkey
    ),
    blamed AS (
      SELECT fault_supp AS l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM per_order
      WHERE n_supp > 1 AND n_fault = 1
      GROUP BY fault_supp
    )
    SELECT l_suppkey, n_orders,
           ROW_NUMBER() OVER (ORDER BY n_orders DESC, l_suppkey) AS rk
    FROM blamed
    QUALIFY rk <= 10
    ORDER BY rk
    """,
)
def q104_sole_fault_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape on this schema: suppliers who were the ONLY
    supplier with a returned item in a multi-supplier order — the
    classic doubly-correlated EXISTS / NOT EXISTS pair, decorrelated
    into a two-level aggregate computing both distinct counts and the
    unique culprit (MIN over a one-element set) in a single pass over
    lineitem. The reference pattern needs two correlated subqueries
    per row; this is one map-side-deduped shuffle on (order, supplier)
    plus order- and supplier-keyed rollups, then a global top-10
    (WindowGroupLimit-pruned).
    """
    li = load_table(spark, sf_dir, "lineitem")
    # r12 (guide §2.3, verdict item 5): the two count_distincts with
    # DIFFERENT children made Catalyst Expand every lineitem row 3×
    # (one projection per distinct group + the non-distinct min)
    # before the partial aggregate. A two-level aggregate needs no
    # Expand: level 1 dedups to (order, supplier) pairs map-side
    # (partial agg over the raw scan — the shuffle carries distinct
    # pairs only), level 2 derives both distinct counts and the
    # unique culprit from the deduped pairs. NULL discipline matches
    # count_distinct exactly: null suppkeys form their own level-1
    # group and are excluded from every level-2 count (count(col) /
    # the isNotNull guard / min-ignores-null).
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("r")
    )
    per_order = per_os.groupBy("l_orderkey").agg(
        F.count("l_suppkey").alias("n_supp"),
        F.sum(
            F.when(
                F.col("l_suppkey").isNotNull() & (F.col("r") == 1), 1
            ).otherwise(0)
        ).alias("n_fault"),
        F.min(F.when(F.col("r") == 1, F.col("l_suppkey"))).alias("fault_supp"),
    )
    blamed = (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_fault") == 1))
        .groupBy(F.col("fault_supp").alias("l_suppkey"))
        .agg(F.count("*").alias("n_orders"))
    )
    w = W.orderBy(F.desc("n_orders"), F.asc("l_suppkey"))
    return (
        blamed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# q143 — schema-evolution read (mergeSchema across batch generations)
# ---------------------------------------------------------------------------
@query(
    "q143_schema_evolution",
    oracle=f"""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(COUNT(CASE WHEN s_suppkey % 2 = 1 THEN 1 END) AS BIGINT)
             AS n_with_bal,
           {sql_exact_sum("CASE WHEN s_suppkey % 2 = 1 THEN s_acctbal END", "bal_sum")}
    FROM supplier GROUP BY s_nationkey
    """,
)
def q143_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across batch generations — the lake reality a
    100 TB table accumulates: batch 1 predates the ``s_acctbal``
    column, batch 2 carries it, both land in ONE directory, and the
    evolved read (sources/formats.py::read_parquet_evolved,
    mergeSchema) surfaces the missing column as NULL instead of
    failing the scan or silently dropping it. The aggregate then
    treats presence explicitly: COUNT(col) counts only evolved rows,
    the exact-decimal sum folds only non-NULL balances.

    The oracle recomputes the same semantics from the original
    supplier table (even keys → pre-evolution rows), so the check
    verifies the WRITE → mixed-footer READ → null-fill path end to
    end, not just the aggregate. mergeSchema is a footer union — a
    metadata pass; at 100 TB pass an explicit target schema instead
    and skip even that (both forms live in sources/formats.py)."""
    from ecowatt_etl_spark.operators.bucketing import bucket_token
    from ecowatt_etl_spark.sources.formats import (
        SCRATCH_ROOT,
        read_parquet_evolved,
    )

    s = load_table(spark, sf_dir, "supplier")
    root = f"{SCRATCH_ROOT}/{bucket_token(sf_dir)}/evolved_supplier"
    # batch 1: written before s_acctbal existed
    s.filter(F.col("s_suppkey") % 2 == 0).select(
        "s_suppkey", "s_nationkey"
    ).write.mode("overwrite").parquet(root)
    # batch 2: appended after the column was added
    s.filter(F.col("s_suppkey") % 2 == 1).select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    ).write.mode("append").parquet(root)
    ev = read_parquet_evolved(spark, root)
    return ev.groupBy("s_nationkey").agg(
        F.count("*").alias("n_suppliers"),
        F.count("s_acctbal").alias("n_with_bal"),
        exact_sum("s_acctbal", "bal_sum"),
    )


# ---------------------------------------------------------------------------
# q145 — XML source/sink round-trip (Spark 4 built-in XML data source)
# ---------------------------------------------------------------------------
@query(
    "q145_xml_roundtrip",
    oracle=f"""
    SELECT s_nationkey, COUNT(*) AS n_suppliers,
           {sql_exact_sum("s_acctbal", "bal_sum")}
    FROM supplier GROUP BY s_nationkey
    """,
)
def q145_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier → XML sink → schema-explicit FAILFAST XML source →
    aggregate; equals the same aggregate over the parquet original
    (the oracle), so the text round-trip is proven lossless including
    the doubles (Spark writes shortest-repr, parses correctly
    rounded — same contract as the JSONL path, q33). Completes the
    interchange-format surface next to CSV/JSONL/ORC: XML is an
    ingest format, not a lake format (whole-document row parse, no
    columnar pruning) — sources/formats.py documents the
    land-once-repack-to-parquet pattern for scale."""
    from ecowatt_etl_spark.operators.bucketing import bucket_token
    from ecowatt_etl_spark.sources.formats import SCRATCH_ROOT, read_xml, write_xml

    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    path = f"{SCRATCH_ROOT}/{bucket_token(sf_dir)}/supplier_xml"
    write_xml(s, path)
    back = read_xml(spark, path, s.schema)
    return back.groupBy("s_nationkey").agg(
        F.count("*").alias("n_suppliers"), exact_sum("s_acctbal", "bal_sum")
    )


# ---------------------------------------------------------------------------
# q146 — partitioned write + statically-pruned read
# ---------------------------------------------------------------------------
@query(
    "q146_partitioned_write_prune",
    oracle=f"""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_exact_sum("value", "value_sum")}
    FROM events
    WHERE CAST(ts AS DATE) = DATE '2024-01-15'
    GROUP BY event_type
    """,
)
def q146_partitioned_write_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-partitioned warehouse layout end to end: events written
    ``partitionBy(day)``, then one day read back with a literal
    partition predicate — the filter resolves against the DIRECTORY
    LISTING (PartitionFilters in the plan, asserted in
    tests/test_plans.py), so the other 29 days' files are never
    opened. This is the dominant scan-cost lever on a 100 TB event
    lake: a day slice of a month-partitioned table reads ~3% of the
    bytes regardless of cluster size. The oracle recomputes the same
    day from the unpartitioned original, value-checking the write →
    partition-discovery → pruned-read path, not just the aggregate.
    Complements qe05 (the EcoWatt star's partitionBy('YEAR') read) on
    the warehouse tables with a per-day grain."""
    from ecowatt_etl_spark.operators.bucketing import bucket_token
    from ecowatt_etl_spark.sources.formats import SCRATCH_ROOT

    ev = load_table(spark, sf_dir, "events").withColumn("d", F.to_date("ts"))
    path = f"{SCRATCH_ROOT}/{bucket_token(sf_dir)}/events_by_day"
    ev.write.partitionBy("d").mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    return (
        back.filter(F.col("d") == F.lit("2024-01-15").cast("date"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"), exact_sum("value", "value_sum"))
    )


# ---------------------------------------------------------------------------
# q147 — keyed MERGE (upsert) into a parquet table, end to end
# ---------------------------------------------------------------------------
@query(
    "q147_merge_upsert",
    oracle=f"""
    WITH upd AS (
      SELECT s_suppkey, s_nationkey, s_acctbal + 100 AS s_acctbal
      FROM supplier WHERE s_suppkey % 10 = 3
    ),
    ins AS (
      SELECT s_suppkey + 1000000 AS s_suppkey, s_nationkey, s_acctbal
      FROM supplier WHERE s_suppkey % 10 = 7
    ),
    merged AS (
      SELECT s_suppkey, s_nationkey, s_acctbal FROM supplier
      WHERE s_suppkey % 10 <> 3
      UNION ALL SELECT * FROM upd
      UNION ALL SELECT * FROM ins
    )
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           {sql_exact_sum("s_acctbal", "bal_sum")}
    FROM merged GROUP BY s_nationkey
    """,
)
def q147_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed MERGE into a path-based parquet table under the driver
    gate (sources/upsert.py): bootstrap the supplier table, apply one
    deterministic change batch — balance bump for every key ending
    in 3 (matched → replace) plus key-shifted clones of keys ending
    in 7 (unmatched → insert) — then aggregate the POST-MERGE table.
    The oracle recomputes matched/unmatched semantics relationally
    (anti-join ≡ NOT-filter + UNION ALL), so replaced rows replacing,
    inserted rows landing, and untouched rows surviving are all
    value-checked from the files on disk, not from the in-memory
    frame. The duplicate-key batch guard and the partition-pruned
    dynamic-overwrite variant are covered in tests/test_sinks.py; at
    100 TB the same verbs run per-partition (partition_col) so a
    change batch rewrites only the partitions it touches."""
    from ecowatt_etl_spark.operators.bucketing import bucket_token
    from ecowatt_etl_spark.sources.formats import SCRATCH_ROOT
    from ecowatt_etl_spark.sources.upsert import merge_upsert

    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    path = f"{SCRATCH_ROOT}/{bucket_token(sf_dir)}/supplier_merge"
    s.write.mode("overwrite").parquet(path)  # deterministic bootstrap per run
    updates = s.filter(F.col("s_suppkey") % 10 == 3).withColumn(
        "s_acctbal", F.col("s_acctbal") + 100
    )
    inserts = s.filter(F.col("s_suppkey") % 10 == 7).withColumn(
        "s_suppkey", F.col("s_suppkey") + 1_000_000
    )
    merge_upsert(spark, path, updates.unionByName(inserts), keys=["s_suppkey"])
    back = spark.read.parquet(path)
    return back.groupBy("s_nationkey").agg(
        F.count("*").alias("n_suppliers"), exact_sum("s_acctbal", "bal_sum")
    )


# ---------------------------------------------------------------------------
# q148 — SCD2 versioned-dimension maintenance
# ---------------------------------------------------------------------------
@query(
    "q148_scd2_history",
    oracle=f"""
    WITH ver AS (
      SELECT s_suppkey, s_nationkey, s_acctbal,
             CASE WHEN s_suppkey % 10 = 3 THEN DATE '2024-02-01' END AS valid_to
      FROM supplier
      UNION ALL
      SELECT s_suppkey, s_nationkey, s_acctbal + 50, DATE '2024-03-01'
      FROM supplier WHERE s_suppkey % 10 = 3
      UNION ALL
      SELECT s_suppkey, s_nationkey, s_acctbal + 100, NULL
      FROM supplier WHERE s_suppkey % 10 = 3
    )
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_versions,
           CAST(SUM(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_open,
           {sql_exact_sum("CASE WHEN valid_to IS NULL THEN s_acctbal END", "open_bal_sum")}
    FROM ver GROUP BY s_nationkey
    """,
)
def q148_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 under the driver gate
    (sources/upsert.py::scd2_apply): a versioned supplier dimension
    receives a change batch carrying TWO changes per affected key
    (+50 on Feb 1, +100 on Mar 1), so the version chain must close the
    original row at the key's EARLIEST change, close the intermediate
    version at the next change, and leave exactly one open row per
    key. The aggregate reports versions / open rows / open-balance sum
    per nation; the oracle builds the expected three-generation
    history relationally, so chain order, row closing, and
    pass-through of unchanged keys are all value-checked. One hash
    join on the keys + one per-key window over the change batch — at
    scale the change batch is tiny and broadcasts; history rows never
    shuffle."""
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    from ecowatt_etl_spark.sources.upsert import scd2_apply

    dim = s.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.lit("2024-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    changed = s.filter(F.col("s_suppkey") % 10 == 3)
    changes = (
        changed.select(
            "s_suppkey",
            "s_nationkey",
            (F.col("s_acctbal") + 50).alias("s_acctbal"),
            F.lit("2024-02-01").cast("date").alias("valid_from"),
        )
    ).unionByName(
        changed.select(
            "s_suppkey",
            "s_nationkey",
            (F.col("s_acctbal") + 100).alias("s_acctbal"),
            F.lit("2024-03-01").cast("date").alias("valid_from"),
        )
    )
    out = scd2_apply(dim, changes, keys=["s_suppkey"])
    open_bal = F.when(F.col("valid_to").isNull(), F.col("s_acctbal"))
    return out.groupBy("s_nationkey").agg(
        F.count("*").alias("n_versions"),
        F.sum(F.when(F.col("valid_to").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_open"),
        exact_sum(open_bal, "open_bal_sum"),
    )


# ---------------------------------------------------------------------------
# q150 — recursive CTE (Spark 4 WITH RECURSIVE) hierarchy traversal
# ---------------------------------------------------------------------------
# ONE ANSI text for both engines (the q35/q36 shared-SQL pattern): a
# synthetic binary hierarchy over nation (parent = floor(key/2), rooted
# at 0), traversed recursively to assign depths, then joined against
# the per-nation customer counts for a per-level rollup. FLOOR(x/2.0)
# instead of integer division keeps the text portable (Spark has DIV,
# DuckDB has //, both have FLOOR; keys <= 24 are exact in a double).
_Q150_SQL = """
WITH RECURSIVE h AS (
  SELECT n_nationkey, 0 AS depth FROM nation WHERE n_nationkey = 0
  UNION ALL
  SELECT n.n_nationkey, h.depth + 1
  FROM nation n JOIN h ON CAST(FLOOR(n.n_nationkey / 2.0) AS BIGINT) = h.n_nationkey
  WHERE n.n_nationkey > 0
)
SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_nations,
       CAST(SUM(cnt) AS BIGINT) AS n_customers
FROM h JOIN (SELECT c_nationkey, COUNT(*) AS cnt
             FROM customer GROUP BY c_nationkey) c
  ON c.c_nationkey = h.n_nationkey
GROUP BY depth
"""


@query("q150_recursive_cte", oracle=_Q150_SQL)
def q150_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE through the ad-hoc SQL surface — Spark 4's WITH
    RECURSIVE executing the same ANSI text as the DuckDB oracle:
    hierarchy traversal (depth assignment over a parent function) plus
    an aggregate join, the org-chart/BOM query class that previously
    required the hand-rolled iterative loop (q57's label propagation
    remains the DataFrame-level path for ITERATE-TO-FIXPOINT over
    corpus-scale graphs; the recursive CTE is the SQL-surface
    equivalent for catalog-scale hierarchies). Each recursion level is
    one join of the frontier against the (tiny, broadcast) hierarchy
    table; counts only, so the cross-engine check is exact."""
    from ecowatt_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("nation", "customer"))
    return spark.sql(_Q150_SQL)


# ---------------------------------------------------------------------------
# q152 — warehouse data-quality audit (constraint violation report)
# ---------------------------------------------------------------------------
@query(
    "q152_dq_audit",
    oracle="""
    SELECT 'lineitem_orphan_orderkey' AS check_name,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
             AS n_violations
    UNION ALL
    SELECT 'lineitem_nonpositive_quantity',
           CAST((SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_discount_out_of_range',
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_discount < 0 OR l_discount > 1) AS BIGINT)
    UNION ALL
    SELECT 'orders_null_custkey',
           CAST((SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS BIGINT)
    UNION ALL
    SELECT 'orders_orphan_custkey',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    UNION ALL
    SELECT 'customer_orphan_nationkey',
           CAST((SELECT COUNT(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
    UNION ALL
    SELECT 'events_null_or_future_ts',
           CAST((SELECT COUNT(*) FROM events
                 WHERE ts IS NULL OR ts > TIMESTAMP '2030-01-01 00:00:00')
                AS BIGINT)
    """,
)
def q152_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse data-quality audit — the constraint report a pipeline
    gate runs before promoting a batch: referential integrity
    (FK-orphan checks as LEFT ANTI joins — the join form of NOT
    EXISTS, no subquery-per-row), domain constraints (non-positive
    quantities, out-of-range discounts), null keys, and
    impossible-future timestamps, each reduced to one violation count.
    Complements the per-query observe() gates (streaming quality
    metrics) with a batch whole-warehouse sweep. Scale shape: each
    check is filter+count (scan-local partial counts) or an anti-join
    on the FK (broadcast when the PK side is small, shuffled
    otherwise); checks are independent and Spark runs the union's
    branches as parallel jobs; the 7-row report unions cheaply.
    Violation counts are zero on the synthetic warehouse by
    construction — the oracle proves the CHECKS agree cross-engine,
    and tests/test_functions_properties.py proves they fire on
    seeded-dirty data."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    ev = load_table(spark, sf_dir, "events")

    def _count(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count("*").alias("n_violations"),
        )

    checks = [
        _count(
            "lineitem_orphan_orderkey",
            li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti"),
        ),
        _count("lineitem_nonpositive_quantity", li.filter(F.col("l_quantity") <= 0)),
        _count(
            "lineitem_discount_out_of_range",
            li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
        ),
        _count("orders_null_custkey", o.filter(F.col("o_custkey").isNull())),
        _count(
            "orders_orphan_custkey",
            o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti"),
        ),
        _count(
            "customer_orphan_nationkey",
            c.join(n, c["c_nationkey"] == n["n_nationkey"], "left_anti"),
        ),
        _count(
            "events_null_or_future_ts",
            ev.filter(
                F.col("ts").isNull()
                | (F.col("ts") > F.lit("2030-01-01 00:00:00").cast("timestamp"))
            ),
        ),
    ]
    out = checks[0]
    for ch in checks[1:]:
        out = out.unionByName(ch)
    return out


# ---------------------------------------------------------------------------
# q178 — point-in-time (PIT) join of the fact against the SCD2 dimension
# ---------------------------------------------------------------------------
@query(
    "q178_pit_join",
    oracle=f"""
    WITH ver AS (
      SELECT s_suppkey, s_nationkey, s_acctbal,
             DATE '1994-01-01' AS valid_from,
             CASE WHEN s_suppkey % 10 = 3 THEN DATE '1997-01-01' END AS valid_to
      FROM supplier
      UNION ALL
      SELECT s_suppkey, s_nationkey, s_acctbal + 50,
             DATE '1997-01-01', DATE '1999-01-01'
      FROM supplier WHERE s_suppkey % 10 = 3
      UNION ALL
      SELECT s_suppkey, s_nationkey, s_acctbal + 100,
             DATE '1999-01-01', NULL
      FROM supplier WHERE s_suppkey % 10 = 3
    )
    SELECT v.s_nationkey, v.valid_from,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {sql_exact_sum_product("l_extendedprice", "(1 - l_discount)", "revenue")}
    FROM lineitem l
    JOIN ver v
      ON v.s_suppkey = l.l_suppkey
     AND CAST(l.l_shipdate AS DATE) >= v.valid_from
     AND (v.valid_to IS NULL OR CAST(l.l_shipdate AS DATE) < v.valid_to)
    GROUP BY v.s_nationkey, v.valid_from
    """,
)
def q178_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: every lineitem is attributed to the supplier
    VERSION that was valid on its ship date — the query-side
    complement of q148's SCD2 maintenance, and the join every
    versioned-dimension warehouse (and every leakage-safe ML feature
    store) lives on: joining the current dimension row instead would
    leak future attributes into historical facts. The history is
    produced by the same operator q148 gates (sources/upsert.py::
    scd2_apply — change batch at 1997-01-01/+50 and 1999-01-01/+100,
    chain closing value-checked there); this query proves the
    RETRIEVAL side: the (valid_from, valid_to] interval predicate
    routes each of the seven shipping years to the right generation.

    Scale: the versioned dimension stays dimension-sized (versions
    multiply it by small constants), so the PIT join is a BROADCAST
    hash join on s_suppkey with the interval predicate evaluated
    post-match — the fact never shuffles. For a version chain too
    deep to broadcast, the documented fallback is the q46 as-of
    construction (union fact+versions, one running-struct window per
    key). Revenue rides exact decimal."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.to_date("l_shipdate").alias("ship_date"),
        "l_extendedprice",
        "l_discount",
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    from ecowatt_etl_spark.sources.upsert import scd2_apply

    dim = s.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.lit("1994-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    changed = s.filter(F.col("s_suppkey") % 10 == 3)
    changes = changed.select(
        "s_suppkey",
        "s_nationkey",
        (F.col("s_acctbal") + 50).alias("s_acctbal"),
        F.lit("1997-01-01").cast("date").alias("valid_from"),
    ).unionByName(
        changed.select(
            "s_suppkey",
            "s_nationkey",
            (F.col("s_acctbal") + 100).alias("s_acctbal"),
            F.lit("1999-01-01").cast("date").alias("valid_from"),
        )
    )
    hist = scd2_apply(dim, changes, keys=["s_suppkey"])
    cond = (
        (F.col("s_suppkey") == F.col("l_suppkey"))
        & (F.col("ship_date") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ship_date") < F.col("valid_to")))
    )
    j = li.join(F.broadcast(hist), cond)
    return j.groupBy("s_nationkey", "valid_from").agg(
        F.count("*").alias("n_items"),
        exact_sum_product(
            "l_extendedprice", F.lit(1) - F.col("l_discount"), "revenue"
        ),
    )


# ---------------------------------------------------------------------------
# q187 — correlated LATERAL top-k (one ANSI text, both engines)
# ---------------------------------------------------------------------------
_Q187_SQL = """
WITH rev AS (
  SELECT n.n_regionkey, n.n_name,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                       * CAST((1 - l_discount) AS DECIMAL(18,6)))
                   AS VARCHAR(64)) AS DOUBLE) AS revenue
  FROM lineitem
  JOIN supplier s ON s.s_suppkey = l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  GROUP BY n.n_regionkey, n.n_name
)
SELECT r.r_name AS region, t.n_name AS nation, t.revenue
FROM region r, LATERAL (
  SELECT n_name, revenue FROM rev
  WHERE rev.n_regionkey = r.r_regionkey
  ORDER BY revenue DESC, n_name
  LIMIT 2
) t
"""


@query("q187_lateral_topk", oracle=_Q187_SQL)
def q187_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join — the ANSI form of per-group top-k
    (each region pulls its own top-2 revenue nations from a
    correlated, ordered, limited subquery), executing the SAME text
    on Spark 4 and the DuckDB oracle (the q150 shared-SQL pattern).
    Catalyst decorrelates the lateral subquery into the window/rank
    plan rather than re-running it per outer row, so the SQL-surface
    convenience costs the same as the explicit q23 WindowGroupLimit
    formulation; revenue rides exact decimal with the string-routed
    final cast, and the DESC tie is broken by name so the LIMIT cut
    is total-order deterministic."""
    from ecowatt_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("lineitem", "supplier", "nation", "region"))
    return spark.sql(_Q187_SQL)


# ---------------------------------------------------------------------------
# q193 — custom Python Data Source (Spark 4 DataSource API): date dim
# ---------------------------------------------------------------------------
@query(
    "q193_python_datasource",
    oracle="""
    WITH cal AS (
      SELECT CAST(unnest(generate_series(DATE '2024-01-01',
                                         DATE '2024-12-31',
                                         INTERVAL '1 day')) AS DATE) AS d
    )
    SELECT CAST(month(d) AS INTEGER) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN isodow(d) >= 6 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_weekend,
           MIN(d) AS first_date, MAX(d) AS last_date
    FROM cal GROUP BY 1
    """,
)
def q193_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A custom PYTHON DATA SOURCE (the Spark 4 DataSource API —
    sources/pydatasource.py) read as a first-class
    ``spark.read.format("date_dim")`` table: the calendar dimension is
    GENERATED procedurally, one InputPartition per month, so the read
    parallelizes like a file scan with zero driver-side rows. This is
    the engine's extension point for systems with no built-in
    connector (internal APIs, proprietary formats, simulators) — the
    source registers once per session and then behaves exactly like
    parquet in joins, filters, and aggregates. The query rolls the
    generated 2024 calendar up per month (day counts, weekend counts,
    date bounds) and the DuckDB oracle regenerates the same calendar
    relationally — so the custom-source read path is value-gated
    end-to-end, ISO weekday semantics included.

    Scale: partition-per-month fans a 50-year calendar across 600
    tasks; a generator source's partition scheme IS its scan
    parallelism, the same capacity decision as file splits."""
    from ecowatt_etl_spark.sources.pydatasource import register_date_dim

    register_date_dim(spark)
    cal = (
        spark.read.format("date_dim")
        .option("start", "2024-01-01")
        .option("end", "2024-12-31")
        .load()
    )
    return cal.groupBy("month").agg(
        F.count("*").alias("n_days"),
        F.sum(F.when(F.col("is_weekend"), 1).otherwise(0))
        .cast("long")
        .alias("n_weekend"),
        F.min("date").alias("first_date"),
        F.max("date").alias("last_date"),
    )


# ---------------------------------------------------------------------------
# q195 — SQL-defined scalar function (Spark 4 CREATE FUNCTION ... RETURN)
# ---------------------------------------------------------------------------
@query(
    "q195_sql_udf",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                         * CAST((1 - l_discount) AS DECIMAL(18,6))
                         * CAST((1 + l_tax) AS DECIMAL(18,6)))
                     AS VARCHAR) AS DOUBLE) AS total_charge
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q195_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A SQL-DEFINED scalar function (Spark 4's ``CREATE TEMPORARY
    FUNCTION ... RETURNS ... RETURN <expr>``): the business rule
    "charge = price × (1−discount) × (1+tax)" is declared ONCE as a
    catalog function and reused by name — the governance shape
    warehouses want for shared metric definitions (one definition,
    every query consistent), and the first-class alternative to
    copy-pasting the expression or registering a (slow, opaque)
    Python UDF. Because the body is a SQL expression, Catalyst
    INLINES it — the plan is identical to writing the expression by
    hand: whole-stage codegen, exact decimals, no Python, pushdown
    unobstructed. The oracle states the expanded expression, proving
    the function path changes nothing.

    Scale: zero cost — the function exists only in the catalog; the
    executed plan is the plain exact-decimal aggregate."""
    from ecowatt_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("lineitem",))
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION effective_charge("
        "price DOUBLE, discount DOUBLE, tax DOUBLE) RETURNS DECIMAL(38,6) "
        "RETURN CAST(price AS DECIMAL(18,6))"
        " * CAST((1 - discount) AS DECIMAL(18,6))"
        " * CAST((1 + tax) AS DECIMAL(18,6))"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n_items,
               CAST(CAST(SUM(effective_charge(l_extendedprice, l_discount,
                                              l_tax)) AS STRING) AS DOUBLE)
                 AS total_charge
        FROM lineitem GROUP BY l_returnflag
        """
    )


# ---------------------------------------------------------------------------
# q199 — SQL pipe syntax (Spark 4 |> operators)
# ---------------------------------------------------------------------------
@query(
    "q199_pipe_syntax",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                     AS VARCHAR) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    HAVING COUNT(*) > 100
    """,
)
def q199_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE SYNTAX (Spark 4's ``|>`` operators, the GoogleSQL
    pipe-flow surface): the query reads top-to-bottom as a dataflow —
    FROM → WHERE → AGGREGATE → WHERE-on-aggregate — instead of the
    inside-out SELECT nesting, and compiles to the IDENTICAL plan as
    the classic formulation (the oracle is that classic formulation,
    so the equivalence is value-checked, exact decimals included).
    Pipe syntax matters to this engine because generated and
    hand-maintained pipelines compose by APPENDING stages — the form
    a query builder or an LLM emitting SQL naturally produces.

    Scale: surface-only — same Catalyst plan, same single exact-
    decimal hash aggregate with the status filter pushed to the
    scan."""
    from ecowatt_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE COUNT(*) AS n_orders,
                     CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                               AS STRING) AS DOUBLE) AS total_price
           GROUP BY o_orderpriority
        |> WHERE n_orders > 100
        |> SELECT o_orderpriority, n_orders, total_price
        """
    )


# ---------------------------------------------------------------------------
# q223 — ANALYZE-style column statistics sweep (CBO stats surface)
# ---------------------------------------------------------------------------
# Explicit column spec (not schema reflection) so the oracle string is
# fixed at import time and the audit fails loudly on schema drift.
_STATS_COLS: dict[str, tuple[tuple[str, str], ...]] = {
    "region": (("r_regionkey", "num"), ("r_name", "str")),
    "nation": (
        ("n_nationkey", "num"), ("n_name", "str"), ("n_regionkey", "num"),
    ),
    "customer": (
        ("c_custkey", "num"), ("c_name", "str"), ("c_nationkey", "num"),
        ("c_acctbal", "num"), ("c_mktsegment", "str"),
    ),
    "supplier": (
        ("s_suppkey", "num"), ("s_name", "str"), ("s_nationkey", "num"),
        ("s_acctbal", "num"),
    ),
    "part": (
        ("p_partkey", "num"), ("p_name", "str"), ("p_brand", "str"),
        ("p_type", "str"), ("p_size", "num"), ("p_retailprice", "num"),
    ),
    "orders": (
        ("o_orderkey", "num"), ("o_custkey", "num"), ("o_orderstatus", "str"),
        ("o_totalprice", "num"), ("o_orderdate", "ts"),
        ("o_orderpriority", "str"),
    ),
    "lineitem": (
        ("l_orderkey", "num"), ("l_partkey", "num"), ("l_suppkey", "num"),
        ("l_linenumber", "num"), ("l_quantity", "num"),
        ("l_extendedprice", "num"), ("l_discount", "num"), ("l_tax", "num"),
        ("l_returnflag", "str"), ("l_linestatus", "str"),
        ("l_shipdate", "ts"),
    ),
    "events": (
        ("event_id", "num"), ("ts", "ts"), ("user_id", "num"),
        ("event_type", "str"), ("value", "num"), ("props", "str"),
    ),
    "documents": (
        ("doc_id", "num"), ("text", "str"), ("lang", "str"),
        ("source", "str"), ("n_chars", "num"),
    ),
    "embeddings": (
        ("vec_id", "num"), ("embedding", "other"), ("label", "num"),
    ),
}


def _stats_col_sql(tbl: str, col: str, kind: str) -> str:
    if kind == "num":
        mn = f"CAST(CAST(MIN({col}) AS DECIMAL(18,6)) AS VARCHAR)"
        mx = f"CAST(CAST(MAX({col}) AS DECIMAL(18,6)) AS VARCHAR)"
    elif kind == "str":
        mn, mx = f"MIN({col})", f"MAX({col})"
    elif kind == "ts":
        mn = f"strftime(MIN({col}), '%Y-%m-%d %H:%M:%S')"
        mx = f"strftime(MAX({col}), '%Y-%m-%d %H:%M:%S')"
    else:
        mn = mx = "CAST(NULL AS VARCHAR)"
    return f"""
    SELECT '{tbl}' AS table_name, '{col}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           CAST(COUNT(DISTINCT {col}) AS BIGINT) AS ndv,
           {mn} AS min_value, {mx} AS max_value
    FROM {tbl}
    """


@query(
    "q223_column_stats",
    oracle=" UNION ALL ".join(
        _stats_col_sql(t, c, k)
        for t, cols in _STATS_COLS.items()
        for c, k in cols
    ),
)
def q223_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-TABLE statistics sweep — the per-column (row count, null
    count, exact NDV, min, max) table a cost-based optimizer feeds on
    and every data catalog displays, across ALL ten warehouse tables:
    a wide no-distinct aggregate per table (row count, null counts,
    typed min/max — constant state per column) plus one RAW-typed
    single-distinct aggregate per column for the exact NDVs, joined
    back per column. Complements q152 (constraint violations) with
    the statistics half of warehouse metadata maintenance; q176
    (skew) and q209 (join sizes) consume exactly these numbers at
    planning time.

    Why not one multi-distinct aggregate (the pre-r8 form): Catalyst
    rewrites N count_distincts into an Expand carrying EVERY audited
    column on every duplicated row, keyed by an N-column struct — on
    the 60M-row 100× lineitem that is ~720M wide rows into one hash
    aggregate, measured task OOM. The r8–r11 answer was a ``stack``
    fan-out into one (table, column, value-as-string) group-distinct —
    spillable, but still ~660M stringified rows through a single
    aggregate (~156 s at 100×). r12 (guide §2.3): single-distinct
    aggregates never Expand, so per-column COUNT(DISTINCT col) on the
    RAW value is both fan-out-free and string-free; each column's
    dedup shuffles its own distinct values at native width and the
    60 subtrees schedule as independent stages of one job.

    Cross-engine rendering discipline: numeric min/max are normalized
    through decimal(18,6) (fixed-scale string form both engines agree
    on), timestamps through the UTC 'yyyy-MM-dd HH:mm:ss' format,
    strings compared raw (ASCII corpus; binary vs collation order is
    a documented caveat for non-ASCII deployments); complex-typed
    columns report NDV only. At 100 TB the same query runs per
    PARTITION and the stats roll up — counts and null counts add, NDV
    upgrades to the mergeable HLL sketch (q09b), min/max take
    min/max; the spec is an explicit literal so schema drift fails
    the audit loudly instead of silently skipping a column."""
    frames = []
    ndv_frames = []
    for tbl, cols in _STATS_COLS.items():
        df = load_table(spark, sf_dir, tbl)
        aggs = [F.count("*").alias("n_rows")]
        for c, kind in cols:
            aggs.append(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("long")
                .alias(f"nn_{c}")
            )
            if kind == "num":
                mn = F.min(F.col(c).cast("decimal(18,6)")).cast("string")
                mx = F.max(F.col(c).cast("decimal(18,6)")).cast("string")
            elif kind == "str":
                mn, mx = F.min(F.col(c)), F.max(F.col(c))
            elif kind == "ts":
                mn = F.date_format(F.min(c), "yyyy-MM-dd HH:mm:ss")
                mx = F.date_format(F.max(c), "yyyy-MM-dd HH:mm:ss")
            else:
                mn = mx = F.lit(None).cast("string")
            aggs.append(mn.alias(f"mn_{c}"))
            aggs.append(mx.alias(f"mx_{c}"))
        wide = df.agg(*aggs)
        per_col = [
            F.struct(
                F.lit(tbl).alias("table_name"),
                F.lit(c).alias("column_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"nn_{c}").alias("n_nulls"),
                F.col(f"mn_{c}").alias("min_value"),
                F.col(f"mx_{c}").alias("max_value"),
            )
            for c, _ in cols
        ]
        frames.append(
            wide.select(F.explode(F.array(*per_col)).alias("s")).select("s.*")
        )
        # r12 (guide §2.3, verdict item 3): exact NDVs as one RAW-typed
        # single-distinct aggregate PER COLUMN instead of the stack
        # fan-out. The stack blew every scanned row into N slim
        # (name, string) rows — ~660M stringified rows through one
        # group-distinct at 100× — when COUNT(DISTINCT col) per column
        # needs no fan-out at all: a single-distinct aggregate plans as
        # partial dedup on the raw value (no Expand — only
        # multi-distinct aggregates trigger it), so each column
        # shuffles only its own distinct raw values (8-byte longs
        # instead of decimal-rendered strings) and the per-column
        # subtrees schedule as independent stages of one job. Engine
        # DISTINCT semantics (-0.0 = 0.0, one NaN class) now match the
        # oracle's COUNT(DISTINCT col) by definition instead of via the
        # r8 string-injectivity argument; the scan volume is unchanged
        # (the stack read the same columns once — parquet prunes per
        # subtree here).
        for c, _ in cols:
            ndv_frames.append(
                df.agg(F.count_distinct(F.col(c)).alias("ndv")).select(
                    F.lit(tbl).alias("table_name"),
                    F.lit(c).alias("column_name"),
                    F.col("ndv"),
                )
            )
    ndv = ndv_frames[0]
    for f in ndv_frames[1:]:
        ndv = ndv.unionByName(f)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return (
        out.join(ndv, ["table_name", "column_name"], "left")
        .select(
            "table_name",
            "column_name",
            "n_rows",
            "n_nulls",
            F.coalesce(F.col("ndv"), F.lit(0)).cast("long").alias("ndv"),
            "min_value",
            "max_value",
        )
    )


# ---------------------------------------------------------------------------
# q224 — HLL sketch MERGEABILITY audit (DataSketches hll_* surface)
# ---------------------------------------------------------------------------
_HLL_BOUND_BP = 500  # merged estimate must sit within 5% of exact


@query(
    "q224_hll_merge_audit",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS within_bound
    FROM events GROUP BY event_type
    """,
)
def q224_hll_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch MERGEABILITY — the property that makes distinct
    counting viable at 100 TB: per-(type, day) DataSketches HLL
    sketches built with `hll_sketch_agg` are UNIONED per type with
    `hll_union_agg`, and the merged estimate is audited against the
    exact distinct count under a 500-basis-point accuracy
    contract. This upgrades q09b (single-shot approx_count_distinct,
    rows-only) to the full sketch LIFECYCLE the engine serves in
    production: build sketches per partition/day at ingest, persist
    them as binary columns, merge across any grouping later — a
    distinct count over any date range without rescanning the facts.

    Oracle pattern = the sketch accuracy contract (q161/q163/q179):
    the approximate value itself is engine-specific, so the
    driver-checked columns are the EXACT count and the boolean
    bound verdict; the estimate stays observable via the pytest
    invariant that pins |est − exact| ≤ bound per row. Sketch
    state is ~KB per (type, day); both aggregation levels are
    map-side combinable."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return exact.join(merged, "event_type").select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("est") - F.col("n_exact")) * 10_000
            <= F.lit(_HLL_BOUND_BP) * F.col("n_exact")
        ).alias("within_bound"),
    )


# ---------------------------------------------------------------------------
# q230 — schema-contract diff between table versions (footer-level)
# ---------------------------------------------------------------------------
from ecowatt_etl_spark.operators.bucketing import bucket_token as _bt  # noqa: E402
from ecowatt_etl_spark.sources.formats import SCRATCH_ROOT as _SR  # noqa: E402

from ecowatt_etl_spark.sources.tables import ORACLE_SF_DIR as _OSD  # noqa: E402
_CONTRACT_GATE = f"{_SR}/{_bt(_OSD)}"  # oracle path


@query(
    "q230_schema_diff",
    oracle=f"""
    WITH v1 AS (
      SELECT name, type
      FROM parquet_schema('{_CONTRACT_GATE}/contract_v1/*.parquet')
      WHERE type IS NOT NULL
    ),
    v2 AS (
      SELECT name, type
      FROM parquet_schema('{_CONTRACT_GATE}/contract_v2/*.parquet')
      WHERE type IS NOT NULL
    )
    SELECT COALESCE(v1.name, v2.name) AS column_name,
           v1.type AS v1_type, v2.type AS v2_type,
           CASE WHEN v1.type IS NULL THEN 'added'
                WHEN v2.type IS NULL THEN 'dropped'
                WHEN v1.type <> v2.type THEN 'type_changed'
                ELSE 'unchanged' END AS verdict
    FROM v1 FULL OUTER JOIN v2 ON v2.name = v1.name
    """,
)
def q230_schema_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA-CONTRACT diff between two table versions — the
    compatibility report a data-contract gate emits before accepting a
    producer's new batch: per column, added / dropped / type_changed /
    unchanged, read from the parquet FOOTERS of both versions (the
    ground truth a consumer's scan will actually see — not a catalog
    that can drift from the files). q143 proves the engine READS mixed
    generations; this is the governance view that decides whether it
    should. The diff compares parquet PHYSICAL types (INT64 / INT32 /
    DOUBLE / BYTE_ARRAY) — the vocabulary pyarrow and DuckDB's
    parquet_schema() share, so the check is engine-exact with no
    type-name mapping layer.

    Version fixtures are bootstrapped from supplier: v2 drops s_name,
    adds s_rating, and widens s_nationkey INT32→INT64 — one of each
    verdict class plus unchanged columns. Footer parsing rides the
    q222 machinery (binaryFile → pyarrow in mapInPandas, KB per file);
    the diff itself is a full-outer join on column name over frames
    bounded by schema width, so cost is independent of table size."""
    import pandas as pd

    from ecowatt_etl_spark.operators.bucketing import bucket_token
    from ecowatt_etl_spark.sources.formats import SCRATCH_ROOT

    s = load_table(spark, sf_dir, "supplier")
    root = f"{SCRATCH_ROOT}/{bucket_token(sf_dir)}"
    s.select("s_suppkey", "s_name", "s_nationkey", "s_acctbal").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{root}/contract_v1")
    s.select(
        "s_suppkey",
        F.col("s_nationkey").cast("long").alias("s_nationkey"),
        "s_acctbal",
        (F.col("s_suppkey") % 5).alias("s_rating"),
    ).coalesce(1).write.mode("overwrite").parquet(f"{root}/contract_v2")

    def footer_schema(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq

        for pdf in batches:
            names, types = [], []
            for content in pdf["content"]:
                sch = pq.ParquetFile(pa.BufferReader(content)).metadata.schema
                for i in range(len(sch)):
                    c = sch.column(i)
                    names.append(c.name)
                    types.append(c.physical_type)
            yield pd.DataFrame({"name": names, "ptype": types})

    def version(tag: str) -> DataFrame:
        return (
            spark.read.format("binaryFile")
            .load(f"{root}/{tag}/*.parquet")
            .select("content")
            .mapInPandas(footer_schema, "name string, ptype string")
        )

    v1 = version("contract_v1").withColumnsRenamed({"ptype": "v1_type"})
    v2 = version("contract_v2").withColumnsRenamed({"ptype": "v2_type"})
    j = v1.join(v2, "name", "full_outer")
    verdict = (
        F.when(F.col("v1_type").isNull(), "added")
        .when(F.col("v2_type").isNull(), "dropped")
        .when(F.col("v1_type") != F.col("v2_type"), "type_changed")
        .otherwise("unchanged")
    )
    return j.select(
        F.col("name").alias("column_name"),
        "v1_type",
        "v2_type",
        verdict.alias("verdict"),
    )


# ---------------------------------------------------------------------------
# q231 — equi-depth histogram boundaries (CBO statistics artifact)
# ---------------------------------------------------------------------------
_EQD_B = 10  # buckets


@query(
    "q231_equidepth_histogram",
    oracle=f"""
    WITH dv AS (
      SELECT CAST(l_extendedprice AS DECIMAL(18,6)) AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ),
    cum AS (
      SELECT v, c,
             SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cm,
             COALESCE(SUM(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pcm,
             SUM(c) OVER () AS n
      FROM dv
    ),
    marks AS (
      SELECT i AS bucket_id, v, cm
      FROM cum, UNNEST(generate_series(
             CAST(pcm * {_EQD_B} // n AS BIGINT) + 1,
             CAST(cm * {_EQD_B} // n AS BIGINT))) AS u(i)
      WHERE cm * {_EQD_B} // n >= pcm * {_EQD_B} // n + 1
    )
    SELECT CAST(bucket_id AS BIGINT) AS bucket_id,
           CAST(v AS VARCHAR) AS upper_bound,
           CAST(cm AS BIGINT) AS cum_rows,
           CAST(cm - COALESCE(LAG(cm) OVER (ORDER BY bucket_id), 0)
                AS BIGINT) AS bucket_rows
    FROM marks
    """,
)
def q231_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUI-DEPTH histogram boundaries for ``l_extendedprice`` — the
    selectivity-estimation artifact CBOs actually store (equi-depth,
    not equi-width like q85, because skewed columns need equal ROW
    mass per bucket): the 10 bucket upper bounds (the value at
    rank ⌈i·n/10⌉), each bucket's exact row count, and the
    cumulative frequency. Completes the optimizer-statistics suite:
    q223 (NDV/min/max), q176 (skew), q209 (join sizes), this
    (selectivity curves).

    No per-row ranking: distinct values with counts, one cumulative
    window over the reduced frame (q206 discipline), then each
    distinct value computes — in EXACT integer arithmetic — which
    target ranks it is the boundary for (i ∈ (⌊prev·B/n⌋, ⌊cum·B/n⌋]:
    the inequality ⌈i·n/B⌉ ≤ cum ⇔ i·n ≤ cum·B made integral), so
    every bucket id is emitted exactly once with zero float ops.
    Values ride decimal(18,6), so boundary rendering is byte-equal
    cross-engine."""
    dv = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_extendedprice").cast("decimal(18,6)").alias("v"))
        .agg(F.count("*").alias("c"))
    )
    w = W.orderBy("v")
    cum = dv.select(
        "v",
        F.sum("c").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("cm"),
        F.coalesce(
            F.sum("c").over(w.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
        ).alias("pcm"),
        F.sum("c").over(W.partitionBy()).alias("n"),
    )
    marks = cum.select(
        "v",
        "cm",
        F.explode(
            F.expr(
                f"sequence(pcm * {_EQD_B} DIV n + 1, cm * {_EQD_B} DIV n)"
            )
        ).alias("bucket_id"),
    ).where(
        F.expr(f"cm * {_EQD_B} DIV n >= pcm * {_EQD_B} DIV n + 1")
    )
    lag_w = W.orderBy("bucket_id")
    return marks.select(
        F.col("bucket_id").cast("long").alias("bucket_id"),
        F.col("v").cast("string").alias("upper_bound"),
        F.col("cm").cast("long").alias("cum_rows"),
        (
            F.col("cm") - F.coalesce(F.lag("cm").over(lag_w), F.lit(0))
        ).cast("long").alias("bucket_rows"),
    )


# ---------------------------------------------------------------------------
# q232 — functional-dependency discovery (catalog / CBO metadata)
# ---------------------------------------------------------------------------
_FD_PAIRS: tuple[tuple[str, str, str], ...] = (
    ("nation", "n_nationkey", "n_regionkey"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("events", "user_id", "event_type"),
    ("documents", "lang", "source"),
    ("part", "p_brand", "p_type"),
)


def _fd_block_sql(tbl: str, lhs: str, rhs: str) -> str:
    return f"""
    SELECT '{tbl}.{lhs}->{rhs}' AS dependency,
           CAST(COUNT(DISTINCT {lhs}) AS BIGINT) AS ndv_lhs,
           CAST(COUNT(DISTINCT ({lhs}, {rhs})) AS BIGINT) AS ndv_pair,
           CAST(COUNT(DISTINCT {lhs}) * 10000
                // COUNT(DISTINCT ({lhs}, {rhs})) AS BIGINT) AS strength_bp,
           COUNT(DISTINCT {lhs}) = COUNT(DISTINCT ({lhs}, {rhs})) AS is_fd
    FROM {tbl}
    """


@query(
    "q232_fd_discovery",
    oracle=" UNION ALL ".join(_fd_block_sql(*p) for p in _FD_PAIRS),
)
def q232_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUNCTIONAL-DEPENDENCY discovery — does column B depend on
    column A? Measured exactly as ndv(A) vs ndv(A,B): equal ⇒ every
    A value maps to one B (a true FD, strength 10000 bp); the ratio
    is the dependency STRENGTH a cost-based optimizer uses to fix
    correlated-predicate selectivity estimates (the classic
    independence-assumption error) and a catalog surfaces as implied
    constraints. Audits six candidate pairs, one scan
    per table (count_distinct of the value and of the (lhs, rhs)
    struct ride the same Expand aggregate, the q223 shape).

    The nation pair is a key-implied FD (strength 10000 by
    construction — the positive control); the rest measure how far
    real column pairs sit from independence. Exact integers
    throughout; basis-point strength keeps it hash-stable."""
    frames = []
    for tbl, lhs, rhs in _FD_PAIRS:
        df = load_table(spark, sf_dir, tbl)
        ndv_l = F.count_distinct(F.col(lhs))
        ndv_p = F.count_distinct(F.struct(lhs, rhs))
        frames.append(
            df.agg(
                F.lit(f"{tbl}.{lhs}->{rhs}").alias("dependency"),
                ndv_l.alias("ndv_lhs"),
                ndv_p.alias("ndv_pair"),
                F.expr(
                    f"CAST(COUNT(DISTINCT {lhs}) * 10000"
                    f" DIV COUNT(DISTINCT ({lhs}, {rhs})) AS BIGINT)"
                ).alias("strength_bp"),
                (ndv_l == ndv_p).alias("is_fd"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# ---------------------------------------------------------------------------
# q234 — partitioned-statistics MERGE audit (the rollup q223 promises)
# ---------------------------------------------------------------------------
_MERGE_BOUND_BP = 500  # merged HLL NDV must sit within 5% of exact


@query(
    "q234_stats_merge_audit",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CAST(MIN(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR)
                AS VARCHAR) AS min_price,
           CAST(CAST(MAX(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR)
                AS VARCHAR) AS max_price,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS ndv_exact,
           TRUE AS merge_counts_ok,
           TRUE AS merge_minmax_ok,
           TRUE AS ndv_within_bound
    FROM orders
    """,
)
def q234_stats_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATS MERGEABILITY audit — the property q223's docstring
    promises at 100 TB, proven as a value-checked query: compute the
    per-column statistics independently on two disjoint shards
    (orderkey parity — stand-ins for partitions/files), MERGE them
    (counts add, min/min, max/max, NDV by HLL sketch union), and
    verify the merged values against a direct whole-table pass. The
    exact stats must agree EXACTLY (booleans), the sketched NDV
    within the 500 bp contract (the q224 pattern). This
    is the algebra that lets a catalog maintain table stats
    incrementally — per new partition, never a full rescan.

    One scan per shard plus one whole-table audit scan; every merge
    is a two-row reduction. The driver-checked columns are the
    whole-table truths plus the three verdicts."""
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,6)")
    shard = (
        o.groupBy((F.col("o_orderkey") % 2).alias("shard"))
        .agg(
            F.count("*").alias("n"),
            F.min(price).alias("mn"),
            F.max(price).alias("mx"),
            F.hll_sketch_agg("o_custkey").alias("sk"),
        )
    )
    merged = shard.agg(
        F.sum("n").cast("long").alias("m_n"),
        F.min("mn").alias("m_mn"),
        F.max("mx").alias("m_mx"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("m_ndv"),
    )
    direct = o.agg(
        F.count("*").alias("n_rows"),
        F.min(price).alias("d_mn"),
        F.max(price).alias("d_mx"),
        F.count_distinct("o_custkey").alias("ndv_exact"),
    )
    return direct.crossJoin(F.broadcast(merged)).select(
        "n_rows",
        F.col("d_mn").cast("string").alias("min_price"),
        F.col("d_mx").cast("string").alias("max_price"),
        "ndv_exact",
        (F.col("m_n") == F.col("n_rows")).alias("merge_counts_ok"),
        (
            (F.col("m_mn") == F.col("d_mn")) & (F.col("m_mx") == F.col("d_mx"))
        ).alias("merge_minmax_ok"),
        (
            F.abs(F.col("m_ndv") - F.col("ndv_exact")) * 10_000
            <= F.lit(_MERGE_BOUND_BP) * F.col("ndv_exact")
        ).alias("ndv_within_bound"),
    )


# ---------------------------------------------------------------------------
# q237 — LIVE JDBC round-trip through embedded Derby (S7/S8/S10 e2e)
# ---------------------------------------------------------------------------
@query(
    "q237_jdbc_roundtrip",
    oracle=f"""
    SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           {sql_exact_sum("s_acctbal", "bal_sum")}
    FROM supplier GROUP BY s_nationkey
    """,
)
def q237_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE JDBC round-trip — the reference's SQL-database load path
    (S7/S8, utils/datsetup.py:98-117) executed end to end against a
    REAL database under the driver's value gate: supplier →
    ``write_jdbc(mode='replace')`` into embedded Apache Derby →
    ``spark.read.jdbc`` back → aggregate. Matching the same aggregate
    over the parquet original proves the DB round-trip lossless
    including the doubles (Derby stores IEEE DOUBLE bit-exactly).
    tests/test_sinks.py exercises replace-overwrite, append, and PK
    DDL; this query puts the read-back under the cross-engine hash.

    Scale: the JDBC writer bounds concurrent connections via
    repartition(num_partitions) — a 1000-executor job cannot open
    1000 sessions against one database; the read side is a single
    partition here (Derby is embedded), production reads shard with
    partitionColumn bounds. The database lives under the scratch root
    keyed by sf_dir, so scales don't collide."""
    from ecowatt_etl_spark.operators.bucketing import bucket_token
    from ecowatt_etl_spark.sources.formats import SCRATCH_ROOT
    from ecowatt_etl_spark.sources.jdbc import write_jdbc

    s = load_table(spark, sf_dir, "supplier")
    url = f"jdbc:derby:{SCRATCH_ROOT}/{bucket_token(sf_dir)}/derby_rt;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    write_jdbc(s, url, "supplier_rt", mode="replace", properties=props)
    back = spark.read.jdbc(url=url, table="supplier_rt", properties=props)
    return back.groupBy("s_nationkey").agg(
        F.count("*").alias("n_suppliers"),
        exact_sum("s_acctbal", "bal_sum"),
    )


# ---------------------------------------------------------------------------
# q248 — SQL scripting (Spark 4 procedural BEGIN…END surface)
# ---------------------------------------------------------------------------
@query(
    "q248_sql_scripting",
    oracle="""
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS mo,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)) * 100) AS BIGINT)
               AS rev_c
      FROM orders GROUP BY 1
    ),
    f AS (SELECT rev_c AS first_c FROM m ORDER BY mo LIMIT 1),
    l AS (SELECT rev_c AS last_c FROM m ORDER BY mo DESC LIMIT 1)
    SELECT first_c AS first_month_cents,
           last_c AS last_month_cents,
           last_c * 10000 // first_c AS growth_bp,
           list_reduce(
             list_prepend(last_c,
                          list_transform(generate_series(1, 6),
                                         i -> CAST(0 AS BIGINT))),
             (acc, e) -> acc * (last_c * 10000 // first_c) // 10000)
             AS proj_6m_cents
    FROM f, l
    """,
)
def q248_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SCRIPTING (Spark 4's ANSI/PSM procedural surface): a
    BEGIN…END block with DECLAREd session variables, scalar-subquery
    SETs, and a WHILE loop — the stored-procedure idiom migrations
    from T-SQL/PLpgSQL warehouses depend on, running natively in the
    engine. The script reads first- and last-month revenue (exact
    cents), derives an integer basis-point growth rate, compounds it
    SIX iterations in the loop (floor division each round, so the
    trajectory is integer-exact and engine-reproducible — float pow()
    would not be), and returns the projection row. The oracle
    replays the identical fold declaratively (list_reduce), proving
    the procedural and declarative forms agree to the bit.

    Scale: the loop iterates over VARIABLES, not data — the only
    cluster work is the one monthly aggregate feeding the two scalar
    subqueries; each loop step is driver-side expression evaluation.
    That is the discipline scripting demands at 100 TB: loops bound
    by the calendar or by scalars, never per-row."""
    from ecowatt_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        BEGIN
          DECLARE first_c BIGINT;
          DECLARE last_c BIGINT;
          DECLARE g_bp BIGINT;
          DECLARE proj_c BIGINT;
          DECLARE k INT DEFAULT 0;
          SET first_c = (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)) * 100)
                        AS BIGINT)
            FROM orders
            WHERE date_trunc('MONTH', o_orderdate) =
                  (SELECT MIN(date_trunc('MONTH', o_orderdate)) FROM orders));
          SET last_c = (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)) * 100)
                        AS BIGINT)
            FROM orders
            WHERE date_trunc('MONTH', o_orderdate) =
                  (SELECT MAX(date_trunc('MONTH', o_orderdate)) FROM orders));
          SET g_bp = last_c * 10000 DIV first_c;
          SET proj_c = last_c;
          WHILE k < 6 DO
            SET proj_c = proj_c * g_bp DIV 10000;
            SET k = k + 1;
          END WHILE;
          SELECT first_c AS first_month_cents,
                 last_c AS last_month_cents,
                 g_bp AS growth_bp,
                 proj_c AS proj_6m_cents;
        END
        """
    )


# ---------------------------------------------------------------------------
# q254 — parameterized SQL (named parameter markers, Spark 4 surface)
# ---------------------------------------------------------------------------
_P_SEGMENT = "BUILDING"
_P_MIN_BAL = 4000.0


@query(
    "q254_parameterized_sql",
    oracle=f"""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS VARCHAR)
                AS DOUBLE) AS total_balance
    FROM customer
    WHERE c_mktsegment = '{_P_SEGMENT}' AND c_acctbal >= {_P_MIN_BAL}
    GROUP BY c_mktsegment
    """,
)
def q254_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARAMETERIZED SQL — named parameter markers bound through
    ``spark.sql(query, args=...)``, the injection-safe templating
    surface (parameters are bound as literals by the PARSER, never
    string-interpolated, so a hostile segment value cannot break out
    of the predicate). The oracle is the same query with the
    parameters inlined, proving marker binding compiles to the
    identical plan/result. Every repeated dashboard/report query at
    scale should run through this surface: stable SQL text means a
    stable plan cache key.

    Scale: surface-only — the bound predicate pushes to the scan like
    any literal (one segment + balance filter, one exact-decimal hash
    aggregate)."""
    from ecowatt_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        SELECT c_mktsegment,
               COUNT(*) AS n_customers,
               CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS STRING)
                    AS DOUBLE) AS total_balance
        FROM customer
        WHERE c_mktsegment = :segment AND c_acctbal >= :min_bal
        GROUP BY c_mktsegment
        """,
        args={"segment": _P_SEGMENT, "min_bal": _P_MIN_BAL},
    )


# ---------------------------------------------------------------------------
# q257 — NULL semantics under the value gate
# ---------------------------------------------------------------------------
@query(
    "q257_null_semantics",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_nationkey,
             NULLIF(c_mktsegment, 'BUILDING') AS seg
      FROM customer
    ),
    pairs AS (
      SELECT seg, SUM(cnt * (cnt - 1) // 2) AS n_pairs
      FROM (
        SELECT c_nationkey, seg, COUNT(*) AS cnt
        FROM c GROUP BY c_nationkey, seg
      )
      GROUP BY seg
    )
    SELECT c.seg,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(COUNT(c.seg) AS BIGINT) AS n_nonnull,
           CAST(COALESCE(p.n_pairs, 0) AS BIGINT) AS n_nullsafe_pairs
    FROM c LEFT JOIN pairs p ON p.seg IS NOT DISTINCT FROM c.seg
    GROUP BY c.seg, p.n_pairs
    """,
)
def q257_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics contract, value-gated — the three rules every
    migrated workload trips over, demonstrated on a derived nullable
    column (segment with one value nulled out):
      1. GROUP BY collects all NULLs into ONE group (the NULL row in
         the output — SQL grouping treats NULL as equal-for-grouping);
      2. COUNT(*) counts rows, COUNT(col) skips NULLs — both reported
         per group so the difference is visible in the NULL row;
      3. ``<=>`` (null-safe equality; IS NOT DISTINCT FROM) MATCHES
         null-to-null where ``=`` would drop the row — the
         n_nullsafe_pairs value lands on the NULL output row only
         because the final join uses the null-safe operator (a plain
         ``=`` left join would leave it NULL → coalesced 0), and the
         pair count itself exists only because GROUP BY collected the
         NULL segment into one group per nation.
    Both engines agree on all three to the row, which is the point: a
    hash match here pins the engine to ANSI null behavior, not an
    implementation accident.

    Scale: the per-(nation, seg) PAIR COUNT is the closed form
    Σ C(cnt, 2) over one grouped aggregate — NOT a materialized
    self-join. The original self-join form was measured fatal at
    100×: groups here scale with the corpus (15M customers / 125
    (nation, seg) groups ≈ 120k rows each → ~9·10¹¹ joined pairs —
    quadratic, 10,000× the sf0.1 volume for 100× the data; the r8
    execution sweep sat on its 2 straggler tasks for 40+ minutes
    before the form was replaced). Counting pairs never requires
    producing them. The null-safe JOIN demonstration lives in the
    final pairs⋈c left join (5 bounded rows against the corpus,
    eqNullSafe key — Spark plans EqualNullSafe as an ordinary hash
    join key, no nested loop)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
    )
    pairs = (
        c.groupBy("c_nationkey", "seg")
        .agg(F.count("*").alias("cnt"))
        .groupBy("seg")
        .agg(
            F.sum(F.expr("cnt * (cnt - 1) DIV 2")).alias("n_pairs")
        )
        # column-renamed, not aliased: pairs shares c's lineage, so a
        # c["seg"]-vs-p.seg join condition is ambiguous to the analyzer
        .select(F.col("seg").alias("p_seg"), "n_pairs")
    )
    return (
        c.join(pairs, c["seg"].eqNullSafe(F.col("p_seg")), "left")
        .groupBy(c["seg"].alias("seg"), F.col("n_pairs"))
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.count(c["seg"]).cast("long").alias("n_nonnull"),
        )
        .select(
            "seg",
            "n_customers",
            "n_nonnull",
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias(
                "n_nullsafe_pairs"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q258 — federated multi-format join (parquet ⋈ JSONL ⋈ ORC)
# ---------------------------------------------------------------------------
@query(
    "q258_federated_join",
    oracle="""
    SELECT r.r_name AS region,
           CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6)))
                     AS VARCHAR) AS DOUBLE) AS total_price
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name
    """,
)
def q258_federated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FEDERATED query across three physical formats in one plan: the
    orders/customer facts stay parquet, the nation dimension is
    served from JSONL and the region dimension from ORC (both
    materialized to scratch from the warehouse tables, standing in
    for the ops-owned JSON feed and the legacy ORC extract every real
    lake has). The engine's claim — and what the oracle hash proves —
    is that STORAGE FORMAT IS NOT SEMANTICS: the four-way join
    aggregates to the same bits regardless of which connector served
    which table, so migrating a dimension between formats can never
    change an answer.

    Scale: the format boundary changes scan economics only — JSONL is
    row-oriented and splittable but unpruned (fine for a 25-row dim,
    wrong for a fact), ORC and parquet both prune and push down. Both
    dims broadcast; the fact joins never shuffle on the dim side;
    one exact-decimal hash aggregate."""
    from ecowatt_etl_spark.operators.bucketing import bucket_token
    from ecowatt_etl_spark.sources.formats import (
        SCRATCH_ROOT,
        read_jsonl,
        write_jsonl,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    root = f"{SCRATCH_ROOT}/{bucket_token(sf_dir)}/federated"
    nation_path, region_path = f"{root}/nation_jsonl", f"{root}/region_orc"
    nation = load_table(spark, sf_dir, "nation")
    write_jsonl(nation, nation_path)
    load_table(spark, sf_dir, "region").write.mode("overwrite").orc(region_path)

    n = read_jsonl(spark, nation_path, nation.schema).select(
        "n_nationkey", "n_regionkey"
    )
    r = spark.read.orc(region_path).select("r_regionkey", "r_name")

    return (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.countDistinct("c_custkey").cast("long").alias("n_customers"),
            F.count("o_orderkey").cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("string")
            .cast("double")
            .alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# q261 — LIVE Avro round-trip (connector-or-pure-Python container codec)
# ---------------------------------------------------------------------------
@query(
    "q261_avro_roundtrip",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) FILTER (WHERE event_id % 7 = 0) AS BIGINT)
             AS n_masked,
           {sql_exact_sum("value", "value_sum")},
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
           CAST(MAX(CAST(ts AS DATE)) AS VARCHAR) AS last_day
    FROM events GROUP BY event_type
    """,
)
def q261_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE Avro round-trip (r6 verdict item 6): events → write_avro →
    read_avro → aggregate, value-hashed against the same aggregate
    over the parquet original, proving the container encode/decode
    lossless for the ingest-edge type set in one driver row: long,
    string (with a union-encoded nullable branch), double, timestamp
    (timestamp-micros logical), and date. On this classpath the sink
    is the pure-Python object-container fallback (sources/avro_py.py);
    with spark-avro deployed the identical query exercises the JVM
    connector — the embedded writer schema makes the files mutually
    readable, which is what the format is for.

    Scale: file-per-write-task with a commit protocol, one read
    partition per container file — the same layout parquet uses; Avro
    is the lake's ROW-oriented interchange edge (Kafka/CDC payloads),
    analytics storage stays columnar."""
    from ecowatt_etl_spark.operators.bucketing import bucket_token
    from ecowatt_etl_spark.sources.formats import (
        SCRATCH_ROOT,
        read_avro,
        write_avro,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        # a genuinely-null union branch so the roundtrip covers it
        F.when(F.col("event_id") % 7 == 0, None)
        .otherwise(F.col("event_type"))
        .alias("masked_type"),
        "event_type",
        "value",
        "ts",
        F.col("ts").cast("date").alias("day"),
    )
    path = f"{SCRATCH_ROOT}/{bucket_token(sf_dir)}/avro_rt"
    write_avro(ev, path)
    back = read_avro(spark, path)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("masked_type").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_masked"),
        exact_sum("value", "value_sum"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        F.max("day").cast("string").alias("last_day"),
    )
