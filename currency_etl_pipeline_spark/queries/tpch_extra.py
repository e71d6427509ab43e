"""TPC-H breadth, second tranche: Q6 / Q8 / Q9 / Q12 / Q15 / Q19 / Q21
shapes over the driver tables.

These complete the classic ad-hoc query classes the catalog can
express on the available schema. The partsupp-centric four
(Q2/Q11/Q16/Q20) live in ``tpch_partsupp.py`` over a derived
partsupp table. Where the testdata lacks a TPC-H column the
predicate is adapted and the docstring says how.

The reference's only ad-hoc engine was BigQuery SQL (app.py:156,
SURVEY §2.F: "same query capabilities at 100 TB"); each query here is
its Spark-native decorrelated/pushed-down form with an oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from currency_etl_pipeline_spark.functions.scalars import dec
from currency_etl_pipeline_spark.queries.registry import query
from currency_etl_pipeline_spark.tables import load_table


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(4,3))) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue increase from hypothetically eliminating
    small discounts — the pure scan-filter-aggregate class (no join at
    all), which makes it THE predicate-pushdown/columnar benchmark:
    the whole query is one parquet scan reading 4 columns with all
    three filters pushed, one partial+final agg, zero shuffles of data
    (only 1-row partials).

    At 100 TB this is bounded by scan bandwidth alone; with the
    history table partitioned by date (sources/warehouse.py pattern)
    the year predicate prunes partitions before IO.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice", 18, 2) * dec("l_discount", 4, 3))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q12_priority_by_flag",
    oracle="""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def tpch_q12_priority_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: the testdata has no l_shipmode, so
    the grouping key is l_returnflag; no commit/receipt dates, so the
    window is a shipdate year): line counts split by order priority
    class per flag — the conditional-aggregation (pivot-style CASE
    counting) class.

    Plan: shipdate filter pushes to the lineitem scan; one equi-join
    on orderkey (both sides fact-scale → shuffle join, AQE-managed);
    the CASE flags evaluate map-side inside the partial agg, so only
    (flag, 2 counters) partials shuffle. Integer sums are cast BIGINT
    in the oracle per the registry HUGEINT rule.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            # when(~high, 1), NOT when(high, 0).otherwise(1): a NULL
            # priority must count in NEITHER bucket, matching the
            # oracle's CASE WHEN NOT IN (NULL → ELSE 0).
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(4,3)))) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum quarterly revenue — the
    view-plus-global-max class (the reference's "top performer" app
    surface, app.py:161's last-row pick, generalized to a real
    argmax). The revenue CTE is used twice (per-supplier rows AND its
    global max); the max-equality must be computed on the exact
    DECIMAL, not a rounded double, or ties/near-ties flap between
    engines.

    Plan: one partial+final hash agg over the filtered quarter builds
    rev (|supplier| rows); the global max is an empty-frame window
    over those POST-AGGREGATION rows, so lineitem is scanned once —
    the crossJoin-a-recomputed-max form plans the quarter scan + agg
    twice. The single window partition holds |supplier| narrow rows
    (10M × ~24B at SF100k — fine for one task), never lineitem. The
    post-max filter keeps ~1 row, so the supplier join is left to AQE:
    it broadcasts the TINY filtered side (hinting supplier — the big,
    sf-proportional side — would ship GBs to a 1-row probe at scale).
    """
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(dec("l_extendedprice", 18, 2) * (1 - dec("l_discount", 4, 3))).alias(
            "total_revenue"
        )
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.withColumn(
            "max_revenue", F.max("total_revenue").over(Window.partitionBy())
        )
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue")
        )
    )


@query(
    "tpch_q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,3)))) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (adapted: p_container/shipmode absent, so the
    clauses pair brand+size with quantity bands): revenue over an OR
    of three conjunctive clauses mixing both join sides — the
    disjunctive-predicate class that defeats naive pushdown.

    Plan shape that scales: the part-only disjunction (brand+size
    pairs) is FACTORED OUT and pushed to the part scan as a standalone
    pre-filter (Catalyst's OR-factoring does this given the explicit
    filter below), shrinking the build side to 3 brands before the
    join; the mixed part×lineitem residual evaluates inside the join.
    The shrunken part side is still a constant FRACTION of part
    (sf-proportional), so it is unhinted — AQE broadcasts it at test
    scale and shuffle-joins it when it outgrows the threshold.
    """
    b12, b23, b34 = "Brand#12", "Brand#23", "Brand#34"
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    part_pre = (
        ((F.col("p_brand") == b12) & F.col("p_size").between(1, 15))
        | ((F.col("p_brand") == b23) & F.col("p_size").between(1, 25))
        | ((F.col("p_brand") == b34) & F.col("p_size").between(1, 35))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    clause = (
        ((F.col("p_brand") == b12) & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == b23) & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == b34) & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(p.filter(part_pre), F.col("p_partkey") == F.col("l_partkey"))
        .filter(clause)
        .agg(
            F.sum(dec("l_extendedprice", 18, 2) * (1 - dec("l_discount", 4, 3)))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    SELECT year(o.o_orderdate) AS o_year,
           round(
             CAST(sum(CASE WHEN ns.n_name = 'NATION_7'
                           THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                                * (1 - CAST(l.l_discount AS DECIMAL(4,3)))
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(4,3)))) AS DOUBLE),
             6) AS mkt_share
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    JOIN region r   ON nc.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    GROUP BY year(o.o_orderdate)
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of PROMO-part revenue sold into
    ASIA, per year — the deepest join tree in the catalog (lineitem ×
    orders × part × supplier × nation ×2 × customer × region, 8-way)
    with a conditional-share aggregation.

    Plan: the bounded dims (nation ×2, region — tens of rows at ANY
    scale) carry explicit broadcast hints; the customer-derived and
    supplier-derived sides are LEFT TO AQE, which broadcasts them at
    test scale but falls back to shuffle joins when they are GBs at
    real TPC-H scale (forcing them would bypass
    autoBroadcastJoinThreshold and OOM the driver — the same hazard
    the Q10 fix removed). The region filter cascades through
    nation→customer BEFORE the join reaches the fact table, so the
    orders side shrinks ~5× pre-shuffle. Numerator and denominator
    are exact DECIMAL sums; the share divides the two doubles once at
    the edge (deterministic), rounded to 6dp.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    cust_in_region = (
        c.join(
            F.broadcast(
                n.join(r, n.n_regionkey == r.r_regionkey).select(
                    F.col("n_nationkey").alias("cn_key")
                )
            ),
            F.col("c_nationkey") == F.col("cn_key"),
        ).select("c_custkey")
    )
    vol = dec("l_extendedprice", 18, 2) * (1 - dec("l_discount", 4, 3))
    supp_nation = s.join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    joined = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_in_region, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("n_name") == "NATION_7", vol).otherwise(zero)).alias("num"),
            F.sum(vol).alias("den"),
        )
        .select(
            "o_year",
            F.round(F.col("num").cast("double") / F.col("den").cast("double"), 6).alias(
                "mkt_share"
            ),
        )
    )


@query(
    "tpch_q9_product_profit",
    oracle="""
    SELECT ns.n_name AS nation, year(o.o_orderdate) AS o_year,
           round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(4,3)))
                          - CAST(p.p_retailprice AS DECIMAL(18,2))
                            * CAST(l.l_quantity AS DECIMAL(18,2)) * 0.1
                      ) AS DOUBLE), 4) AS sum_profit
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    WHERE p.p_type = 'ECONOMY'
    GROUP BY ns.n_name, year(o.o_orderdate)
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp table, so supply cost is
    modeled as 10% of p_retailprice per unit; the part predicate is a
    type equality instead of name LIKE): profit per supplier nation
    per year — the multi-fact-join + derived-measure aggregation
    class.

    Plan: nation (bounded) is the only hinted broadcast; part (1/6
    after the type filter) and supplier are sf-proportional, so they
    are unhinted — AQE broadcasts them at test scale and falls back to
    shuffle joins at real scale; lineitem×orders is the one guaranteed
    shuffle. The profit
    expression is exact DECIMAL end-to-end (price×(1-disc) −
    retail×qty×0.1), so partial-agg order can't move the result;
    rounded to 4dp at the edge per the high-scale DECIMAL→DOUBLE rule.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount", "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey", "p_retailprice")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = dec("l_extendedprice", 18, 2) * (1 - dec("l_discount", 4, 3)) - dec(
        "p_retailprice", 18, 2
    ) * dec("l_quantity", 18, 2) * F.lit(0.1).cast("decimal(2,1)")
    supp_nation = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit).cast("double"), 4).alias("sum_profit"))
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH lo AS (
        SELECT l.l_orderkey, l.l_suppkey,
               l.l_shipdate > o.o_orderdate + INTERVAL 1500 DAY AS late
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), po AS (
        SELECT l_orderkey,
               count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
        FROM lo GROUP BY l_orderkey
    )
    SELECT s.s_name, count(*) AS numwait
    FROM lo
    JOIN po USING (l_orderkey)
    JOIN supplier s ON s.s_suppkey = lo.l_suppkey
    WHERE lo.late AND po.n_supp > 1 AND po.n_late = 1
    GROUP BY s.s_name
    """,
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: no commit/receipt dates, so "late" =
    shipped >1500 days after order; the status filter is dropped):
    suppliers who were the SOLE late supplier on a multi-supplier
    order — the EXISTS + correlated NOT EXISTS class, the hardest
    subquery pattern in the TPC-H suite.

    Instead of compiling to two correlated semi/anti joins that each
    rescan lineitem (the naive translation), or an order-level
    aggregate REJOINED onto the same rows (which plans the fact join
    twice — 2× the 100 TB scan), the order-level facts are WINDOW
    functions over one hash-partition of the joined rows:
    n_supp = size(collect_set(suppkey)) and n_late =
    size(collect_set(late suppkey)) over (PARTITION BY orderkey).
    EXISTS(other supplier) becomes n_supp > 1, NOT EXISTS(other late
    supplier) becomes n_late = 1 — one lineitem×orders join, ONE
    shuffle on orderkey, zero self-joins; per-order supplier sets are
    small (TPC-H ~7 lines/order) so the window state is bounded. The
    sf-proportional supplier side is unhinted for the final name join —
    AQE broadcasts it at test scale, shuffle-joins it at real scale.
    """
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lo = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 1500 DAYS")).alias(
            "late"
        ),
    )
    w = Window.partitionBy("l_orderkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        lo.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late",
            F.size(F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)),
        )
        .filter(F.col("late") & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
