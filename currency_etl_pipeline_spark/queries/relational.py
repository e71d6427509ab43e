"""Relational breadth: aggregation / join / window / set-op surface.

The reference's only real query engine was BigQuery SQL (SURVEY.md §2.F:
"full hash-agg ... come free from Spark; we expose them because 'same
query capabilities' at 100 TB demands them"). These queries exercise
that surface on the TPC-H-ish driver tables.

Scale notes recur per query; the common ones:
- double sums go through DECIMAL (exact ⇒ partition-order independent —
  correctness AND reproducibility at 1000 executors);
- only BOUNDED dims carry explicit broadcast hints (region/nation —
  tens of rows at ANY scale); sf-proportional sides (customer/
  supplier/part/orders) are left to AQE + autoBroadcastJoinThreshold,
  which broadcasts them at test scale and shuffle-joins at 100 TB;
- aggregations are partial+final hash aggs (map-side combine) —
  Catalyst does this for every groupBy here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from currency_etl_pipeline_spark.functions.scalars import dec, ts_str
from currency_etl_pipeline_spark.operators.asof import asof_join
from currency_etl_pipeline_spark.operators.topk import top_k_per_group
from currency_etl_pipeline_spark.queries.registry import query
from currency_etl_pipeline_spark.tables import load_table


@query(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 4) AS sum_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 4) AS sum_base_price,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,3)))) AS DOUBLE), 4) AS sum_disc_price,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,3))) * (1 + CAST(l_tax AS DECIMAL(4,3)))) AS DOUBLE), 4) AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(4,3))) AS DOUBLE) / count(*), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (the implied agg surface, SURVEY.md §2.F): scan →
    pushed filter → partial/final hash agg on 2 low-cardinality keys.
    DECIMAL accumulation makes the sums exact and partition-order-free.

    The output-edge sums are rounded to 4 decimals: the exact DECIMAL
    is identical in both engines, but DuckDB's DECIMAL→DOUBLE cast
    (int128 then /10^scale — two float roundings) can land one ulp off
    the correctly-rounded double on billion-scale sums; rounding well
    above the ulp absorbs it (first seen at sf0.1's A/F sum_charge)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    qty, price = dec("l_quantity"), dec("l_extendedprice")
    disc, tax = dec("l_discount", 4, 3), dec("l_tax", 4, 3)
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(qty).cast("double"), 4).alias("sum_qty"),
        F.round(F.sum(price).cast("double"), 4).alias("sum_base_price"),
        F.round(F.sum(price * (F.lit(1) - disc)).cast("double"), 4).alias("sum_disc_price"),
        F.round(F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax)).cast("double"), 4).alias("sum_charge"),
        F.round(F.sum(qty).cast("double") / n, 6).alias("avg_qty"),
        F.round(F.sum(price).cast("double") / n, 6).alias("avg_price"),
        F.round(F.sum(disc).cast("double") / n, 6).alias("avg_disc"),
        n.alias("count_order"),
    )


@query(
    "pricing_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INT) AS g_rf,
           CAST(grouping(l_linestatus) AS INT) AS g_ls,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def pricing_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (§2.F 'come free from Spark' surface).
    grouping() flags disambiguate NULL key rows from subtotal rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_rf"),
        F.grouping("l_linestatus").cast("int").alias("g_ls"),
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    ).select("l_returnflag", "l_linestatus", "g_rf", "g_ls", "sum_qty", "n_rows")


@query(
    "events_cube",
    oracle="""
    SELECT event_type, user_id,
           CAST(grouping(event_type) AS INT) AS g_et,
           CAST(grouping(user_id) AS INT) AS g_uid,
           count(*) AS n_events,
           CAST(sum(CAST("value" AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY CUBE(event_type, user_id)
    """,
)
def events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over the pair-key dimensions."""
    ev = load_table(spark, sf_dir, "events")
    return ev.cube("event_type", "user_id").agg(
        F.grouping("event_type").cast("int").alias("g_et"),
        F.grouping("user_id").cast("int").alias("g_uid"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value")).cast("double").alias("sum_value"),
    ).select("event_type", "user_id", "g_et", "g_uid", "n_events", "sum_value")


@query(
    "lineitem_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INT) AS g_rf,
           CAST(grouping(l_linestatus) AS INT) AS g_ls,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def lineitem_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via Spark SQL (same Catalyst plan as the DataFrame
    form; SQL surface parity with the reference's BigQuery usage)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_rf,
               CAST(grouping(l_linestatus) AS INT) AS g_ls,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


@query(
    "revenue_by_region",
    oracle="""
    SELECT r.r_name AS region_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,3)))) AS DOUBLE) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY r.r_name
    """,
)
def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: fact ⋈ dims (J4 — the reference's symbols
    lookup, app.py:62-85). nation/region (bounded at ANY scale) carry
    explicit broadcast hints; the customer-derived dim chain is left to
    AQE / autoBroadcastJoinThreshold — it broadcasts at test scale but
    customer is sf-proportional (GBs at real TPC-H scale), so forcing
    it would bypass the threshold and OOM the driver. At 100 TB
    lineitem⋈orders and ⋈customer shuffle on their natural keys."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "r_name")
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).join(dims, orders.o_custkey == dims.c_custkey)
    return joined.groupBy(F.col("r_name").alias("region_name")).agg(
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4, 3))).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


@query(
    "customers_with_orders_semi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
)
def customers_with_orders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join ≡ EXISTS (the MERGE's matched set, SURVEY.md §2.D J3)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "customers_without_orders_anti",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def customers_without_orders_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join ≡ NOT EXISTS (the MERGE's not-matched insert set)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "top3_lineitems_per_returnflag",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber,
           round(l_extendedprice, 6) AS price
    FROM lineitem
    QUALIFY row_number() OVER (
        PARTITION BY l_returnflag
        ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) <= 3
    """,
)
def top3_lineitems_per_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (T1 generalized): one shuffle on the group key,
    rank within partitions — no global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    top = top_k_per_group(
        li, ["l_returnflag"],
        [F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()],
        k=3, descending=False,  # explicit Column ordering above
    )
    return top.select("l_returnflag", "l_orderkey", "l_linenumber", F.round("l_extendedprice", 6).alias("price"))


@query(
    "distinct_parts_per_status",
    oracle="""
    SELECT l_linestatus,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_linestatus
    """,
)
def distinct_parts_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — Catalyst expands to a two-phase aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "pivot_qty_by_linestatus",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_o,
           CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_f
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_qty_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with explicit value list (explicit list avoids the extra
    distinct-values job — required at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = li.groupBy("l_returnflag").pivot("l_linestatus", ["O", "F"]).agg(F.sum(dec("l_quantity")))
    return p.select(
        "l_returnflag",
        F.col("O").cast("double").alias("qty_o"),
        F.col("F").cast("double").alias("qty_f"),
    )


@query(
    "nationkeys_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def nationkeys_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set-op surface, SURVEY.md §2.H)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "nationkeys_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def nationkeys_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set-op surface). subtract() is SQL EXCEPT [DISTINCT];
    exceptAll() would be the multiset variant."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@query(
    "part_string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substr(p_brand, 7) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_masked,
           concat_ws('|', p_brand, p_type) AS brand_type,
           length(p_name) AS name_len,
           regexp_split_to_array(p_name, ' ')[-1] AS last_word,
           split_part(p_name, ' ', 1) AS first_word
    FROM part
    """,
)
def part_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family (F11/F12: formatting, split, concat,
    filename-style parsing — fetch.py:64, transform.py:75-79)."""
    p = load_table(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.expr("substr(p_brand, 7)").alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_masked"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.element_at(words, -1).alias("last_word"),
        F.element_at(words, 1).alias("first_word"),
    )


@query(
    "daily_event_rollup",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST("value" AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
           round(CAST(sum(CAST("value" AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def daily_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregation ("historical trends", README.md:104-110):
    date_trunc day × type. At scale this is the partition-pruned query —
    historical_rates partitioned by date(ts) serves it without a full scan."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value")).cast("double").alias("sum_value"),
        F.round(F.sum(dec("value")).cast("double") / F.count(F.lit(1)), 6).alias("avg_value"),
    )


@query(
    "asof_last_purchase_before_click",
    oracle="""
    SELECT c.event_id, c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_utc,
           p."value" AS last_purchase_value
    FROM events c
    LEFT JOIN events p
      ON p.user_id = c.user_id AND p.event_type = 'purchase'
     AND (p.ts < c.ts OR (p.ts = c.ts AND p.event_id <= c.event_id))
    WHERE c.event_type = 'click'
    QUALIFY row_number() OVER (PARTITION BY c.event_id ORDER BY p.ts DESC, p.event_id DESC) = 1
    """,
)
def asof_last_purchase_before_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward): each click matched to the user's most
    recent purchase value at-or-before it — the reference's implied
    'rate at time t' self-as-of (SURVEY.md §2.D, fetch_transform_load_dag.py:111-148).

    Spark-first: union-tag + last(ignorenulls) over an ordered window —
    ONE shuffle on user_id, no range-join explosion (the oracle's
    inequality join is O(clicks × purchases) per user; this is O(n log n))."""
    ev = load_table(spark, sf_dir, "events")
    quotes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.col("value").alias("__asof_value")
    )
    probes = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    joined = asof_join(probes, quotes, on="user_id", ts_col="ts", value_col="__asof_value", tie_breaker="event_id")
    return joined.select(
        "event_id", "user_id", ts_str("ts").alias("ts_utc"),
        F.col("__asof_value").alias("last_purchase_value"),
    )


@query(
    "asof_next_purchase_after_click",
    oracle="""
    SELECT c.event_id, c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_utc,
           p."value" AS next_purchase_value
    FROM events c
    LEFT JOIN events p
      ON p.user_id = c.user_id AND p.event_type = 'purchase'
     AND (p.ts > c.ts OR (p.ts = c.ts AND p.event_id >= c.event_id))
    WHERE c.event_type = 'click'
    QUALIFY row_number() OVER (PARTITION BY c.event_id ORDER BY p.ts ASC, p.event_id ASC) = 1
    """,
)
def asof_next_purchase_after_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each click matched to the user's next
    purchase value at-or-after it — the attribution-window twin of
    ``asof_last_purchase_before_click`` ("did this click convert, and
    to what amount"), exercising the operator's mirrored direction.

    Same scale argument as the backward form: union-tag +
    first(ignorenulls) over a FOLLOWING frame — ONE shuffle on
    user_id, O(n log n), while the oracle's inequality join is
    O(clicks × purchases) per user and only viable at test scale.
    """
    ev = load_table(spark, sf_dir, "events")
    quotes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.col("value").alias("__asof_value")
    )
    probes = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    joined = asof_join(
        probes, quotes, on="user_id", ts_col="ts", value_col="__asof_value",
        tie_breaker="event_id", direction="forward",
    )
    return joined.select(
        "event_id", "user_id", ts_str("ts").alias("ts_utc"),
        F.col("__asof_value").alias("next_purchase_value"),
    )


@query(
    "customer_order_stats",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment,
           count(*) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_totalprice,
           count(DISTINCT c.c_custkey) AS n_customers
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ dim → agg (EP2's dashboard summary generalized).

    customer is sf-proportional, so it carries NO broadcast hint: AQE /
    autoBroadcastJoinThreshold broadcasts it at test scale and falls
    back to a shuffle join when it is GBs at real scale (an explicit
    hint would bypass the threshold and OOM the driver)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    return j.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(dec("o_totalprice")).cast("double").alias("sum_totalprice"),
        F.countDistinct("c_custkey").alias("n_customers"),
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted: the testdata lacks l_commitdate /
    l_receiptdate, so "late" = shipped >30 days after order): order
    count per priority for one quarter where EXISTS a late line — the
    correlated-EXISTS surface, rewritten as Spark's LEFT SEMI join
    with a non-equi residual.

    Plan: the quarter filter pushes to the orders scan; the semi join
    shuffles on orderkey and short-circuits per match (no row
    multiplication, no dedup needed — exactly why EXISTS compiles to
    semi, not inner); the residual late-predicate evaluates inside the
    join. One final tiny agg by priority.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "tpch_q18_large_volume_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S.%f') AS o_orderdate,
           o.o_totalprice,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
    LIMIT 10
    """,
)
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers behind the highest-volume orders — the
    IN-(grouped-HAVING)-subquery surface, rewritten as an aggregate →
    semi join.

    Plan: ONE partial+final hash agg over lineitem computes each
    order's quantity sum; the HAVING filter keeps the ~0.1% qualifying
    orders, and that aggregate IS the output measure — the SQL shape's
    outer re-aggregation (which would join raw lineitem a second time
    and re-sum the same lines) is eliminated, so lineitem is scanned
    and shuffled exactly once. Orders join the tiny qualifier side
    (AQE picks broadcast); the sf-proportional customer side is
    unhinted (AQE broadcasts it at test scale only), and
    TakeOrderedAndProject caps the output.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity", 18, 2)).alias("q"))
        .filter(F.col("q") > 300)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            ts_str("o_orderdate").alias("o_orderdate"),
            "o_totalprice", F.col("q").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@query(
    "tpch_q22_dormant_customers",
    oracle="""
    WITH thresh AS (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey, count(*) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c, thresh t
    WHERE c.c_acctbal > t.avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY c.c_nationkey
    """,
)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: every testdata customer has SOME
    order, so "dormant" = no order since 2000): per-nation count and
    balance of above-average-balance customers with no recent orders —
    scalar subquery (global average) + NOT EXISTS (anti join) in one
    query.

    Plan: the average is a 1-row exact-DECIMAL aggregate broadcast
    into the filter (scalar subqueries compile to a broadcast cross
    join of one row — no shuffle); the NOT EXISTS is a LEFT ANTI join
    shuffling on custkey with the date filter pushed to the orders
    scan BEFORE the join (anti joins only need the filtered side).
    """
    c = load_table(spark, sf_dir, "customer")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(dec("c_acctbal", 18, 2)).cast("double") / F.count(F.lit(1))).alias("avg_bal"))
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal", 18, 2)).cast("double").alias("totacctbal"),
        )
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE)
               AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND CAST(l.l_quantity AS DECIMAL(18,2))
            * (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
          < CAST(0.2 AS DECIMAL(2,1))
            * (SELECT sum(CAST(l2.l_quantity AS DECIMAL(18,2)))
               FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders of one brand —
    the per-group CORRELATED SCALAR subquery class (``l_quantity <
    0.2 * avg(l_quantity) per part``), the one subquery family the
    catalog lacked (reference's BigQuery surface supports correlated
    scalars directly, app.py:156 is trivially extendable).

    Decorrelation: the correlated scalar becomes per-part WINDOW
    aggregates over the brand-filtered rows. The brand predicate
    restricts which PARTS survive, never which of a surviving part's
    lineitems do — so (sum(qty), count) per part computed after the
    brand-part join is identical to the correlated subquery's
    all-lineitem answer for every surviving part, and lineitem is
    scanned ONCE with only the brand's ~1/25 of rows shuffling to the
    partkey window (the aggregate-then-rejoin form scans lineitem
    twice and aggregates all parts). The comparison is exact DECIMAL
    cross-multiplication (qty*n < 0.2*sum ⟺ qty < 0.2*avg, n>0) so
    both engines agree bit-for-bit regardless of partial-agg order —
    a double `avg` threshold would be partition-order dependent.
    No per-row subquery execution survives — that is the whole point
    of the rewrite.
    """
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    w = Window.partitionBy("l_partkey")
    small = (
        li.join(p, li.l_partkey == F.col("p_partkey"))
        .withColumn("part_qty_sum", F.sum(dec("l_quantity", 18, 2)).over(w))
        .withColumn("part_n", F.count(F.lit(1)).over(w))
        .filter(
            dec("l_quantity", 18, 2) * F.col("part_n")
            < F.lit(0.2).cast("decimal(2,1)") * F.col("part_qty_sum")
        )
    )
    return small.agg(
        (F.sum(dec("l_extendedprice", 18, 2)).cast("double") / F.lit(7.0))
        .cast("double")
        .alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "data_quality_report",
    oracle="""
    SELECT 'quantity_in_range' AS check, CAST(sum(CASE WHEN l_quantity > 0 AND l_quantity <= 60 THEN 0 ELSE 1 END) AS BIGINT) AS n_violations FROM lineitem
    UNION ALL
    SELECT 'discount_in_unit_interval', CAST(sum(CASE WHEN l_discount >= 0 AND l_discount <= 1 THEN 0 ELSE 1 END) AS BIGINT) FROM lineitem
    UNION ALL
    SELECT 'shipdate_not_null', CAST(sum(CASE WHEN l_shipdate IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) FROM lineitem
    UNION ALL
    SELECT 'unique(o_orderkey)', CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'fk(l_orderkey)', CAST(count(*) AS BIGINT) FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'fk(o_custkey)', CAST(count(*) AS BIGINT) FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    """,
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectations over the warehouse star schema
    (operators/validate.py): value-range and null row checks on
    lineitem (ONE shared aggregation pass for all three), orderkey
    uniqueness, and two referential-integrity checks (lineitem→orders,
    orders→customer) as anti-join counts — the publish gate a real
    warehouse runs before exposing a load, expressed as a lazily
    composed (check, n_violations) report. All six checks pass with 0
    violations on the fixture, and the oracle recomputes each check
    independently so a data regression OR a checker bug both surface.
    """
    from currency_etl_pipeline_spark.operators.validate import (
        fk_check,
        quality_report,
        row_checks,
        unique_check,
    )

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rows = row_checks(
        li,
        {
            "quantity_in_range": (F.col("l_quantity") > 0) & (F.col("l_quantity") <= 60),
            "discount_in_unit_interval": (F.col("l_discount") >= 0) & (F.col("l_discount") <= 1),
            "shipdate_not_null": F.col("l_shipdate").isNotNull(),
        },
    )
    return quality_report(
        [
            rows,
            unique_check(o, ["o_orderkey"]),
            fk_check(li, ["l_orderkey"], o, ["o_orderkey"], name="fk(l_orderkey)"),
            fk_check(o, ["o_custkey"], c, ["c_custkey"], name="fk(o_custkey)"),
        ]
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count, INCLUDING
    zero-order customers — the outer-join-with-empty-side aggregation
    class (the anti-join twin `customers_without_orders_anti` returns
    0 rows on this data, so this is the non-vacuous exercise of the
    count-includes-no-match path; the priority filter guarantees a
    zero bucket at sf0.01).

    The join predicate filter (`o_orderpriority <> ...`) must live IN
    the join condition, not a WHERE clause — pushing it to WHERE would
    silently convert the outer join to inner and drop the zero bucket.
    `count(o_orderkey)` (not count(*)) yields 0 for no-match customers
    because the null-extended column doesn't count.

    At 100 TB: orders filter pushes to the scan (it's a join-side
    predicate on the non-preserved side, safe to push); the outer join
    shuffles both sides on custkey; the two aggs are partial+final
    hash aggs, the second over ~|distinct counts| rows. Nothing
    broadcasts — both sides are fact-scale, which is exactly the shape
    AQE handles with skew-join splitting if custkey skews.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "fuzzy_part_name_match",
    oracle="""
    WITH names AS (
        SELECT p_name, split_part(p_name, ' ', 2) AS noun,
               CAST(count(*) AS BIGINT) AS n_parts
        FROM part GROUP BY p_name, split_part(p_name, ' ', 2)
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
    FROM names a JOIN names b
      ON a.noun = b.noun AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def fuzzy_part_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution / record linkage: near-identical part names by
    edit distance — the string-typo member of the dedup family (the
    text/vector members hash shingles and embeddings; this one catches
    'cold anvil' vs 'old anvil', the classic dirty-catalog shape; 24
    organic pairs at sf0.01, no planting).

    Two-stage scale design, in the blocking-key tradition the MinHash
    family uses for documents:
    1. COLLAPSE TO THE NAME DICTIONARY first: group the corpus by
       exact name (64 distinct names over 2 000 parts here; name
       dictionaries follow Zipf, so the dictionary is orders of
       magnitude smaller than the fact table at any scale) carrying
       the per-name cardinality, so the expensive fuzzy stage runs on
       dictionary rows, never corpus rows.
    2. BLOCKED self-join on the last token (the head noun): only
       same-block name pairs pay a levenshtein() call — an equi-join
       Catalyst hash-partitions by block key, vs the quadratic
       all-pairs a naive fuzzy join implies. Misses cross-block typos
       by design (a typo'd HEAD NOUN changes the block) — the
       documented recall/cost trade every blocking scheme makes; a
       second pass blocked on the first token would catch those.

    Levenshtein is the classic Wagner-Fischer distance in both engines
    (integer-exact, no float surface). Output pairs are oriented
    a < b, and carry both sides' part counts so a resolution pass can
    keep the higher-cardinality spelling (dedup_cluster_keepers'
    keep-the-heaviest convention).
    """
    p = load_table(spark, sf_dir, "part")
    names = (
        p.groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .withColumn("noun", F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)))
    )
    a = names.select(
        F.col("p_name").alias("name_a"), F.col("noun"), F.col("n_parts").alias("n_parts_a")
    )
    b = names.select(
        F.col("p_name").alias("name_b"), F.col("noun"), F.col("n_parts").alias("n_parts_b")
    )
    return (
        a.join(b, "noun")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("edit_dist") <= 2)
        .select("name_a", "name_b", "edit_dist", "n_parts_a", "n_parts_b")
    )
