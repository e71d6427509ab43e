"""TPC-H Q2 / Q11 / Q16 / Q20 shapes over a DERIVED partsupp table.

The driver testdata has no partsupp table; SURVEY.md §8 previously
declared these four "out of reach by data". They are not: the
(partkey, suppkey) relation is fully determined by lineitem — every
pair that ever shipped — and the two synthetic measures TPC-H hangs
off it (supply cost, available quantity) only need to be DETERMINISTIC
and engine-identical, not realistic. Both are integer-arithmetic
functions of the pair keys, so Spark and the DuckDB oracle derive the
byte-identical table independently and the four remaining classic
query shapes become testable:

- Q2: correlated min-per-group over a multi-join tree (the one
  decorrelation pattern the catalog lacked alongside Q17's scalar);
- Q11: group aggregate vs a global-scalar-threshold HAVING;
- Q16: count-distinct with a NOT-IN supplier exclusion;
- Q20: nested semi-join chain with a correlated scalar sum.

Reference parity: the reference's ad-hoc surface is BigQuery SQL
(app.py:156-160), which expresses all four directly; SURVEY §2.F's
"same query capabilities" mandate covers them.

Scale: the derivation is one DISTINCT over two lineitem columns — a
shuffle of narrow (bigint, bigint) pairs, ~|partsupp| rows out. At
100 TB you materialize it once (it is static given lineitem) and every
query below reads the materialized table; here each query derives it
inline so the oracle stays a single self-contained statement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from currency_etl_pipeline_spark.functions.scalars import dec
from currency_etl_pipeline_spark.queries.registry import query
from currency_etl_pipeline_spark.tables import load_table

# Synthetic measures: pure integer arithmetic on the pair keys —
# engine-identical by construction (no hash/hex parsing differences).
# availqty ∈ [1, 9999]; supplycost ∈ [1.00, 1000.00) with exactly two
# decimal digits (an integer number of cents divided by 100 — the
# double is within half an ulp of the decimal, so DECIMAL(18,2) casts
# recover it exactly in both engines).
_PARTSUPP_DUCK = """partsupp AS (
        SELECT ps_partkey, ps_suppkey,
               CAST((ps_partkey * 13 + ps_suppkey * 17) % 9999 + 1 AS INT) AS ps_availqty,
               CAST((ps_partkey * 7919 + ps_suppkey * 104729) % 99900 + 100 AS DOUBLE) / 100
                 AS ps_supplycost
        FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
              FROM lineitem)
    )"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of ``_PARTSUPP_DUCK`` — see module docstring."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    return pairs.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 13 + F.col("ps_suppkey") * 17) % 9999 + 1)
        .cast("int")
        .alias("ps_availqty"),
        (
            ((F.col("ps_partkey") * 7919 + F.col("ps_suppkey") * 104729) % 99900 + 100)
            .cast("double")
            / 100
        ).alias("ps_supplycost"),
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH {_PARTSUPP_DUCK},
    eu AS (
        SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_name,
           ps.ps_supplycost
    FROM part p
    JOIN partsupp ps ON ps.ps_partkey = p.p_partkey
    JOIN eu e ON e.s_suppkey = ps.ps_suppkey
    WHERE p.p_size <= 15 AND p.p_type = 'ECONOMY'
      AND ps.ps_supplycost = (
          SELECT min(ps2.ps_supplycost)
          FROM partsupp ps2 JOIN eu e2 ON e2.s_suppkey = ps2.ps_suppkey
          WHERE ps2.ps_partkey = p.p_partkey
      )
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: p_type equality for the '%BRASS'
    suffix match, size band for the equality): for each small ECONOMY
    part, the EUROPE supplier(s) offering it at the region-minimum
    supply cost — the correlated-min-per-group subquery over a
    multi-join tree, the last classic decorrelation pattern the
    catalog lacked.

    Decorrelation (same discipline as Q17): the correlated
    `min(ps_supplycost) WHERE ps_partkey = p.p_partkey` becomes a
    per-partkey WINDOW min over the Europe-filtered partsupp rows —
    ONE pass, one shuffle on ps_partkey, no per-row subquery and no
    aggregate-then-rejoin second scan. The region→nation→supplier
    reduction broadcasts only bounded dims (region, nation);
    supplier/part/partsupp stay unhinted for AQE. The final top-100 is
    TakeOrderedAndProject. The min-equality compares doubles both
    engines computed from identical inputs — bit-identical, no
    rounding needed before the comparison.
    """
    ps = derived_partsupp(spark, sf_dir)
    nations = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_nations = nations.join(
        F.broadcast(region), nations.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    eu = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(eu_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("ps_partkey")
    ps_eu = (
        ps.join(eu, ps.ps_suppkey == eu.s_suppkey)
        .withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 15) & (F.col("p_type") == "ECONOMY"))
        .select("p_partkey", "p_name")
    )
    return (
        ps_eu.join(p, F.col("ps_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "ps_supplycost")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", F.col("p_partkey").asc()
        )
        .limit(100)
    )


@query(
    "tpch_q11_important_stock",
    oracle=f"""
    WITH {_PARTSUPP_DUCK},
    scoped AS (
        SELECT ps.ps_partkey,
               CAST(ps.ps_supplycost AS DECIMAL(18,2)) * ps.ps_availqty AS v
        FROM partsupp ps
        JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_3'
    )
    SELECT ps_partkey,
           round(CAST(sum(v) AS DOUBLE), 4) AS part_value
    FROM scoped
    GROUP BY ps_partkey
    HAVING CAST(sum(v) AS DOUBLE)
           > (SELECT CAST(sum(v) AS DOUBLE) FROM scoped) * 0.001
    ORDER BY part_value DESC, ps_partkey
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose stock value within one nation exceeds a
    fraction of that nation's total stock value — group aggregate
    compared against a GLOBAL-scalar-threshold HAVING, the second
    decorrelation pattern SURVEY §8 listed as missing.

    Plan: the nation-scoped (partkey, value) rows are computed once;
    the per-part aggregate and the global total are two aggregations
    of the same tiny side — the global total is a 1-row aggregate
    broadcast back via crossJoin (scalar subqueries compile to exactly
    this), so no second scan of lineitem and no per-row subquery.
    Value sums accumulate as exact DECIMAL (engine-identical at any
    partition order); the threshold comparison happens on the doubles
    both engines derived from those exact sums, scaled by the same
    literal. Output rounds at the edge per the DECIMAL→DOUBLE rule.
    """
    ps = derived_partsupp(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    scoped = ps.join(supp, ps.ps_suppkey == F.col("s_suppkey")).select(
        "ps_partkey",
        (F.col("ps_supplycost").cast("decimal(18,2)") * F.col("ps_availqty")).alias("v"),
    )
    per_part = scoped.groupBy("ps_partkey").agg(F.sum("v").alias("sv"))
    total = scoped.agg(F.sum("v").cast("double").alias("tv"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("sv").cast("double") > F.col("tv") * 0.001)
        .select(
            "ps_partkey", F.round(F.col("sv").cast("double"), 4).alias("part_value")
        )
        .orderBy(F.col("part_value").desc(), F.col("ps_partkey").asc())
    )


@query(
    "tpch_q16_supplier_cnt",
    oracle=f"""
    WITH {_PARTSUPP_DUCK}
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#21'
      AND p.p_type <> 'MEDIUM'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps.ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: the testdata supplier has no
    s_comment, so the 'Customer Complaints' exclusion becomes
    suppliers in arrears, s_acctbal < 0 — same NOT-IN-subquery
    operator class): distinct supplier counts per (brand, type, size)
    for an 8-size band excluding one brand and one type, minus the
    excluded suppliers.

    Plan: s_suppkey is non-null by construction, so the NOT IN
    compiles to a plain LEFT ANTI join (the null-aware variant would
    need the null-safe expansion); the anti side is the filtered
    supplier key list — bounded small after its filter, left to AQE.
    Part filters push to the part scan (including the IN-list);
    partsupp⋈part shuffles on partkey, then one count-distinct
    aggregate (Catalyst's two-phase expansion). The ORDER BY is a
    full sort of the ~brand×type×size result — hundreds of rows at
    any scale, driver-safe.
    """
    ps = derived_partsupp(spark, sf_dir)
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#21")
            & (F.col("p_type") != "MEDIUM")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        ps.join(bad_supp, ps.ps_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(p, F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q20_promotion_suppliers",
    oracle=f"""
    WITH {_PARTSUPP_DUCK}
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_3', 'NATION_8')
      AND s.s_suppkey IN (
          SELECT ps.ps_suppkey FROM partsupp ps
          WHERE ps.ps_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
          )
          AND ps.ps_availqty > 0.5 * (
              SELECT sum(l.l_quantity) FROM lineitem l
              WHERE l.l_partkey = ps.ps_partkey
                AND l.l_suppkey = ps.ps_suppkey
                AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          )
      )
    ORDER BY s.s_name, n.n_name
    """,
)
def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: p_name LIKE 'red%' for 'forest%',
    two-nation IN for the single-nation equality): suppliers in the
    target nations holding excess stock (availqty > half the year's
    shipped quantity) of red parts — the NESTED semi-join chain
    (supplier IN partsupp IN part) wrapped around a correlated scalar
    sum, the deepest subquery nesting in the TPC-H suite.

    Decorrelation: the correlated per-(partkey, suppkey) quantity sum
    is a plain aggregate of the year-filtered lineitem grouped by the
    pair — computed ONCE for all pairs (no per-row rescan); an INNER
    join back onto partsupp reproduces the SQL semantics exactly
    (an empty correlated sum is NULL, and `x > NULL` excludes the
    row — inner join drops exactly those pairs). The part-name filter
    is a LEFT SEMI join (IN ≡ semi); qualifying suppkeys collapse via
    semi join onto supplier. Every join key is the natural fact key;
    the quantity comparison uses exact DECIMAL sums on both sides.
    """
    ps = derived_partsupp(spark, sf_dir)
    red_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    shipped = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec("l_quantity", 18, 2)).alias("qty"))
    )
    qualifying = (
        ps.join(red_parts, ps.ps_partkey == F.col("p_partkey"), "left_semi")
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(
            F.col("ps_availqty").cast("decimal(18,2)")
            > F.lit(0.5).cast("decimal(2,1)") * F.col("qty")
        )
        .select("ps_suppkey")
    )
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_8")
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name", "n_name")
    )
