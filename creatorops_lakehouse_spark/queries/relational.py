"""Relational query coverage over the TPC-H-style driver tables.

Exercises the full relational operator surface from SURVEY.md §2: scans with
pushed-down predicates (P4-P8), multi-way equi-joins with broadcast dims
(§2.3), hash aggregations (§2.4), ranking windows (§2.5), sorts / top-k /
set ops (§2.6), and rollup (§2.4 note).

Oracle-parity rule: money aggregates go through exact DECIMAL arithmetic,
are materialized as scaled BIGINTs, and any final rounding happens in
integer arithmetic (exact_avg_expr/exact_avg_sql) — double summation order
and round-tie behavior differ between Spark and DuckDB otherwise. Carried
or min/max'ed raw doubles need no rounding (same stored value both sides).

Scale notes: nation/region/supplier (and customer/part at these SFs) are
broadcast joins — no shuffle of the fact table; lineitem⋈orders is the only
shuffle-heavy join and AQE handles its skew. Filters are written directly
against scan columns so Catalyst pushes them into the parquet reader
(verified via explain(): PushedFilters).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from creatorops_lakehouse_spark.queries import exact_avg_expr, exact_avg_sql, load, query

_MONEY = "decimal(12,2)"
_RATE = "decimal(4,2)"


def _dec_revenue() -> F.Column:
    """Exact-decimal l_extendedprice * (1 - l_discount), scale 4."""
    return F.col("l_extendedprice").cast(_MONEY) * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast(_RATE)
    )


_SQL_REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)
#: scaled-integer revenue sum (scale 4 → x10^4)
_SQL_REV_UNITS = f"CAST(SUM({_SQL_REVENUE}) * 10000 AS BIGINT)"
_SQL_REVENUE_L = _SQL_REVENUE.replace("l_extendedprice", "l.l_extendedprice").replace(
    "l_discount", "l.l_discount"
)
_SQL_REV_UNITS_L = f"CAST(SUM({_SQL_REVENUE_L}) * 10000 AS BIGINT)"


def _rev_units() -> F.Column:
    return (F.sum(_dec_revenue()) * 10000).cast("long")


@query(
    "tpch_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(l_quantity) AS BIGINT) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT)
                AS DOUBLE) / 100 AS sum_base_price,
           {exact_avg_sql(_SQL_REV_UNITS, "10000", 2)} AS sum_disc_price,
           {exact_avg_sql(
               f"CAST(SUM({_SQL_REVENUE} * (CAST(1 AS DECIMAL(3,2))"
               " + CAST(l_tax AS DECIMAL(4,2)))) * 1000000 AS BIGINT)",
               "1000000",
               2,
           )} AS sum_charge,
           {exact_avg_sql("CAST(SUM(l_quantity) AS BIGINT)", "COUNT(*)", 4)} AS avg_qty,
           {exact_avg_sql(
               "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT)",
               "100 * COUNT(*)",
               4,
           )} AS avg_price,
           {exact_avg_sql(
               "CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) * 100 AS BIGINT)",
               "100 * COUNT(*)",
               4,
           )} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: pushed-down range filter + wide hash aggregate (A1/A2)."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    charge = _dec_revenue() * (
        F.lit(1).cast("decimal(3,2)") + F.col("l_tax").cast(_RATE)
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("_qty"),
            (F.sum(F.col("l_extendedprice").cast(_MONEY)) * 100)
            .cast("long")
            .alias("_price_cents"),
            _rev_units().alias("_rev_units"),
            (F.sum(charge) * 1000000).cast("long").alias("_charge_micros"),
            (F.sum(F.col("l_discount").cast(_RATE)) * 100).cast("long").alias("_disc_cents"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("_qty").cast("double").alias("sum_qty"),
            (F.col("_price_cents").cast("double") / 100).alias("sum_base_price"),
            exact_avg_expr("_rev_units", "10000", 2).alias("sum_disc_price"),
            exact_avg_expr("_charge_micros", "1000000", 2).alias("sum_charge"),
            exact_avg_expr("_qty", "count_order", 4).alias("avg_qty"),
            exact_avg_expr("_price_cents", "100 * count_order", 4).alias("avg_price"),
            exact_avg_expr("_disc_cents", "100 * count_order", 4).alias("avg_disc"),
            "count_order",
        )
    )


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey AS order_key,
           {exact_avg_sql(_SQL_REV_UNITS_L, "10000", 2)} AS revenue,
           CAST(o.o_orderdate AS DATE) AS order_date,
           o.o_orderpriority AS order_priority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, order_key
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-k (§2.3, §2.6).

    customer is small → broadcast into orders; only lineitem⋈orders
    shuffles. The ORDER BY carries the unique order_key tiebreaker so the
    LIMIT is deterministic on both engines.
    """
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_rev_units().alias("_rev_units"))
        .select(
            F.col("l_orderkey").alias("order_key"),
            exact_avg_expr("_rev_units", "10000", 2).alias("revenue"),
            F.to_date("o_orderdate").alias("order_date"),
            F.col("o_orderpriority").alias("order_priority"),
        )
        .orderBy(F.desc("revenue"), F.asc("order_key"))
        .limit(10)
    )


@query(
    "tpch_q5_region_revenue",
    oracle=f"""
    SELECT n.n_name AS nation,
           {exact_avg_sql(_SQL_REV_UNITS_L, "10000", 2)} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def tpch_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join, dims broadcast, facts shuffle once each.

    nation/region/supplier/customer are broadcast (F.broadcast hint keeps
    the plan stable regardless of statistics); the only big shuffle is
    lineitem⋈orders on orderkey.
    """
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_rev_units().alias("_rev_units"))
        .select(
            F.col("n_name").alias("nation"),
            exact_avg_expr("_rev_units", "10000", 2).alias("revenue"),
        )
    )


@query(
    "top_parts_by_revenue",
    oracle="""
    SELECT p.p_brand AS brand, p.p_type AS part_type,
           COUNT(*) AS n_lineitems,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT)
                AS DOUBLE) / 100 AS total_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size >= 20
    GROUP BY 1, 2
    ORDER BY total_revenue DESC, brand, part_type
    LIMIT 25
    """,
)
def top_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim join + agg + top-k with full tiebreak ordering."""
    p = load(spark, sf_dir, "part").filter(F.col("p_size") >= 20)
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("p_type").alias("part_type"))
        .agg(
            F.count("*").alias("n_lineitems"),
            (F.sum(F.col("l_extendedprice").cast(_MONEY)) * 100)
            .cast("long")
            .alias("_cents"),
        )
        .select(
            "brand",
            "part_type",
            "n_lineitems",
            (F.col("_cents").cast("double") / 100).alias("total_revenue"),
        )
        .orderBy(F.desc("total_revenue"), F.asc("brand"), F.asc("part_type"))
        .limit(25)
    )


@query(
    "customers_without_orders_antijoin",
    oracle=f"""
    SELECT c.c_mktsegment AS mktsegment, COUNT(*) AS n_customers,
           {exact_avg_sql(
               "CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) * 100 AS BIGINT)",
               "100 * COUNT(*)",
               4,
           )} AS avg_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 400000)
    GROUP BY 1
    """,
)
def customers_without_orders_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (documented dedup 'new vs existing keys' class, §2.3).

    Parity: runbooks/silver-transform.md:114-122 MERGE-new-keys semantics.
    acctbal can be negative — exact_avg handles sign (half-away-from-zero).
    """
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_custkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count("*").alias("n_customers"),
            (F.sum(F.col("c_acctbal").cast(_MONEY)) * 100).cast("long").alias("_cents"),
        )
        .select(
            "mktsegment",
            "n_customers",
            exact_avg_expr("_cents", "100 * n_customers", 4).alias("avg_acctbal"),
        )
    )


@query(
    "customers_with_orders_semijoin",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderstatus = 'F')
    GROUP BY 1
    """,
)
def customers_with_orders_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (existence test without duplication)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "nation_rollup_order_stats",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
                AS DOUBLE) / 100 AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def nation_rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup over (region, nation) — §2.4 extension.

    Rollup is a single shuffle in Spark (grouping-set expansion map-side).
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            "o_totalprice",
        )
        .rollup("region", "nation")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(F.col("o_totalprice").cast(_MONEY)) * 100).cast("long").alias("_cents"),
        )
        .select(
            "region",
            "nation",
            "n_orders",
            (F.col("_cents").cast("double") / 100).alias("total_price"),
        )
    )


@query(
    "orders_rank_topk_per_customer",
    oracle="""
    WITH ranked AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    )
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           o_totalprice AS totalprice, rn AS order_rank
    FROM ranked WHERE rn <= 3
    """,
)
def orders_rank_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ranking window (§2.5 row_number class).

    At scale this is the shuffle-once pattern for 'top N per key' — no
    global sort, no driver collect. Carried-through doubles need no
    rounding (same stored value on both engines).
    """
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            F.col("rn").alias("order_rank"),
        )
    )


@query(
    "part_type_setops",
    oracle="""
    SELECT p_brand AS brand FROM part WHERE p_type LIKE '%BRASS%'
    UNION
    SELECT p_brand FROM part WHERE p_size < 10
    EXCEPT
    SELECT p_brand FROM part WHERE p_retailprice > 1900
    """,
)
def part_type_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: UNION (distinct) then EXCEPT (§2.6) + LIKE predicate."""
    p = load(spark, sf_dir, "part")
    brass = p.filter(F.col("p_type").like("%BRASS%")).select(F.col("p_brand").alias("brand"))
    small = p.filter(F.col("p_size") < 10).select(F.col("p_brand").alias("brand"))
    pricey = p.filter(F.col("p_retailprice") > 1900).select(F.col("p_brand").alias("brand"))
    return brass.union(small).distinct().exceptAll(pricey.distinct())


@query(
    "order_priority_case_when",
    oracle="""
    SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
                ELSE 'low' END AS priority_class,
           o_orderstatus AS orderstatus,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
                AS DOUBLE) / 100 AS total_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY 1, 2
    """,
)
def order_priority_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-branch when/otherwise as a grouping key (F12 class).

    MIN/MAX select existing stored doubles — no arithmetic, no rounding
    needed.
    """
    priority = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "medium")
        .otherwise("low")
    )
    return (
        load(spark, sf_dir, "orders")
        .groupBy(
            priority.alias("priority_class"),
            F.col("o_orderstatus").alias("orderstatus"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(F.col("o_totalprice").cast(_MONEY)) * 100).cast("long").alias("_cents"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .select(
            "priority_class",
            "orderstatus",
            "n_orders",
            (F.col("_cents").cast("double") / 100).alias("total_price"),
            "min_price",
            "max_price",
        )
    )


@query(
    "tpch_q10_returned_revenue",
    oracle=f"""
    SELECT c.c_custkey AS custkey, c.c_name AS cust_name, n.n_name AS nation,
           {exact_avg_sql(_SQL_REV_UNITS_L, "10000", 2)} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: 4-way join on returned items + revenue top-k."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("cust_name"),
            F.col("n_name").alias("nation"),
        )
        .agg(_rev_units().alias("_rev_units"))
        .select(
            "custkey",
            "cust_name",
            "nation",
            exact_avg_expr("_rev_units", "10000", 2).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(20)
    )


@query(
    "tpch_q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand AS brand, p.p_size AS part_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_size IN (9, 14, 19, 23, 36, 45, 49, 3)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2
    """,
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN anti-join + grouped DISTINCT aggregation
    (two-phase distinct expansion in Spark)."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & F.col("p_size").isin(9, 14, 19, 23, 36, 45, 49, 3)
    )
    bad_suppliers = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = load(spark, sf_dir, "lineitem").join(
        F.broadcast(bad_suppliers),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_anti",
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("p_size").alias("part_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c.c_name AS cust_name, o.o_orderkey AS orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           o.o_totalprice AS totalprice,
           CAST(CAST(SUM(l.l_quantity) AS BIGINT) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 150
    )
    GROUP BY 1, 2, 3, 4
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery over a HAVING aggregate → semi-join of
    facts against a pre-aggregated key set."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    o = load(spark, sf_dir, "orders").join(
        big.withColumnRenamed("l_orderkey", "bk"),
        F.col("o_orderkey") == F.col("bk"),
        "left_semi",
    )
    c = load(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_name").alias("cust_name"),
            F.col("o_orderkey").alias("orderkey"),
            F.to_date("o_orderdate").alias("order_date"),
            F.col("o_totalprice").alias("totalprice"),
        )
        .agg(F.sum("l_quantity").cast("long").cast("double").alias("total_qty"))
    )


@query(
    "tpch_q7_nation_trade_volume",
    oracle=f"""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
           {exact_avg_sql(_SQL_REV_UNITS_L, "10000", 2)} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    WHERE ((ns.n_name = 'NATION_18' AND nc.n_name = 'NATION_19')
        OR (ns.n_name = 'NATION_19' AND nc.n_name = 'NATION_18'))
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations, by year):
    the directional nation-pair predicate ((A→B) OR (B→A)) over a 5-way
    join. Both nation dims and supplier/customer broadcast; lineitem⋈
    orders on orderkey is the only big shuffle — the nation-pair filter
    applies BEFORE the group-by, so only matching rows aggregate.
    (Reference scope: SURVEY §2.3/§2.4 multi-way equi-join + grouped agg;
    this adds the classic disjunctive join predicate shape.)"""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_18") & (F.col("cust_nation") == "NATION_19")
    ) | ((F.col("supp_nation") == "NATION_19") & (F.col("cust_nation") == "NATION_18"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(_rev_units().alias("_rev_units"))
        .select(
            "supp_nation",
            "cust_nation",
            "ship_year",
            exact_avg_expr("_rev_units", "10000", 2).alias("revenue"),
        )
    )


@query(
    "tpch_q14_promo_revenue_share",
    oracle=f"""
    SELECT {exact_avg_sql(
        "CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN "
        + _SQL_REVENUE_L + " ELSE CAST(0 AS DECIMAL(18,4)) END) * 1000000 AS BIGINT)",
        _SQL_REV_UNITS_L,
        4,
    )} AS promo_share_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def tpch_q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion revenue share for one ship month):
    conditional aggregate over a fact⋈dim join — part broadcasts, the
    shipdate range prunes lineitem at the scan, and the percentage is
    computed in exact scaled-integer arithmetic: promo revenue ×10^6 over
    total revenue ×10^4 (both exact integers for scale-4 decimals), so
    num/den = 100·promo/total — a TRUE 4-decimal percentage, identical in
    both engines (the exact_avg pattern for ratios of money sums)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _dec_revenue()).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    agg = joined.agg(
        (F.sum(promo) * 1_000_000).cast("long").alias("_promo_units"),
        (F.sum(_dec_revenue()) * 10_000).cast("long").alias("_total_units"),
    )
    return agg.select(
        exact_avg_expr("_promo_units", "_total_units", 4).alias("promo_share_pct")
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)
               AS revenue_units
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecast revenue change): pure scan-side filter
    conjunction — every predicate (shipdate range, discount band,
    quantity cap) pushes into the parquet scan, then one ungrouped
    decimal sum. The discount band compares EXACT decimals (doubles like
    0.07 would make a boundary row engine-dependent); the sum is emitted
    as scale-4 integer units, hash-identical in both engines."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").cast("decimal(4,2)").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * F.col("l_discount").cast(
        "decimal(4,2)"
    )
    return li.agg((F.sum(rev) * 10000).cast("long").alias("revenue_units"))


@query(
    "lineitem_bloom_semi_verdict",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_match,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS qty_centisum,
           TRUE AS parity_ok
    FROM lineitem l
    WHERE EXISTS (
        SELECT 1 FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE s.s_suppkey = l.l_suppkey AND n.n_name = 'NATION_1'
    )
    """,
)
def lineitem_bloom_semi_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pre-filtered semi-join parity contract (operators/bloom.py):
    lineitems of NATION_1 suppliers via bloom_semi_join must equal the
    plain left-semi join row-for-row — the oracle recomputes the match
    count and exact centiquantity mass in SQL and pins parity TRUE. The
    bloom route probes a broadcast (word, bits) bitset with k=4 hash
    lookups and filters BEFORE any join machinery touches the fact rows
    (false positives removed by the final exact semi-join; false
    negatives impossible) — the explicit form of AQE's runtime bloom
    filter, usable in any plan shape."""
    from creatorops_lakehouse_spark.operators.bloom import bloom_semi_join

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    sel = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    via_bloom = bloom_semi_join(li, sel, on="l_suppkey", m_bits=1 << 16)
    plain = li.join(sel, "l_suppkey", "left_semi")
    cents = F.round(F.col("l_quantity") * 100).cast("long")
    a = via_bloom.agg(
        F.count(F.lit(1)).cast("long").alias("n_match"),
        F.sum(cents).cast("long").alias("qty_centisum"),
    )
    b = plain.agg(
        F.count(F.lit(1)).cast("long").alias("_n_plain"),
        F.sum(cents).cast("long").alias("_c_plain"),
    )
    return a.crossJoin(F.broadcast(b)).select(
        "n_match",
        "qty_centisum",
        (
            (F.col("n_match") == F.col("_n_plain"))
            & (F.col("qty_centisum").eqNullSafe(F.col("_c_plain")))
        ).alias("parity_ok"),
    )
