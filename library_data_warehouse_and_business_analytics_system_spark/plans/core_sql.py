"""Core relational operator surface (SURVEY.md §2.1-§2.8), expressed
over the driver's TPC-H-ish testdata so every query has a DuckDB
oracle.

Each query re-expresses a capability of the reference warehouse
(file:line cited per query) as an idiomatic Catalyst plan: broadcast
joins for small dimensions, window functions for LAG/top-N, decimal
arithmetic for money. These are the same plan shapes the
library-domain ETL in ``plans/library`` uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

# ---------------------------------------------------------------------------
# helpers


def _dec(col, p: int = 18, s: int = 4):
    """Money path: exact, order-independent decimal aggregation."""
    return F.col(col).cast(f"decimal({p},{s})")


def _dsum(expr):
    """SUM a decimal expression and emit a double that hash-matches the
    oracle: round the exact decimal sum to scale 2 first — a scale-2
    decimal → double conversion is a single correctly-rounded integer
    division in every engine, whereas high-scale conversions differ in
    the last ulp between Spark (BigDecimal) and DuckDB (int128/10^s)."""
    return F.round(F.sum(expr), 2).cast("double")


def _revenue_expr():
    # extendedprice * (1 - discount), computed in decimal so the sum is
    # exact and matches the oracle bit-for-bit after the final double
    # cast. Mirrors the reference's money math ROUND discipline
    # (02_Trigger.sql:452-453).
    return _dec("l_extendedprice") * (F.lit(1).cast("decimal(8,6)")
                                      - F.col("l_discount").cast("decimal(8,6)"))


_REVENUE_SQL = ("CAST(l_extendedprice AS DECIMAL(18,4))"
                " * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))")


# ---------------------------------------------------------------------------
# A1/P2 — hash aggregate with SUM/AVG/COUNT/MIN/MAX under a range filter.
# Reference: fact loads `05_InitialLoading.sql:329-339`; quick-check aggs
# `02_InsertMembers.sql:216-221`.


@register(
    "pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM({_REVENUE_SQL}), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    operators=("A1", "P2", "S1"),
    bench=True,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(_dec("l_quantity")).alias("sum_qty"),
            _dsum(_dec("l_extendedprice")).alias("sum_base_price"),
            _dsum(_revenue_expr()).alias("sum_disc_price"),
            (_dsum(_dec("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
            F.min("l_extendedprice").cast("double").alias("min_price"),
            F.max("l_extendedprice").cast("double").alias("max_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# J1/A1 — multi-way FK→PK equi-join with broadcast dimensions, then agg.
# Reference: FactSales 5-way join `05_InitialLoading.sql:413-434`,
# report join `LQY_query1.txt:46-49`.


@register(
    "revenue_by_nation",
    f"""
    SELECT n_name AS nation, r_name AS region,
           CAST(ROUND(SUM({_REVENUE_SQL}), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS line_count
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
    ORDER BY revenue DESC, nation
    """,
    operators=("J1", "A1", "O1"),
    bench=True,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            _dsum(_revenue_expr()).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy(F.col("revenue").desc(), "nation")
    )


# ---------------------------------------------------------------------------
# W2/O3 — per-group top-N via ROW_NUMBER with deterministic tie-break.
# Reference: `LQY_query1.txt:83-97` (rank genres per year, keep top N),
# `LQY_query2.txt:110-114` (primary genre per PO).


@register(
    "top_customers_per_nation",
    """
    WITH cust_rev AS (
      SELECT n_name AS nation, c_custkey,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_spent
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_name, c_custkey
    ), ranked AS (
      SELECT nation, c_custkey, total_spent,
             ROW_NUMBER() OVER (PARTITION BY nation
                                ORDER BY total_spent DESC, c_custkey) AS rn
      FROM cust_rev
    )
    SELECT nation, c_custkey, total_spent, rn
    FROM ranked WHERE rn <= 3
    ORDER BY nation, rn
    """,
    operators=("W2", "O3", "O4", "J1", "A1"),
    bench=True,
)
def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    cust_rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "c_custkey")
        .agg(_dsum(_dec("o_totalprice")).alias("total_spent"))
    )
    w = Window.partitionBy("nation").orderBy(F.col("total_spent").desc(), "c_custkey")
    return (
        cust_rev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("nation", "rn")
    )


# ---------------------------------------------------------------------------
# W1 — LAG over year partitions for YoY deltas, with the reference's
# widen-then-clip pattern (`LQY_query1.txt:50,96`: scan [from-1, to],
# emit [from, to]).


@register(
    "yoy_nation_revenue",
    """
    WITH yearly AS (
      SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS order_year,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      WHERE EXTRACT(YEAR FROM o_orderdate) BETWEEN 1994 AND 1998
      GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
    ), with_lag AS (
      SELECT nation, order_year, revenue,
             LAG(revenue) OVER (PARTITION BY nation ORDER BY order_year) AS prev_revenue
      FROM yearly
    )
    SELECT nation, order_year, revenue, prev_revenue,
           (100.0 * (revenue - prev_revenue)) / NULLIF(prev_revenue, 0) AS yoy_pct
    FROM with_lag
    WHERE order_year BETWEEN 1995 AND 1998
    ORDER BY nation, order_year
    """,
    operators=("W1", "P2", "P4", "J1"),
    bench=True,
)
def yoy_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    yearly = (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .filter(F.col("order_year").between(1994, 1998))  # widen one year back
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "order_year")
        .agg(_dsum(_dec("o_totalprice")).alias("revenue"))
    )
    w = Window.partitionBy("nation").orderBy("order_year")
    return (
        yearly.withColumn("prev_revenue", F.lag("revenue").over(w))
        .withColumn(
            "yoy_pct",
            # pure double IEEE arithmetic with the oracle's exact
            # parenthesization — no double-rounding (engines disagree
            # on round(double) near ties).
            (F.lit(100.0) * (F.col("revenue") - F.col("prev_revenue")))
            / F.nullif(F.col("prev_revenue"), F.lit(0).cast("double")),
        )
        .filter(F.col("order_year").between(1995, 1998))  # clip back
        .orderBy("nation", "order_year")
    )


# ---------------------------------------------------------------------------
# A2 — conditional aggregation (manual quarter pivot).
# Reference: `LQY_query1.txt:57-60` SUM(CASE WHEN qtr='Q1' ...).


@register(
    "quarterly_pivot",
    """
    SELECT EXTRACT(YEAR FROM o_orderdate) AS order_year,
           CAST(SUM(CASE WHEN EXTRACT(QUARTER FROM o_orderdate) = 1
                         THEN CAST(o_totalprice AS DECIMAL(18,4)) ELSE 0 END) AS DOUBLE) AS q1_amt,
           CAST(SUM(CASE WHEN EXTRACT(QUARTER FROM o_orderdate) = 2
                         THEN CAST(o_totalprice AS DECIMAL(18,4)) ELSE 0 END) AS DOUBLE) AS q2_amt,
           CAST(SUM(CASE WHEN EXTRACT(QUARTER FROM o_orderdate) = 3
                         THEN CAST(o_totalprice AS DECIMAL(18,4)) ELSE 0 END) AS DOUBLE) AS q3_amt,
           CAST(SUM(CASE WHEN EXTRACT(QUARTER FROM o_orderdate) = 4
                         THEN CAST(o_totalprice AS DECIMAL(18,4)) ELSE 0 END) AS DOUBLE) AS q4_amt
    FROM orders
    GROUP BY EXTRACT(YEAR FROM o_orderdate)
    ORDER BY order_year
    """,
    operators=("A2",),
)
def quarterly_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    amt = _dec("o_totalprice")

    def q(n: int):
        return F.sum(F.when(F.quarter("o_orderdate") == n, amt)
                     .otherwise(F.lit(0).cast("decimal(18,4)"))
                     ).cast("double").alias(f"q{n}_amt")

    return (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .groupBy("order_year")
        .agg(q(1), q(2), q(3), q(4))
        .orderBy("order_year")
    )


# ---------------------------------------------------------------------------
# A3/A5 — COUNT(DISTINCT) and multi-level aggregation (agg of agg).
# Reference: `LQY_query2.txt:85-129` (line → PO totals → genre totals).


@register(
    "order_size_distribution",
    """
    WITH order_lines AS (
      SELECT l_orderkey, COUNT(*) AS n_lines,
             COUNT(DISTINCT l_partkey) AS n_parts,
             CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT n_lines, COUNT(*) AS n_orders,
           CAST(SUM(n_parts) AS BIGINT) AS sum_parts,
           CAST(ROUND(SUM(CAST(total_qty AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty
    FROM order_lines
    GROUP BY n_lines
    ORDER BY n_lines
    """,
    operators=("A3", "A5"),
)
def order_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    order_lines = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.countDistinct("l_partkey").alias("n_parts"),
        _dsum(_dec("l_quantity")).alias("total_qty"),
    )
    return (
        order_lines.groupBy("n_lines")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("n_parts").cast("bigint").alias("sum_parts"),
            _dsum(_dec("total_qty")).alias("sum_qty"),
        )
        .orderBy("n_lines")
    )


# ---------------------------------------------------------------------------
# W3/A6 — ratio-to-report (share of total) via window over empty frame.
# Reference: `02_InsertMembers.sql:224-227` RATIO_TO_REPORT.


@register(
    "market_share",
    """
    WITH seg AS (
      SELECT c_mktsegment AS segment,
             ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS revenue_dec
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
    )
    SELECT segment, CAST(revenue_dec AS DOUBLE) AS revenue,
           CAST(revenue_dec AS DOUBLE)
             / CAST(ROUND(SUM(revenue_dec) OVER (), 2) AS DOUBLE) AS share
    FROM seg ORDER BY segment
    """,
    operators=("W3", "A6"),
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    seg = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.round(F.sum(_dec("o_totalprice")), 2).alias("revenue_dec"))
    )
    # share-of-total = x / sum(x) OVER (): single-partition window over a
    # handful of pre-aggregated rows — cheap at any scale because the
    # heavy groupBy already reduced cardinality. The total is summed in
    # decimal (exact, order-independent) before the double division.
    total = F.round(F.sum("revenue_dec").over(Window.partitionBy()), 2).cast("double")
    return (
        seg.withColumn("share", F.col("revenue_dec").cast("double") / total)
        .select("segment", F.col("revenue_dec").cast("double").alias("revenue"), "share")
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# A7 — LISTAGG → array_join(array_sort(collect_list())).
# Reference: `LQY_query2.txt:31`, `LQY_query3.txt:35`.


@register(
    "nation_list_per_region",
    """
    SELECT r_name AS region,
           string_agg(n_name, ', ' ORDER BY n_name) AS nations,
           COUNT(*) AS n_nations
    FROM region JOIN nation ON r_regionkey = n_regionkey
    GROUP BY r_name ORDER BY region
    """,
    operators=("A7",),
)
def nation_list_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return (
        region.join(nation, region.r_regionkey == nation.n_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ", ").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .orderBy("region")
    )


# ---------------------------------------------------------------------------
# A9 — subtotals: SQL*Plus COMPUTE SUM ... ON year → Spark rollup.
# Reference: `LQY_query1.txt:36-37`, `LQY_query2.txt:53-54`.


@register(
    "rollup_year_quarter",
    """
    SELECT EXTRACT(YEAR FROM o_orderdate) AS order_year,
           EXTRACT(QUARTER FROM o_orderdate) AS order_quarter,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (EXTRACT(YEAR FROM o_orderdate),
                     EXTRACT(QUARTER FROM o_orderdate))
    ORDER BY order_year NULLS FIRST, order_quarter NULLS FIRST
    """,
    operators=("A9",),
)
def rollup_year_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .withColumn("order_quarter", F.quarter("o_orderdate"))
        .rollup("order_year", "order_quarter")
        .agg(
            _dsum(_dec("o_totalprice")).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("order_year").asc_nulls_first(),
                 F.col("order_quarter").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# J3 — anti-join (NOT EXISTS dedup/exclusion).
# Reference: `05_InitialLoading.sql:400-406`, `07_SubsequentLoading.sql:42`.


@register(
    "customers_without_orders",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
    operators=("J3",),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# J4 — semi-join (EXISTS).
# Reference: `02_Trigger.sql:78-82`, `LQY_query2.txt:81`.


@register(
    "suppliers_of_large_shipments",
    """
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45)
    ORDER BY s_suppkey
    """,
    operators=("J4", "P2"),
)
def suppliers_of_large_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        sup.join(li.filter(F.col("l_quantity") > 45),
                 sup.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# J2/P4 — left outer join with COALESCE zero-fill.
# Reference: sales-may-lack-discount `05_InitialLoading.sql:429`,
# zero-fill `LQY_query2.txt:146-161`.


@register(
    "nation_customer_counts",
    """
    SELECT n_name AS nation,
           COUNT(c_custkey) AS n_customers,
           CAST(ROUND(COALESCE(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 0), 2) AS DOUBLE) AS total_acctbal
    FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
    GROUP BY n_name ORDER BY nation
    """,
    operators=("J2", "P4", "A1"),
)
def nation_customer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    return (
        nation.join(cust, nation.n_nationkey == cust.c_nationkey, "left")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.coalesce(F.sum(_dec("c_acctbal")), F.lit(0).cast("decimal(18,4)"))
            .cast("double").alias("total_acctbal"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# J5 — cross-join universe + zero-fill (quarter × genre pattern).
# Reference: `LQY_query2.txt:146-161`.


@register(
    "region_status_universe",
    """
    WITH universe AS (
      SELECT r_name AS region, os AS order_status
      FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus AS os FROM orders)
    ), actual AS (
      SELECT r_name AS region, o_orderstatus AS order_status, COUNT(*) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, o_orderstatus
    )
    SELECT u.region, u.order_status, COALESCE(a.n_orders, 0) AS n_orders
    FROM universe u LEFT JOIN actual a
      ON u.region = a.region AND u.order_status = a.order_status
    ORDER BY u.region, u.order_status
    """,
    operators=("J5", "J2", "A4", "P4"),
)
def region_status_universe(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    statuses = orders.select(F.col("o_orderstatus").alias("order_status")).distinct()
    universe = region.select(F.col("r_name").alias("region")).crossJoin(statuses)
    actual = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"),
                 F.col("o_orderstatus").alias("order_status"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        universe.join(actual, ["region", "order_status"], "left")
        .select("region", "order_status",
                F.coalesce("n_orders", F.lit(0)).alias("n_orders"))
        .orderBy("region", "order_status")
    )


# ---------------------------------------------------------------------------
# O1/O2 — global top-k over a sorted relation with tie-break.
# Reference: ROWNUM top-k `08_InsertFines.sql:155-167`.


@register(
    "top_orders_global",
    """
    SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS total_price,
           o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    operators=("O1", "O2", "O4"),
)
def top_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # orderBy().limit(k) compiles to TakeOrderedAndProject — per-partition
    # top-k then a k-row merge on the driver; no global sort shuffle.
    return (
        orders.select("o_orderkey", "o_custkey",
                      F.col("o_totalprice").cast("double").alias("total_price"),
                      "o_orderpriority")
        .orderBy(F.col("total_price").desc(), "o_orderkey")
        .limit(10)
    )
