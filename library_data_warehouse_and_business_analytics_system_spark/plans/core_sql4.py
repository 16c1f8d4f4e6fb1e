"""Batch 4 relational coverage: the classic hard TPC-H decorrelation
shapes re-expressed Spark-first, pivot/unpivot round-trip, and the
window value-function surface (FIRST/LAST/NTH_VALUE, LEAD).

The reference's report SQL leans on correlated EXISTS / NOT EXISTS and
scalar-subquery-over-aggregate patterns (LQY_query2.txt's supplier
drill, 02_Trigger.sql:206-212's correlated lookups); these queries gate
the same shapes at adversarial sizes. Where the textbook formulation
self-joins the fact twice (Q21's EXISTS + NOT EXISTS over lineitem),
the Spark plan instead computes one per-order aggregate and derives
both predicates from it — one extra shuffle of the fact instead of two
fact-fact joins, the rewrite you want at 100 TB. The DuckDB oracle
keeps the EXISTS / NOT EXISTS text, so the gate proves the two
algorithms equivalent, not just one implementation self-consistent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def _dec(col: str, p: int = 18, s: int = 4):
    return F.col(col).cast(f"decimal({p},{s})")


_REVENUE_SQL = ("CAST(l_extendedprice AS DECIMAL(18,4))"
                " * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))")


def _revenue_expr():
    return _dec("l_extendedprice") * (F.lit(1).cast("decimal(8,6)")
                                      - F.col("l_discount").cast("decimal(8,6)"))


# ---------------------------------------------------------------------------
# TPC-H Q21 shape — suppliers who alone held up a multi-supplier order.
# "Late" is adapted to this schema (no commit/receipt dates): shipped
# more than 60 days after the order date.


@register(
    "waiting_suppliers",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
    operators=("J1", "J3", "J4", "A1", "O1"),
)
def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 without any fact self-join: lineitem⋈orders is shuffled
    ONCE on the order key, and a window over that partitioning
    computes both per-order counts in place — distinct suppliers and
    distinct LATE suppliers (size(collect_set(...)), nulls dropped). A
    late line l1 qualifies iff the order has >1 supplier and exactly
    one late supplier (then necessarily l1's own) — equivalent to the
    EXISTS + NOT EXISTS the oracle runs, but with one scan and one
    shuffle of the fact instead of three scans and two self-joins.
    The per-order window partitions are bounded by lines-per-order
    (≤7), so the sort is trivially cheap at any scale. supplier is a
    broadcast dim."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    orders = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderstatus") == "F")
              .select("o_orderkey", "o_orderdate"))
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))

    w = Window.partitionBy("l_orderkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn(
            "is_late",
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(F.collect_set(
                F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)))
        .filter(F.col("is_late") & (F.col("n_supp") > 1)
                & (F.col("n_late_supp") == 1))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 shape — top supplier(s) by quarterly revenue: aggregate,
# then keep the rows equal to the aggregate's own maximum.


@register(
    "top_revenue_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey,
             SUM({_REVENUE_SQL}) AS rev_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name,
           CAST(ROUND(rev_dec, 2) AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE rev_dec = (SELECT MAX(rev_dec) FROM revenue)
    ORDER BY s_suppkey
    """,
    operators=("J8", "A1", "P2", "J1"),
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15's create-view-then-max shape: the quarterly revenue
    aggregate is computed once and reused for both the max (a 1-row
    broadcast) and the equality filter — no second scan of lineitem.
    The max comparison happens on the EXACT decimal sum; the double
    cast is last, so ties are decided identically on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
        .groupBy("l_suppkey")
        .agg(F.sum(_revenue_expr()).alias("rev_dec"))
    )
    mx = rev.agg(F.max("rev_dec").alias("mx"))
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        rev.join(F.broadcast(mx), rev.rev_dec == mx.mx)
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name",
                F.round("rev_dec", 2).cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape — large-quantity orders: HAVING over the fact, then
# enrich through orders and customer.


@register(
    "large_quantity_orders",
    """
    SELECT c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS o_date,
           CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,4)), 2) AS DOUBLE)
             AS total_price,
           CAST(ROUND(sum_qty_dec, 2) AS DOUBLE) AS sum_qty
    FROM (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty_dec
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > CAST(250 AS DECIMAL(18,4))
    ) big
    JOIN orders ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY sum_qty DESC, o_orderkey
    """,
    operators=("A1", "J1", "O1", "P2"),
)
def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 with the IN-subquery folded away: the HAVING aggregate IS
    the driving table (it already carries sum_qty), so the big-order
    keys never need a second pass over lineitem. The quantity
    threshold compares exact decimals."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    big = (li.groupBy("l_orderkey")
             .agg(F.sum(_dec("l_quantity")).alias("sum_qty_dec"))
             .filter(F.col("sum_qty_dec") > F.lit(250).cast("decimal(18,4)")))
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "o_orderkey",
                F.col("o_orderdate").cast("date").alias("o_date"),
                F.round(_dec("o_totalprice"), 2).cast("double")
                 .alias("total_price"),
                F.round("sum_qty_dec", 2).cast("double").alias("sum_qty"))
        .orderBy(F.desc("sum_qty"), "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Pivot → UNPIVOT round-trip. The oracle is the plain long-form GROUP
# BY; the Spark plan pivots year×priority wide and stacks it back —
# proving the round-trip lossless (pivot's absent combinations surface
# as NULL counts and are dropped, matching the long form exactly).


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@register(
    "priority_pivot_unpivot",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           o_orderpriority AS priority,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY year(o_orderdate), o_orderpriority
    ORDER BY o_year, priority
    """,
    operators=("A2", "A1", "O1"),
)
def priority_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 both directions: groupBy().pivot(values=...) with the value
    list pinned (no driver-side distinct scan), then stack() back to
    long form. Registered against the long-form oracle so the gate
    fails if either direction loses or invents a combination."""
    orders = load_table(spark, sf_dir, "orders")
    wide = (orders
            .withColumn("o_year", F.year("o_orderdate").cast("int"))
            .groupBy("o_year")
            .pivot("o_orderpriority", _PRIORITIES)
            .count())
    stack_args = ", ".join(f"'{p}', `{p}`" for p in _PRIORITIES)
    return (
        wide.select(
            "o_year",
            F.expr(f"stack({len(_PRIORITIES)}, {stack_args})")
             .alias("priority", "n_orders"))
        .filter(F.col("n_orders").isNotNull())
        .orderBy("o_year", "priority")
    )


# ---------------------------------------------------------------------------
# Window value functions — FIRST_VALUE / LAST_VALUE / NTH_VALUE / LEAD
# over per-customer order history under a strict (date, key) order.


_WINVAL_SQL = """
    SELECT o_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS o_date,
           CAST(o_totalprice AS DOUBLE) AS price,
           CAST(FIRST_VALUE(o_totalprice) OVER (
                  PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS first_price,
           CAST(LAST_VALUE(o_totalprice) OVER (
                  PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                AS DOUBLE) AS last_price,
           CAST(NTH_VALUE(o_totalprice, 2) OVER (
                  PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                AS DOUBLE) AS second_price,
           LEAD(o_orderkey) OVER (
                  PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey) AS next_orderkey
    FROM orders
    WHERE o_custkey % 40 = 0
    ORDER BY o_custkey, o_orderkey
"""


@register("window_value_functions", _WINVAL_SQL,
          operators=("W1", "W2", "O1", "P2"))
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The value-function window surface under one partition spec, so
    Catalyst plans a single Window operator (one shuffle on o_custkey,
    one sort) for all four functions. The values pass through
    untouched doubles — bit-exact with no rounding discipline needed.
    Built with the DataFrame API over an explicit full frame for
    LAST/NTH (the SQL default frame stops at CURRENT ROW, the classic
    LAST_VALUE trap both engines share)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % 40 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)
    return (
        orders.select(
            "o_custkey", "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_date"),
            F.col("o_totalprice").cast("double").alias("price"),
            F.first("o_totalprice").over(w).cast("double")
             .alias("first_price"),
            F.last("o_totalprice").over(w_full).cast("double")
             .alias("last_price"),
            F.nth_value("o_totalprice", 2).over(w_full).cast("double")
             .alias("second_price"),
            F.lead("o_orderkey").over(w).alias("next_orderkey"))
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# §2.8 higher-order array-function surface: transform / filter /
# aggregate / array_contains over per-order quantity arrays, mirrored
# by DuckDB's list_* lambdas. Integer element type keeps every lambda
# bit-exact with no float discipline needed.


@register(
    "array_function_surface",
    """
    WITH qa AS (
      SELECT l_orderkey,
             list(CAST(l_quantity AS INT) ORDER BY l_linenumber) AS qs
      FROM lineitem
      WHERE l_orderkey % 50 = 0
      GROUP BY l_orderkey)
    SELECT l_orderkey,
           len(qs) AS n_items,
           len(list_filter(qs, x -> x >= 30)) AS n_big,
           list_reduce(list_prepend(0, list_transform(qs, x -> x * 2)),
                       (a, b) -> a + b) AS doubled_sum,
           list_contains(qs, 40) AS has_forty
    FROM qa
    ORDER BY l_orderkey
    """,
    operators=("A7", "P1", "A1", "O1"),
)
def array_function_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's higher-order functions (SQL lambdas run JVM-side inside
    codegen — no Python in the loop) against DuckDB's list lambdas.
    The per-order array is assembled in line order via a struct sort,
    the established A7 shape; the %50 filter sits BEFORE the shuffle
    so only sampled orders aggregate."""
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_orderkey") % 50 == 0)
          .select("l_orderkey", "l_linenumber",
                  F.col("l_quantity").cast("int").alias("q")))
    qa = (li.groupBy("l_orderkey")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("l_linenumber", "q"))),
                lambda s: s["q"]).alias("qs")))
    return (
        qa.select(
            "l_orderkey",
            F.size("qs").alias("n_items"),
            F.size(F.filter("qs", lambda x: x >= 30)).alias("n_big"),
            F.aggregate("qs", F.lit(0),
                        lambda acc, x: acc + x * 2).alias("doubled_sum"),
            F.array_contains("qs", 40).alias("has_forty"))
        .orderBy("l_orderkey")
    )


# ---------------------------------------------------------------------------
# Hierarchical traversal (Oracle CONNECT BY PRIOR, engine extension —
# the reference uses CONNECT BY only as a row generator, LQY_query2
# .txt:18). A deterministic forest over part (parent = key div 10,
# keys < 10 are roots) is traversed with level-synchronous joins; the
# oracle is DuckDB's WITH RECURSIVE — two different fixpoint
# algorithms that must produce identical (lvl, root, path) rows.


@register(
    "part_hierarchy_rollup",
    """
    WITH RECURSIVE h AS (
      SELECT p_partkey AS k, p_partkey AS root, 0 AS lvl,
             '/' || CAST(p_partkey AS VARCHAR) AS path
      FROM part WHERE p_partkey < 10
      UNION ALL
      SELECT p.p_partkey, h.root, h.lvl + 1,
             h.path || '/' || CAST(p.p_partkey AS VARCHAR)
      FROM part p JOIN h ON p.p_partkey // 10 = h.k
      WHERE p.p_partkey >= 10)
    SELECT * FROM (
      SELECT k, root, lvl, path,
             COUNT(*) OVER (PARTITION BY root, lvl) AS n_level_nodes
      FROM h) t
    WHERE k % 17 = 0
    ORDER BY k
    """,
    operators=("CONNECT-BY", "J1", "W2", "O1"),
)
def part_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONNECT BY PRIOR with LEVEL, CONNECT_BY_ROOT, and
    SYS_CONNECT_BY_PATH over a 5-level forest (operators/hierarchy
    .py): breadth-first joins shuffle only each frontier, never the
    whole node set per level-row. The %17 probe filter is applied
    AFTER traversal on both engines (a node's ancestors need not
    match), and the per-(root, level) window count is computed over
    the FULL hierarchy before sampling."""
    from ..operators.hierarchy import connect_by_prior

    nodes = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"),
        F.when(F.col("p_partkey") >= 10,
               (F.col("p_partkey") / 10).cast("long")).alias("parent"))
    h = connect_by_prior(nodes, key="k", parent="parent").drop("parent")
    w = Window.partitionBy("root", "lvl")
    return (
        h.withColumn("n_level_nodes", F.count(F.lit(1)).over(w))
        .filter(F.col("k") % 17 == 0)
        .select("k", "root", "lvl", "path", "n_level_nodes")
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# Oracle's KEEP (DENSE_RANK FIRST/LAST) aggregate surface: the value
# of one column at the extreme of another, per group — Spark's
# min_by/max_by, DuckDB's arg_min/arg_max. c_name is unique per
# nation (verified in the data), so the pick is deterministic.


@register(
    "keep_dense_rank_summary",
    """
    SELECT n_name,
           MIN(c_name) AS first_name,
           CAST(arg_min(c_acctbal, c_name) AS DOUBLE) AS first_name_bal,
           MAX(c_name) AS last_name,
           CAST(arg_max(c_acctbal, c_name) AS DOUBLE) AS last_name_bal,
           CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal,
           COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    operators=("A1", "J1", "O1"),
)
def keep_dense_rank_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX(bal) KEEP (DENSE_RANK FIRST ORDER BY name) re-expressed as
    min_by/max_by — a single hash aggregate, no window, no second
    pass. The balance doubles pass through unmodified (bit-exact
    without rounding discipline)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation")
                         .select("n_nationkey", "n_name"))
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.min("c_name").alias("first_name"),
             F.min_by("c_acctbal", "c_name").cast("double")
              .alias("first_name_bal"),
             F.max("c_name").alias("last_name"),
             F.max_by("c_acctbal", "c_name").cast("double")
              .alias("last_name_bal"),
             F.max("c_acctbal").cast("double").alias("max_bal"),
             F.count(F.lit(1)).alias("n_customers"))
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape — "global customers with above-average balance and
# no orders". The average-balance comparison is rewritten multiply-
# style (bal × n_pos > sum_pos) so BOTH engines compare exact
# decimals — a decimal AVG would hit each engine's own
# division-scale rules and drift in the last ulp.


_Q22_CUTOFF = "1998-10-01"


@register(
    "idle_rich_customers",
    f"""
    WITH pos AS (
      SELECT COUNT(*) AS n_pos,
             SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS sum_pos
      FROM customer
      WHERE c_acctbal > CAST(0 AS DOUBLE))
    SELECT CAST(c_nationkey AS INT) AS cntrycode,
           COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS totacctbal
    FROM customer, pos
    WHERE CAST(c_acctbal AS DECIMAL(18,4)) * n_pos > sum_pos
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '{_Q22_CUTOFF} 00:00:00')
    GROUP BY c_nationkey
    ORDER BY cntrycode
    """,
    operators=("J3", "J8", "A1", "P2"),
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 adapted to this data (every customer has SOME order, so
    the lapse predicate is "no order since the cutoff"): the scalar
    average is a 1-row broadcast reused from the same customer scan;
    the lapsed-customer predicate is a LEFT ANTI join against the
    date-filtered orders (the filter pushes into the scan — the anti
    join's build side is recent orders only, not the full fact). The
    threshold compares bal × n_pos against sum_pos in exact decimals
    — a decimal AVG would hit each engine's own division-scale rules
    and drift in the last ulp."""
    cust = load_table(spark, sf_dir, "customer")
    pos = (cust.filter(F.col("c_acctbal") > F.lit(0.0))
           .agg(F.count(F.lit(1)).alias("n_pos"),
                F.sum(_dec("c_acctbal")).alias("sum_pos")))
    recent = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate")
                      >= F.lit(_Q22_CUTOFF).cast("timestamp"))
              .select("o_custkey"))
    return (
        cust.crossJoin(F.broadcast(pos))
        .filter(_dec("c_acctbal") * F.col("n_pos") > F.col("sum_pos"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("int").alias("cntrycode"))
        .agg(F.count(F.lit(1)).alias("numcust"),
             F.round(F.sum(_dec("c_acctbal")), 2).cast("double")
              .alias("totacctbal"))
        .orderBy("cntrycode")
    )


# ---------------------------------------------------------------------------
# TPC-H Q7 shape — volume shipping between two nations: the SAME
# dimension (nation) joined in TWO ROLES (customer's and supplier's),
# with the cross-nation restriction applied pair-wise.


@register(
    "nation_pair_revenue",
    f"""
    SELECT supp_nat, cust_nat, l_year,
           CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM (
      SELECT s.s_nationkey AS supp_nat, c.c_nationkey AS cust_nat,
             CAST(year(l.l_shipdate) AS INT) AS l_year,
             {_REVENUE_SQL.replace('l_extendedprice', 'l.l_extendedprice')
                          .replace('l_discount', 'l.l_discount')} AS rev
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE s.s_nationkey IN (2, 4) AND c.c_nationkey IN (2, 4)
        AND s.s_nationkey <> c.c_nationkey)
    GROUP BY supp_nat, cust_nat, l_year
    ORDER BY supp_nat, cust_nat, l_year
    """,
    operators=("J1", "A1", "P3", "O1"),
)
def nation_pair_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: both nation-role filters push BELOW the fact joins (the
    supplier and customer dims shrink to two nations each before
    touching lineitem), and the dims broadcast — the fact is joined
    twice but shuffled zero times for the dimension edges."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", F.year("l_shipdate").cast("int")
        .alias("l_year"), _revenue_expr().alias("rev"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey")
    cust = F.broadcast(
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(2, 4))
        .select("c_custkey", F.col("c_nationkey").alias("cust_nat")))
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey").isin(2, 4))
        .select("s_suppkey", F.col("s_nationkey").alias("supp_nat")))
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nat") != F.col("cust_nat"))
        .groupBy("supp_nat", "cust_nat", "l_year")
        .agg(F.round(F.sum("rev"), 2).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_lines"))
        .orderBy("supp_nat", "cust_nat", "l_year")
    )


# ---------------------------------------------------------------------------
# TPC-H Q16 shape — supplier coverage per part segment, with an
# excluded-supplier subquery: COUNT(DISTINCT) after an anti-join.


@register(
    "part_supplier_coverage",
    """
    SELECT p_brand, p_size_band,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt,
           COUNT(*) AS n_lines
    FROM (
      SELECT p.p_brand,
             CASE WHEN p.p_size <= 10 THEN 'S'
                  WHEN p.p_size <= 30 THEN 'M' ELSE 'L' END AS p_size_band,
             l.l_suppkey
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier
        WHERE s_acctbal < CAST(0 AS DOUBLE)))
    GROUP BY p_brand, p_size_band
    ORDER BY p_brand, p_size_band
    """,
    operators=("A3", "J3", "J1", "A1", "O1"),
)
def part_supplier_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 with the complaints predicate adapted to this schema
    (excluded suppliers = negative account balance): the NOT IN
    becomes a LEFT ANTI join against the (tiny, broadcast) excluded
    set, then a two-phase COUNT(DISTINCT supplier) per part segment.
    NOT IN's null trap does not arise (s_suppkey is a key), which is
    exactly why the anti-join rewrite is safe."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand",
        F.when(F.col("p_size") <= 10, "S")
         .when(F.col("p_size") <= 30, "M")
         .otherwise("L").alias("p_size_band"))
    excluded = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < F.lit(0.0))
        .select("s_suppkey"))
    return (
        li.join(excluded, li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size_band")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"),
             F.count(F.lit(1)).alias("n_lines"))
        .orderBy("p_brand", "p_size_band")
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape — shipping-priority top-10: segment-filtered
# customers, orders placed before / lines shipped after a date, global
# top-10 by revenue.


@register(
    "shipping_priority_top10",
    f"""
    SELECT l_orderkey,
           CAST(ROUND(SUM({_REVENUE_SQL}), 2) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS o_date,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    operators=("J1", "A1", "O2", "P2"),
)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: the segment filter shrinks customer to ~1/5 BEFORE its
    join (broadcast — it's a dim-sized survivor set), both date
    filters push into the fact scans, and the global top-10 is a
    TakeOrderedAndProject (no full sort of the aggregate). The
    deterministic tie-break (revenue DESC, then key) keeps LIMIT
    stable across engines."""
    cust = F.broadcast(
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey"))
    cutoff = F.lit("1995-03-15").cast("timestamp")
    orders = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate") < cutoff)
              .select("o_orderkey", "o_custkey", "o_orderdate",
                      "o_orderpriority"))
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_shipdate") > cutoff)
          .select("l_orderkey", _revenue_expr().alias("rev")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum("rev"), 2).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue",
                F.col("o_orderdate").cast("date").alias("o_date"),
                "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 shape — local-supplier volume: revenue where the CUSTOMER
# and the SUPPLIER sit in the same nation, rolled up per nation.


@register(
    "local_supplier_volume",
    f"""
    SELECT n_name,
           CAST(ROUND(SUM({_REVENUE_SQL}), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
                 AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    operators=("J1", "A1", "P2", "O1"),
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: the locality predicate (supplier nation = customer nation)
    rides the supplier join as a second equality — never a post-join
    filter over the full nation cross — and both dims broadcast. The
    year restriction pushes into the orders scan."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", _revenue_expr().alias("rev"))
    orders = (load_table(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate")
                       >= F.lit("1996-01-01").cast("timestamp"))
                      & (F.col("o_orderdate")
                         < F.lit("1997-01-01").cast("timestamp")))
              .select("o_orderkey", "o_custkey"))
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    supp = F.broadcast(load_table(spark, sf_dir, "supplier")
                       .select("s_suppkey", "s_nationkey"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation")
                         .select("n_nationkey", "n_name"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey)
                    & (supp.s_nationkey == cust.c_nationkey))
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum("rev"), 2).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_lines"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 shape — returned-item reporting: top-20 customers by
# revenue of RETURNED lines over a quarter.


@register(
    "returned_item_top_customers",
    f"""
    SELECT c_custkey, c_name,
           CAST(ROUND(SUM({_REVENUE_SQL}), 2) AS DOUBLE) AS revenue,
           n_name,
           CAST(c_acctbal AS DOUBLE) AS acctbal
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    operators=("J1", "A1", "P2", "O2"),
)
def returned_item_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: the returnflag and quarter filters push into the fact
    scans (the 'R' lines are ~1/4 of lineitem), nation broadcasts,
    and the top-20 is TakeOrderedAndProject with the (revenue DESC,
    key) tie-break."""
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_returnflag") == "R")
          .select("l_orderkey", _revenue_expr().alias("rev")))
    orders = (load_table(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate")
                       >= F.lit("1995-10-01").cast("timestamp"))
                      & (F.col("o_orderdate")
                         < F.lit("1996-01-01").cast("timestamp")))
              .select("o_orderkey", "o_custkey"))
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey")
    nation = F.broadcast(load_table(spark, sf_dir, "nation")
                         .select("n_nationkey", "n_name"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum("rev"), 2).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name",
                F.col("c_acctbal").cast("double").alias("acctbal"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape — discounted revenue under an OR-of-ANDs (DNF)
# predicate spanning both join sides.


@register(
    "dnf_predicate_revenue",
    f"""
    SELECT COUNT(*) AS n_lines,
           CAST(ROUND(SUM({_REVENUE_SQL}), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= CAST(5 AS DOUBLE)
           AND l_quantity <= CAST(20 AS DOUBLE))
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= CAST(15 AS DOUBLE)
           AND l_quantity <= CAST(35 AS DOUBLE))
       OR (p_brand = 'Brand#33' AND p_size BETWEEN 25 AND 50
           AND l_quantity >= CAST(25 AS DOUBLE)
           AND l_quantity <= CAST(45 AS DOUBLE))
    """,
    operators=("J1", "P2", "A1"),
)
def dnf_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: Catalyst splits the DNF into per-side residuals — the
    part scan gets `brand IN (...) AND size <= 50`-style
    disjunction-derived filters and the lineitem scan gets the
    quantity envelope (5..45), so BOTH scans prune before the join;
    the exact DNF then evaluates post-join. One aggregate row."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", _revenue_expr().alias("rev"))
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    arm = lambda b, s1, s2, q1, q2: (  # noqa: E731
        (F.col("p_brand") == b) & F.col("p_size").between(s1, s2)
        & (q >= F.lit(float(q1))) & (q <= F.lit(float(q2))))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(arm("Brand#11", 1, 15, 5, 20)
                | arm("Brand#22", 10, 30, 15, 35)
                | arm("Brand#33", 25, 50, 25, 45))
        .agg(F.count(F.lit(1)).alias("n_lines"),
             F.round(F.sum("rev"), 2).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 shape — order-priority checking: orders with at least one
# line shipped late, counted per priority (EXISTS → semi-join).


@register(
    "priority_late_order_counts",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 45 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    operators=("J4", "A1", "P2", "O1"),
)
def priority_late_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: the EXISTS becomes a LEFT SEMI join on the order key. The
    correlation compares the line's ship date against the OUTER
    row's order date, so the date condition joins as a second
    (non-equi) predicate on the semi join — not a pre-filter either
    side could apply alone."""
    orders = (load_table(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate")
                       >= F.lit("1996-01-01").cast("timestamp"))
                      & (F.col("o_orderdate")
                         < F.lit("1996-07-01").cast("timestamp")))
              .select("o_orderkey", "o_orderdate", "o_orderpriority"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate
               > orders.o_orderdate + F.expr("INTERVAL 45 DAYS")),
            "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )
