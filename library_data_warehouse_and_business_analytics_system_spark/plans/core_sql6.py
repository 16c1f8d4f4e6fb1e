"""Batch 6 relational coverage: the last two TPC-H query shapes the
registry lacked, adapted to this schema (no partsupp table, so
"supply cost" is the observed per-unit line price).

- Q2's correlated-MIN shape (`min_cost_supplier_parts`): for each
  qualifying part, the region's cheapest supplier — a per-group MIN
  subquery joined back on equality with the outer row.
- Q11's global-scalar HAVING shape (`important_parts_stock`): groups
  kept only when their share of a GLOBAL aggregate clears a
  threshold — the scalar subquery inside HAVING.

With these two, all 22 TPC-H query shapes have oracle-gated rows
(Q8 is `market_share`; the other 19 landed in batches 1-5). The
reference's own SQL reuses both shapes: `LQY_query2.txt` picks each
purchase order's dominant genre by max-over-aggregate join-back, and
its report thresholds are shares of section totals.

Scale posture: Q2's per-(part, supplier) cost aggregate shuffles the
fact once on its own group key; the per-part MIN is an aggregate of
that aggregate (group-cardinality rows), joined back broadcast-free
on the part key. Q11's global total is ONE row crossed back in — a
broadcast nested loop of a 1-row build side, the only legal cartesian
here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register


def _euro_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers in region EUROPE with their nation name — a bounded
    dim chain (supplier ⋈ nation ⋈ region), broadcast at the fact
    join."""
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE")
    return (sup.join(F.broadcast(nat),
                     sup.s_nationkey == nat.n_nationkey)
            .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
            .select("s_suppkey", "s_name", "s_acctbal", "n_name"))


# ---------------------------------------------------------------------------
# TPC-H Q2 shape — minimum-cost supplier per part within a region.


@register(
    "min_cost_supplier_parts",
    """
    WITH euro AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey AND r_name = 'EUROPE'
    ), cost AS (
      SELECT l_partkey, s_suppkey, s_name, s_acctbal, n_name,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem JOIN euro ON s_suppkey = l_suppkey
      GROUP BY l_partkey, s_suppkey, s_name, s_acctbal, n_name
    )
    SELECT s_acctbal, s_name, n_name,
           p_partkey, p_type, c.unit_cost
    FROM part
    JOIN cost c ON c.l_partkey = p_partkey
    WHERE p_type = 'PROMO'
      AND c.unit_cost = (
        SELECT MIN(c2.unit_cost) FROM cost c2
        WHERE c2.l_partkey = p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
    LIMIT 100
    """,
    operators=("J1", "J8", "A1", "O1", "O2"),
)
def min_cost_supplier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: for each PROMO part, the European supplier(s) achieving the
    minimum observed unit cost. The correlated MIN decorrelates into a
    per-part aggregate of the (part, supplier) cost table joined back
    on (part, cost) equality — Catalyst's own rewrite, stated
    explicitly so the per-part MIN is a group-cardinality frame, not a
    window over raw facts. unit_cost is ONE correctly-rounded IEEE
    division and MIN selects (no arithmetic), so the double join-back
    equality and the output hash are engine-portable."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    euro = _euro_suppliers(spark, sf_dir)
    cost = (li.join(F.broadcast(euro),
                    li.l_suppkey == euro.s_suppkey)
            .groupBy("l_partkey", "s_suppkey", "s_name", "s_acctbal",
                     "n_name")
            .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                 .alias("unit_cost")))
    best = cost.groupBy("l_partkey").agg(
        F.min("unit_cost").alias("_best"))
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO").select("p_partkey", "p_type")
    return (cost.join(best, "l_partkey")
            .filter(F.col("unit_cost") == F.col("_best"))
            .join(part, cost.l_partkey == part.p_partkey)
            .select("s_acctbal", "s_name", "n_name", "p_partkey",
                    "p_type", "unit_cost", "s_suppkey")
            .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name",
                     "p_partkey", "s_suppkey")
            .limit(100)
            .drop("s_suppkey"))


# ---------------------------------------------------------------------------
# TPC-H Q11 shape — groups whose share of a global total clears a
# threshold (scalar subquery in HAVING).


@register(
    "important_parts_stock",
    """
    WITH euro_lines AS (
      SELECT l_partkey,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey AND r_name = 'EUROPE'
    ), per_part AS (
      SELECT l_partkey, SUM(cents) AS c, COUNT(*) AS n_lines
      FROM euro_lines GROUP BY l_partkey
    ), tot AS (
      SELECT SUM(c) AS tc, COUNT(*) AS np FROM per_part
    )
    SELECT l_partkey,
           CAST(c AS DOUBLE) / CAST(100 AS DOUBLE) AS part_value,
           n_lines
    FROM per_part, tot
    WHERE c * np * 5 > tc * 6
    ORDER BY part_value DESC, l_partkey
    """,
    operators=("J1", "J8", "A1", "O1"),
)
def important_parts_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11: parts whose European line value exceeds 1.2× the average
    per-part value — the HAVING-against-a-global-scalar shape. The
    threshold is RELATIVE (TPC-H's own Q11 divides its fraction by SF
    for the same reason): a fixed fraction of the total goes
    degenerate as the part count grows — 0.0005 already returned zero
    rows at sf0.1 and would at any larger scale. The per-part
    aggregate shuffles the fact once on l_partkey; the (total, count)
    scalar re-aggregates the group frame and enters as a 1-row
    broadcast cross join. Exactness: money walks as integer CENTS
    (decimal-derived), and the 6/5 multiplier compares as
    c·n_parts·5 > total·6 — pure integer arithmetic, no division, no
    rounding, identical on any engine."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        (F.col("l_extendedprice").cast("decimal(18,2)") * F.lit(100))
        .cast("long").alias("cents"))
    euro = _euro_suppliers(spark, sf_dir).select("s_suppkey")
    lines = li.join(F.broadcast(euro), li.l_suppkey == euro.s_suppkey)
    per_part = (lines.groupBy("l_partkey")
                .agg(F.sum("cents").alias("_c"),
                     F.count(F.lit(1)).alias("n_lines")))
    total = per_part.agg(F.sum("_c").alias("_tc"),
                         F.count(F.lit(1)).alias("_np"))
    return (per_part.join(F.broadcast(total))
            .filter(F.col("_c") * F.col("_np") * F.lit(5)
                    > F.col("_tc") * F.lit(6))
            .select("l_partkey",
                    (F.col("_c").cast("double") / F.lit(100.0))
                    .alias("part_value"),
                    "n_lines")
            .orderBy(F.col("part_value").desc(), "l_partkey"))
