"""Incremental maintenance of JOIN views: signed-delta (counting)
algebra.

operators/incremental_agg.py maintains single-table rollups from a
change feed; this module maintains a materialized EQUI-JOIN between
two tables under inserts AND deletes on either side — the other half
of classic IVM (Gupta & Mumick's counting algorithm), and what a
warehouse needs to keep a wide denormalized view current without
re-joining 100 TB per refresh.

Representation: a materialized view row carries an integer
multiplicity ``_mult`` (multiset semantics — the join of two bags);
a delta row carries ``_sign`` ∈ {+1, −1}. The refresh applies

    Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

with multiplicities multiplied through — the third term corrects the
double count when both sides change in the same batch. Cost is
proportional to |Δ| ⋈ (the join partners of the changed keys), never
|A ⋈ B|: each delta term is an equi-join keyed on the join column, so
only partitions/keys touched by the delta shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SIGN = "_sign"
MULT = "_mult"


def materialize_join_view(a: DataFrame, b: DataFrame,
                          on: str) -> DataFrame:
    """Initial multiset materialization of ``a ⋈ b``: one row per
    distinct output tuple with its multiplicity."""
    cols = _out_cols(a, b, on)
    return (a.join(b, on)
            .groupBy(*cols)
            .agg(F.count(F.lit(1)).cast("long").alias(MULT)))


def refresh_join_view(view: DataFrame, a_old: DataFrame,
                      delta_a: DataFrame | None, b_old: DataFrame,
                      delta_b: DataFrame | None, on: str) -> DataFrame:
    """Apply signed deltas to a materialized join view.

    ``delta_a`` / ``delta_b`` carry the payload columns of their side
    plus ``_sign`` (+1 insert, −1 delete); pass None for an unchanged
    side. Returns the refreshed view (rows with multiplicity 0
    dropped). A delete of a row not present in the base produces a
    negative multiplicity — raised as ValueError rather than silently
    materialized, since it means the delta disagrees with the
    snapshot it claims to follow."""
    cols = _out_cols(a_old, b_old, on)
    terms = []
    if delta_a is not None:
        terms.append(delta_a.join(b_old, on)
                     .select(*cols, F.col(SIGN).alias("_d")))
    if delta_b is not None:
        terms.append(a_old.join(delta_b, on)
                     .select(*cols, F.col(SIGN).alias("_d")))
    if delta_a is not None and delta_b is not None:
        db = delta_b.withColumnRenamed(SIGN, "_sb")
        terms.append(delta_a.join(db, on)
                     .select(*cols,
                             (F.col(SIGN) * F.col("_sb")).alias("_d")))
    if not terms:
        return view
    delta = terms[0]
    for t in terms[1:]:
        delta = delta.unionByName(t)
    dm = delta.groupBy(*cols).agg(F.sum("_d").cast("long").alias("_dm"))
    merged = (
        view.join(dm, cols, "full_outer")
        .select(*cols,
                (F.coalesce(MULT, F.lit(0))
                 + F.coalesce("_dm", F.lit(0))).cast("long").alias(MULT))
    )
    # Contract check INSIDE the plan (raise_error expression): a
    # negative multiplicity fails the job at execution, distributed
    # and single-pass — a driver-side pre-count would execute the
    # whole merge twice.
    checked = F.when(
        F.col(MULT) < 0,
        F.raise_error(F.lit(
            "negative multiplicity: delta deletes a row absent from "
            "the view — the delta does not follow this snapshot"))
        .cast("long"),
    ).otherwise(F.col(MULT))
    return (merged.withColumn(MULT, checked)
            .filter(F.col(MULT) > 0))


def _out_cols(a: DataFrame, b: DataFrame, on: str) -> list[str]:
    payload_b = [c for c in b.columns if c != on and c != SIGN]
    payload_a = [c for c in a.columns if c != SIGN]
    return payload_a + payload_b


def feed_to_delta(feed: DataFrame) -> DataFrame:
    """Adapt a txlog change feed (``tx_diff_parts``'s (op, <row>)
    rows) into this module's signed-delta shape: insert → +1,
    delete → −1. The composition point between the table format's
    CDC and join-view maintenance — an update in the feed is already
    (delete old, insert new), which is exactly the pair of signed
    rows the counting algebra wants."""
    return (feed.withColumn(
        SIGN, F.when(F.col("op") == "insert", 1).otherwise(-1))
        .drop("op"))
