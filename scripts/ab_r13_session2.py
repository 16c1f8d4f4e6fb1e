"""Session-2 A/B: old-vs-new collect-compare (and indicative timing)
for the fact_borrowing window rewrite and the scrub per-doc
reassembly. Old implementations are verbatim copies of the pre-edit
HEAD code so both run in ONE process on identical inputs.

Usage: python scripts/ab_r13_session2.py [borrowing|scrubs]...
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark.functions import (  # noqa: E501
    scalars as X,
)
from library_data_warehouse_and_business_analytics_system_spark.functions import (  # noqa: E501
    text as TX,
)
from library_data_warehouse_and_business_analytics_system_spark.session import (  # noqa: E501
    get_spark,
)


def _cmp(name: str, old_df: DataFrame, new_df: DataFrame) -> None:
    t0 = time.perf_counter()
    old_rows = sorted(map(tuple, old_df.collect()))
    t_old = time.perf_counter() - t0
    t0 = time.perf_counter()
    new_rows = sorted(map(tuple, new_df.collect()))
    t_new = time.perf_counter() - t0
    same = old_rows == new_rows
    print(f"{name:28s} rows={len(old_rows)}/{len(new_rows)} "
          f"identical={same} old={t_old:.2f}s new={t_new:.2f}s", flush=True)
    if not same:
        for o, n in zip(old_rows, new_rows):
            if o != n:
                print("  OLD", o)
                print("  NEW", n)
                break
        raise SystemExit(f"{name}: MISMATCH")


# --- old fact_borrowing (HEAD@92c7330) -------------------------------
def old_load_fact_borrowing(borrowed_books, book_copies, dim_date,
                            dim_members, dim_book, as_of):
    base = (
        borrowed_books.filter(F.col("borrowDate").isNotNull())
        .join(book_copies.select("copyId", "bookId"), "copyId")
    )
    metrics = base.groupBy("bookId").agg(
        F.count(F.lit(1)).alias("total_borrowed"),
        F.sum(F.when(F.col("returnStatus") == "Returned", 1).otherwise(0))
        .alias("total_returned"),
    )
    as_of_c = F.lit(as_of)
    overdue = F.coalesce(
        F.when(F.col("returnDate").isNull() & (F.col("dueDate") < as_of_c),
               F.datediff(as_of_c, F.col("dueDate")))
        .when(F.col("returnDate") > F.col("dueDate"),
              F.datediff("returnDate", "dueDate"))
        .otherwise(0), F.lit(0))
    duration = F.coalesce(
        F.when(F.col("returnDate").isNotNull(),
               F.datediff("returnDate", "borrowDate"))
        .otherwise(F.datediff(as_of_c, "borrowDate")), F.lit(0))
    return (
        base.join(metrics, "bookId")
        .join(F.broadcast(dim_date.select("dateKey", "cal_date")),
              base.borrowDate == F.col("cal_date"))
        .join(F.broadcast(dim_members.select("memberKey", "memberId")),
              "memberId")
        .join(F.broadcast(dim_book.select("bookKey", "bookId")), "bookId")
        .select(
            "dateKey", "memberKey", "bookKey",
            overdue.cast("long").alias("overdueDays"),
            duration.cast("long").alias("borrowDuration"),
            F.round(F.lit(100) * F.coalesce("total_returned", F.lit(0))
                    / F.nullif(F.col("total_borrowed"), F.lit(0)), 2)
            .alias("returnRate"),
        )
        .withColumn("_rn", F.row_number().over(
            Window.partitionBy("dateKey", "memberKey", "bookKey")
            .orderBy(F.col("borrowDuration").desc())))
        .filter(F.col("_rn") == 1).drop("_rn")
    )


# --- old scrubs (HEAD@92c7330) ----------------------------------------
def old_duplicated_span_scrub(docs, k=8, id_col="doc_id", text_col="text"):
    from library_data_warehouse_and_business_analytics_system_spark.operators.substring import (  # noqa: E501
        window_hashes,
    )
    toks = TX.tokens(F.lower(F.col(text_col)))
    wh = window_hashes(docs, k, id_col, text_col)
    w_wh = Window.partitionBy("wh")
    covered = (
        wh.withColumn("_shared",
                      F.min("doc_id").over(w_wh) != F.max("doc_id").over(w_wh))
        .filter(F.col("_shared"))
        .select("doc_id",
                F.explode(F.sequence(F.col("start"),
                                     F.col("start") + F.lit(k - 1)))
                .alias("pos"))
        .distinct()
        .withColumn("is_covered", F.lit(True))
    )
    tok_pos = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(toks).alias("pos0", "tok"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    return (
        tok_pos.join(covered, ["doc_id", "pos"], "left_outer")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.coalesce("is_covered", F.lit(False)).cast("int"))
            .cast("bigint").alias("covered_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.when(F.col("is_covered").isNull(),
                               F.struct("pos", "tok")))),
                    lambda s: s["tok"]), " ").alias("kept_text"))
        .withColumn("dup_frac",
                    F.col("covered_tokens").cast("double")
                    / F.col("n_tokens").cast("double"))
        .select("doc_id", "n_tokens", "covered_tokens", "dup_frac",
                "kept_text")
    )


def old_self_repeat_scrub(docs, k=8, id_col="doc_id", text_col="text"):
    from library_data_warehouse_and_business_analytics_system_spark.operators.substring import (  # noqa: E501
        window_hashes,
    )
    toks = TX.tokens(F.lower(F.col(text_col)))
    wh = window_hashes(docs, k, id_col, text_col)
    w = Window.partitionBy("doc_id", "wh")
    repeats = (wh.withColumn("first_start", F.min("start").over(w))
               .filter(F.col("start") > F.col("first_start")))
    covered = (
        repeats.select("doc_id",
                       F.explode(F.sequence(F.col("start"),
                                            F.col("start") + F.lit(k - 1)))
                       .alias("pos"))
        .distinct()
        .withColumn("is_rep", F.lit(True)))
    tok_pos = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(toks).alias("pos0", "tok"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    return (
        tok_pos.join(covered, ["doc_id", "pos"], "left_outer")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.coalesce("is_rep", F.lit(False)).cast("int"))
            .cast("bigint").alias("repeated_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.when(F.col("is_rep").isNull(),
                               F.struct("pos", "tok")))),
                    lambda s: s["tok"]), " ").alias("kept_text"))
        .select("doc_id", "n_tokens", "repeated_tokens", "kept_text")
    )


def main() -> None:
    import os
    what = set(sys.argv[1:]) or {"borrowing", "scrubs"}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_r13_session2")
    spark.sparkContext.setLogLevel("ERROR")

    if "borrowing" in what:
        from library_data_warehouse_and_business_analytics_system_spark.generators.library_data import (  # noqa: E501
            AS_OF, generate,
        )
        from library_data_warehouse_and_business_analytics_system_spark.plans.library.etl import (  # noqa: E501
            build_dim_date, load_dim_book, load_dim_members,
            load_fact_borrowing, screen_oltp,
        )
        oltp = screen_oltp(generate(seed=42, scale=1.0).to_spark(spark))
        dim_date = build_dim_date(spark).localCheckpoint()
        dim_book = load_dim_book(oltp["book_titles"]).localCheckpoint()
        dim_members = load_dim_members(oltp["members"],
                                       AS_OF).localCheckpoint()
        args = (oltp["borrowed_books"], oltp["book_copies"],
                dim_date, dim_members, dim_book, AS_OF)
        _cmp("fact_borrowing scale=1.0",
             old_load_fact_borrowing(*args), load_fact_borrowing(*args))

    if "scrubs" in what:
        from library_data_warehouse_and_business_analytics_system_spark.operators.substring import (  # noqa: E501
            duplicated_span_scrub, self_repeat_scrub,
        )
        from library_data_warehouse_and_business_analytics_system_spark.sources.catalog import (  # noqa: E501
            load_table,
        )
        docs = load_table(spark, sf_dir, "documents")
        _cmp("duplicated_span_scrub sf0.1",
             old_duplicated_span_scrub(docs), duplicated_span_scrub(docs))
        _cmp("self_repeat_scrub sf0.1",
             old_self_repeat_scrub(docs), self_repeat_scrub(docs))


if __name__ == "__main__":
    main()
