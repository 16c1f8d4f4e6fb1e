"""Physical warehouse layout: partitioned and bucketed tables.

This is SURVEY.md §4.1 made concrete: facts partitioned by the year
prefix of their date key so BETWEEN-year predicates (LQY_query1.txt:50)
prune files before any I/O, and fact-fact joins bucketed on the join
key so they sort-merge without a shuffle. At 100 TB these two choices
— not query tuning — decide whether a scan reads 4 TB or 100 TB and
whether the daily join moves 100 TB across the network or zero.

Local parquet stands in for Delta/Iceberg; the layout contracts
(partition column derivation, bucket count/key) are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: fact table -> (date column to derive the partition year from)
FACT_PARTITION_KEYS = {
    "orders": "o_orderdate",
    "lineitem": "l_shipdate",
    "events": "ts",
}


def partition_column(table: str) -> str:
    return {"orders": "o_year", "lineitem": "l_year", "events": "ev_year"}[table]


def write_partitioned(df: DataFrame, table: str, out_dir: str) -> str:
    """Write a fact partitioned by derived year (Hive-style layout).

    The partition column is *derived, kept, and co-exists with the
    original date* — queries filter on the year column to prune and on
    the full date for exactness (the widen-then-clip LAG pattern,
    SURVEY.md §4: `cal_year BETWEEN :from-1 AND :to`)."""
    date_col = FACT_PARTITION_KEYS[table]
    ycol = partition_column(table)
    path = f"{out_dir}/{table}"
    (df.withColumn(ycol, F.year(date_col))
       .write.mode("overwrite").partitionBy(ycol).parquet(path))
    return path


def read_partitioned(spark: SparkSession, out_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/{table}")


def write_bucketed_pair(spark: SparkSession, lineitem: DataFrame,
                        orders: DataFrame, out_dir: str,
                        n_buckets: int = 8,
                        suffix: str = "") -> tuple[str, str]:
    """Persist lineitem and orders bucketed+sorted on the order key.

    Both sides hash into the same bucket space, so
    ``lineitem ⋈ orders ON l_orderkey = o_orderkey`` plans as a
    sort-merge join with **zero Exchange** — the shuffle was paid once
    at write time and amortizes over every subsequent join. This is the
    parquet analogue of co-located bucketed Delta tables.
    """
    lt, ot = f"lineitem_b{suffix}", f"orders_b{suffix}"
    for name, df, key in ((lt, lineitem, "l_orderkey"),
                          (ot, orders, "o_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (df.write.bucketBy(n_buckets, key).sortBy(key)
           .option("path", f"{out_dir}/{name}")
           .mode("overwrite").saveAsTable(name))
    return lt, ot


def drop_bucketed_pair(spark: SparkSession, lt: str, ot: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {lt}")
    spark.sql(f"DROP TABLE IF EXISTS {ot}")


def write_corpus_layout(df: DataFrame, out_dir: str,
                        files_per_lang: int = 4,
                        n_langs: int | None = None) -> str:
    """Training-corpus layout: documents partitioned by ``lang`` with
    a bounded file count per partition.

    Why this layout at 100 TB: corpus jobs are overwhelmingly
    per-language (dedup within a language, lang-specific quality
    filters, per-lang token budgets), so `lang=` partition pruning
    turns a 100 TB scan into the 2-20 TB a language actually holds.
    The repartition bounds files per partition (skew in lang sizes
    otherwise yields thousands of small files for the long tail and
    a handful of giants for English — both poisons; see
    sources/compaction.py for healing existing layouts).

    The TOTAL shuffle-partition count scales with the language count
    (``n_langs * files_per_lang``) so write parallelism grows with
    the corpus rather than funnelling every language through
    ``files_per_lang`` tasks (ADVICE r5); the ``(lang, hash-bucket)``
    keys still hold each lang directory to ≤ ``files_per_lang``
    files. ``n_langs`` defaults to a cheap distinct count (pass it
    explicitly when known to skip that job)."""
    if n_langs is None:
        n_langs = df.select("lang").distinct().count()
    path = f"{out_dir}/documents"
    (df.repartition(max(1, n_langs) * files_per_lang, "lang",
                    F.pmod(F.xxhash64("doc_id"), F.lit(files_per_lang)))
       .write.mode("overwrite").partitionBy("lang").parquet(path))
    return path
