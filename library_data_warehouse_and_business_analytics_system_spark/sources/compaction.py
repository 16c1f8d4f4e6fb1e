"""Small-file compaction — the OPTIMIZE-style maintenance pass a
100 TB lakehouse table needs after streaming / micro-batch ingestion.

Structured Streaming's file sink (streaming/events.py) and frequent
incremental loads leave partitions fragmented into many tiny parquet
files; every subsequent scan then pays per-file open/footer cost and
the scheduler floods with splits. Compaction rewrites each partition's
files into ~``target_mb`` outputs. Delta/Iceberg ship this as
``OPTIMIZE`` / ``rewrite_data_files``; this is the plain-parquet
equivalent with the same sizing contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _list_parquet_files(spark: SparkSession, path: str) -> tuple[int, int]:
    """(file_count, total_bytes) for ``*.parquet`` under ``path``,
    resolved through the Hadoop FileSystem API so any scheme the
    cluster can read (hdfs://, s3a://, file:/) is sized correctly —
    an ``os.walk`` here would silently see 0 files on object stores
    and make the compactor rewrite everything into one file."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = 0
    n_files = 0
    it = fs.listFiles(jpath, True)  # recursive
    while it.hasNext():
        status = it.next()
        if status.getPath().getName().endswith(".parquet"):
            n_files += 1
            total += status.getLen()
    return n_files, total


def plan_compaction(spark: SparkSession, path: str,
                    target_mb: int = 128) -> dict:
    """Inspect a parquet directory and report fragmentation: file
    count, total bytes, and the output-file count a compaction would
    produce. Driver-side listing only — no data read."""
    n_files, total = _list_parquet_files(spark, path)
    n_out = max(1, -(-total // (target_mb * 1024 * 1024)))  # ceil
    return {"n_files": n_files, "total_bytes": total,
            "target_files": int(n_out),
            "fragmented": n_files > 2 * n_out}


def compact_parquet(spark: SparkSession, path: str, out_path: str,
                    target_mb: int = 128,
                    partition_cols: list[str] | None = None) -> dict:
    """Rewrite ``path`` into ``out_path`` with ~``target_mb`` files.

    Sizing uses the actual on-disk byte count (driver-side listing),
    so the row distribution doesn't matter; ``repartition(n)`` gives n
    ~equal outputs. With ``partition_cols`` the repartition keys on
    them so each Hive partition's files merge without mixing
    partitions (one output wave per partition value set).

    Content is preserved exactly — compaction is a pure layout
    rewrite; the caller atomically swaps directories afterwards (or,
    on Delta/Iceberg, this whole module is `OPTIMIZE`)."""
    stats = plan_compaction(spark, path, target_mb)
    df: DataFrame = spark.read.parquet(path)
    n = stats["target_files"]
    if partition_cols:
        out = df.repartition(n, *[F.col(c) for c in partition_cols])
        (out.write.mode("overwrite").partitionBy(*partition_cols)
            .parquet(out_path))
    else:
        df.repartition(n).write.mode("overwrite").parquet(out_path)
    after = plan_compaction(spark, out_path, target_mb)
    return {"before": stats, "after": after}
