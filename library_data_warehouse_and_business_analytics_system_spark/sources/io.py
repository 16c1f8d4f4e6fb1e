"""Raw-format ingestion: schema-enforced CSV / JSON-lines readers with
corrupt-row quarantine, and the convert-to-parquet step every pipeline
runs before analytics.

The reference ingests via SQL*Plus INSERTs; a Spark warehouse ingests
files. Rules that matter at 100 TB and are encoded here:
- ALWAYS pass an explicit schema (schema inference = an extra full
  scan of the raw data, and a schema that drifts under dirty rows);
- PERMISSIVE mode + a ``_corrupt_record`` column so bad rows are
  quarantined as data, not lost in executor logs (the batch analogue
  of the reference's RAISE_APPLICATION_ERROR validations);
- land raw → parquet/Delta once, query the columnar copy forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields)
                        + [T.StructField(CORRUPT, T.StringType(), True)])


def read_csv(spark: SparkSession, path: str, schema: T.StructType,
             header: bool = True, sep: str = ",") -> tuple[DataFrame, DataFrame]:
    """CSV with explicit schema → (good_rows, quarantined_raw_rows)."""
    df = (
        spark.read.schema(_with_corrupt(schema))
        .option("header", header).option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT)
        .csv(path)
        .cache()  # one pass decides good/bad; don't re-read the raw file
    )
    good = df.filter(F.col(CORRUPT).isNull()).drop(CORRUPT)
    bad = df.filter(F.col(CORRUPT).isNotNull()).select(CORRUPT)
    return good, bad


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType) -> tuple[DataFrame, DataFrame]:
    """JSON-lines with explicit schema → (good, quarantined)."""
    df = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT)
        .json(path)
        .cache()
    )
    good = df.filter(F.col(CORRUPT).isNull()).drop(CORRUPT)
    bad = df.filter(F.col(CORRUPT).isNotNull()).select(CORRUPT)
    return good, bad


def land_to_parquet(df: DataFrame, path: str,
                    partition_by: list[str] | None = None) -> None:
    """Raw → columnar landing write (the one-time cost that buys
    pushdown + pruning for every later query)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_parquet_evolved(spark: SparkSession, path: str,
                         expected: T.StructType | None = None) -> DataFrame:
    """Parquet read across SCHEMA EVOLUTION: batches written before a
    column existed read back with that column NULL, not with a failed
    scan or a silently narrowed schema.

    - ``mergeSchema=true`` unions the per-file footers (the flag is
      off by default because footer merging costs one extra pass over
      file metadata — pay it only on evolved tables, or land the
      canonical schema once via :func:`land_to_parquet`);
    - with ``expected`` given, the result is projected/cast to exactly
      that schema: columns the files never had become typed NULLs,
      extra legacy columns are dropped — so downstream plans see ONE
      stable schema regardless of which file vintage a partition hits.
    """
    df = spark.read.option("mergeSchema", "true").parquet(path)
    if expected is None:
        return df
    cols = []
    for f in expected.fields:
        if f.name in df.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
