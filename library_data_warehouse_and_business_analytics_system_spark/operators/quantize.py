"""Int8 embedding quantization: 4× storage/shuffle reduction for
vector corpora at 100 TB, as pure JVM column expressions.

Symmetric per-vector scheme: ``scale = max|x| / 127``,
``q_i = round(x_i / scale)`` stored as ``array<tinyint>`` + one double
scale. Properties the tests pin:

- reconstruction error per component ≤ scale/2 (round-to-nearest);
- COSINE similarity needs no dequantization at all — the per-vector
  scale cancels: cos(q_a, q_b) over the raw int arrays approximates
  cos(a, b), so ANN pipelines can score int8 directly and only
  dequantize final hits;
- zero vectors quantize to zeros with scale 0 and dequantize to zeros.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_int8(df: DataFrame, vec_col: str,
                  q_col: str = "qvec", scale_col: str = "scale") -> DataFrame:
    """Add ``q_col`` (array<tinyint>) + ``scale_col`` (double)."""
    v = F.col(vec_col)
    amax = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = (amax / F.lit(127.0)).alias(scale_col)
    q = F.when(
        amax > 0,
        F.transform(v, lambda x: F.round(x.cast("double") * 127.0 / amax)
                    .cast("tinyint")),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint")))
    return df.withColumn(q_col, q).withColumn(scale_col, scale)


def dequantize(q: Column, scale: Column) -> Column:
    """array<tinyint> + scale → array<double> reconstruction."""
    return F.transform(q, lambda x: x.cast("double") * scale)


def int8_cosine(qa: Column, qb: Column) -> Column:
    """Cosine directly on int8 arrays (scales cancel). Accumulates in
    double — 64 products of ±127 fit with room to spare.

    Contract: NULL when either vector is all-zero (cosine is undefined
    there) — guarded explicitly so the result is NULL under BOTH ANSI
    and non-ANSI modes instead of a 0/0 that throws with
    ``spark.sql.ansi.enabled`` (ADVICE r5). Mirrors the zero-vector
    handling in :func:`quantize_int8`.
    """
    def dot(a: Column, b: Column) -> Column:
        return F.aggregate(F.zip_with(a, b,
                                      lambda x, y: x.cast("double")
                                      * y.cast("double")),
                           F.lit(0.0), lambda acc, x: acc + x)
    norm = F.sqrt(dot(qa, qa) * dot(qb, qb))
    return F.when(norm > 0, dot(qa, qb) / norm)
