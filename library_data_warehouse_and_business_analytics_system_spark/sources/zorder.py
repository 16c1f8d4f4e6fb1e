"""Z-order (Morton-curve) file layout — multi-column data clustering
so parquet min/max footer stats can SKIP files for predicates on ANY
of the clustered columns, not just the sort-leading one. Delta ships
this as ``OPTIMIZE ... ZORDER BY``; this is the plain-parquet
equivalent: interleave the bits of each column's normalized rank and
range-partition the write on the interleaved key.

Why it works: lexicographic sort clusters only the first column — a
file holds one narrow slice of col A but the FULL range of col B, so
B-predicates skip nothing. The Morton curve's bit interleaving gives
every file a small bounding box in ALL clustered dimensions
(locality of the space-filling curve), shrinking per-file [min, max]
ranges for each column simultaneously — which is exactly what
row-group/file pruning consumes.

Normalization: each column maps to a 16-bit integer position via
uniform binning between its global min/max (one tiny agg; the
width_bucket expression stays JVM-side). Heavily skewed columns
cluster better on their RANK — pre-map such a column (e.g. an ntile
or a percentile bucket computed at write time) and z-order on the
mapped column; uniform is the zero-knowledge default, and the layout
is an OPTIMIZATION ONLY: content is preserved exactly under any
binning.

The result is measurable locally: ``file_bounds`` reads each output
file's parquet footer min/max (no data scan), and the pytest asserts
the mean per-file fractional range of BOTH columns shrinks by >2x vs
a single-column sort layout for the second column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BITS = 16


def _rank16(col: str, lo: float, hi: float):
    """Uniform 16-bit position of ``col`` within [lo, hi]."""
    if hi <= lo:                       # constant column: one cell
        return F.lit(0)
    scaled = ((F.col(col).cast("double") - F.lit(float(lo)))
              / F.lit(float(hi - lo)) * F.lit(float((1 << _BITS) - 1)))
    return F.least(F.lit((1 << _BITS) - 1),
                   F.greatest(F.lit(0), scaled.cast("long")))


def zorder_key(df: DataFrame, cols: list[str]) -> DataFrame:
    """``df`` + a ``_zkey`` column: the Morton interleave of each
    column's 16-bit normalized rank (supports 2-4 columns; one
    driver-side min/max agg, then pure JVM bit arithmetic)."""
    if not 2 <= len(cols) <= 4:
        raise ValueError("zorder_key: needs 2-4 columns")
    row = df.agg(*[f for c in cols
                   for f in (F.min(F.col(c).cast("double")).alias(f"lo_{c}"),
                             F.max(F.col(c).cast("double")).alias(f"hi_{c}"))
                   ]).collect()[0]
    ranks = [_rank16(c, row[f"lo_{c}"], row[f"hi_{c}"]) for c in cols]
    n = len(cols)
    key = F.lit(0).cast("long")
    for bit in range(_BITS):
        for j, r in enumerate(ranks):
            src = F.shiftright(r, bit).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(src.cast("long"), bit * n + j))
    return df.withColumn("_zkey", key)


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   n_files: int = 16) -> None:
    """Write ``df`` as ~``n_files`` parquet files clustered on the
    Morton curve of ``cols`` (range shuffle on the key keeps file
    sizes balanced; the key itself is dropped from the output)."""
    (zorder_key(df, cols)
     .repartitionByRange(n_files, "_zkey")
     .sortWithinPartitions("_zkey")
     .drop("_zkey")
     .write.mode("overwrite").parquet(path))


def file_bounds(path: str, cols: list[str]) -> list[dict]:
    """Per output file: {col: (min, max)} read from parquet FOOTER
    statistics only — the exact information predicate pushdown uses
    to skip files."""
    from pathlib import Path

    import pyarrow.parquet as pq

    out = []
    for f in sorted(Path(path).glob("*.parquet")):
        md = pq.ParquetFile(str(f)).metadata
        mins: dict = {}
        maxs: dict = {}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for i in range(row_group.num_columns):
                c = row_group.column(i)
                name = c.path_in_schema
                if name not in cols or c.statistics is None:
                    continue
                st = c.statistics
                if st.min is not None:
                    mins[name] = (st.min if name not in mins
                                  else min(mins[name], st.min))
                if st.max is not None:
                    maxs[name] = (st.max if name not in maxs
                                  else max(maxs[name], st.max))
        if mins:
            out.append({c: (mins[c], maxs[c]) for c in mins})
    return out
