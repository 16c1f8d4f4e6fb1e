"""Temperature-weighted data mixing: allocate a global token budget
across sources with sampling weights ∝ (source tokens)^alpha — the
standard multi-source training-data recipe (alpha < 1 flattens the
mixture, upsampling tail sources relative to their raw share), then
select documents per source in deterministic content-hash order until
each source's budget is spent.

Scale shape: the weight computation is one tiny per-source aggregate
(two-phase) crossed with a broadcast scalar denominator; document
selection is a per-source running sum over (hash, id, n_tokens)
triples — no global window, no shuffle of text. Determinism: the
selection order is a salted md5 over the document id, so the sample
is reproducible across runs, engines, and partitionings (the same
contract as stratified_doc_sample / doc_hash_split).

alpha = 0.5 evaluates via IEEE sqrt (bit-identical across engines,
which the driver gate's DuckDB differential relies on); other alphas
go through pow, whose last-ulp behavior may differ between libm
implementations — fine for production sampling, not for a bit-exact
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TX


def temperature_mixture(docs: DataFrame, total_budget: int,
                        alpha: float = 0.5, text_col: str = "text",
                        id_col: str = "doc_id", source_col: str = "source",
                        salt: str = "mix:") -> DataFrame:
    """Returns ``(id_col, source_col, n_tokens, src_budget, kept)``:
    every document annotated with its source's temperature-allocated
    token budget and whether it falls inside it."""
    toks = docs.select(
        F.col(id_col), F.col(source_col),
        TX.token_count(F.col(text_col)).cast("long").alias("n_tokens"))
    weight = (F.sqrt(F.col("src_tokens")) if alpha == 0.5
              else F.pow("src_tokens", F.lit(alpha)))
    src = (toks.groupBy(source_col)
           .agg(F.sum("n_tokens").alias("src_tokens"))
           .withColumn("w", weight))
    denom = src.agg(F.sum("w").alias("d"))
    budgets = (src.crossJoin(F.broadcast(denom))
               .select(source_col,
                       F.floor(F.lit(float(total_budget)) * F.col("w")
                               / F.col("d")).cast("bigint")
                       .alias("src_budget")))
    order_key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = (Window.partitionBy(source_col)
         .orderBy(order_key, id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        toks.join(F.broadcast(budgets), source_col)
        .withColumn("_cum", F.sum("n_tokens").over(w).cast("bigint"))
        .select(id_col, source_col, "n_tokens", "src_budget",
                ((F.col("_cum") - F.col("n_tokens"))
                 < F.col("src_budget")).alias("kept"))
    )
