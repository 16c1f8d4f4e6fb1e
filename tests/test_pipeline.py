"""End-to-end curation pipeline: the composition contract over the
real documents table — monotone shrinking stages, leak-free split,
token-exact chunking, and run-to-run determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark.functions import (
    text as TX,
)
from library_data_warehouse_and_business_analytics_system_spark.pipelines import (
    curate_corpus,
)
from library_data_warehouse_and_business_analytics_system_spark.sources.catalog import (
    load_table,
)


def test_curation_pipeline_end_to_end(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    stages = curate_corpus(docs)

    n = {name: df.count() for name, df in stages.items()
         if name != "train_chunks"}
    assert n["scrubbed"] == docs.count()
    assert n["exact_kept"] <= n["scrubbed"]
    assert n["near_kept"] <= n["exact_kept"]
    assert n["train"] + n["test"] == n["near_kept"]
    assert n["decontaminated"] <= n["train"]
    assert n["final_train"] <= n["decontaminated"]
    assert n["final_train"] > 0 and n["test"] > 0

    # chunking is token-exact over the surviving docs
    chunk_tokens = (stages["train_chunks"]
                    .agg(F.sum("n_chunk_tokens")).first()[0])
    doc_tokens = (stages["final_train"]
                  .agg(F.sum(F.size(TX.tokens(F.col("text"))))).first()[0])
    assert chunk_tokens == doc_tokens

    # leak-free: no surviving train doc shares its (scrubbed) text
    # hash with any test doc — exact dups were collapsed BEFORE the
    # hash split, so this must be structurally impossible
    train_h = stages["final_train"].select(F.md5("text").alias("h"))
    test_h = stages["test"].select(F.md5("text").alias("h"))
    assert train_h.join(test_h, "h", "inner").count() == 0

    # determinism: a second run over a reshuffled input produces the
    # same kept-id sets (every stage is content-hash driven)
    again = curate_corpus(docs.repartition(13))
    for name in ("final_train", "test"):
        a = {r.doc_id for r in stages[name].select("doc_id").collect()}
        b = {r.doc_id for r in again[name].select("doc_id").collect()}
        assert a == b, name
