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


def test_curation_durable_resume_after_failure(spark, sf_dir, tmp_path):
    """The 100 TB shape: stage outputs are txlog tables; a driver that
    dies between near-dup and split resumes to a bit-identical
    train_chunks, and committed stages are NOT recomputed."""
    from pathlib import Path

    from library_data_warehouse_and_business_analytics_system_spark.pipelines import (
        curate_corpus_durable,
    )
    from library_data_warehouse_and_business_analytics_system_spark.pipelines.curation import (
        _DURABLE_STAGES,
    )
    from library_data_warehouse_and_business_analytics_system_spark.sources.txlog import (
        tx_read,
    )

    # deterministic ~1/3 subset (limit() is layout-dependent — unusable)
    docs = (load_table(spark, sf_dir, "documents")
            .where(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == 0))

    # "crash" between the near-dup and split stages
    root = str(tmp_path / "resume")
    done = curate_corpus_durable(spark, docs, root, stop_after="near_kept")
    assert set(done) == {"exact_kept", "near_kept"}

    # restart completes the tail without touching committed stages
    done = curate_corpus_durable(spark, docs, root)
    assert set(done) == set(_DURABLE_STAGES)
    for stage in _DURABLE_STAGES:
        logs = list((Path(root) / stage / "_txlog").glob("*.json"))
        assert len(logs) == 1, f"{stage} recommitted on resume"

    def chunks(df):
        return {(r.doc_id, r.chunk_idx, r.n_chunk_tokens, r.chunk_text)
                for r in df.collect()}

    resumed = chunks(tx_read(spark, f"{root}/train_chunks"))
    assert resumed

    # ≡ a never-interrupted durable run ≡ the in-memory pipeline
    scratch_root = str(tmp_path / "scratch")
    curate_corpus_durable(spark, docs, scratch_root)
    assert chunks(tx_read(spark, f"{scratch_root}/train_chunks")) == resumed
    assert chunks(curate_corpus(docs)["train_chunks"]) == resumed
