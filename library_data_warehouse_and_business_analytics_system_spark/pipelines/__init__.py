from .curation import curate_corpus, curate_corpus_durable

__all__ = ["curate_corpus", "curate_corpus_durable"]
