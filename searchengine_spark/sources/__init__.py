from searchengine_spark.sources.corpus import (
    corpus_from_documents_table,
    generate_corpus_rows,
    load_corpus,
)

__all__ = ["generate_corpus_rows", "load_corpus", "corpus_from_documents_table"]
