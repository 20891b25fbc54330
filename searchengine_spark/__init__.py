"""searchengine_spark — a PySpark-native inverted-index + BM25 query engine.

A from-scratch rebuild (NOT a port) of the query and data-processing
capabilities of AlexNickG/searchengine (reference at /root/reference,
Java/Spring/PostgreSQL), re-expressed Spark-first:

- batch inverted-index builder over a corpus table
  ``(repo, path, commit, lang, content)`` (reference: crawler + ``page``
  table, ``services/IndexingServiceImpl.java``),
- vectorized Arrow/pandas tokenize+lemmatize UDF (reference:
  Lucene-morphology ``services/LemmaFinder.java``),
- term-hash-partitioned, doc-salted, delta+varint-compressed posting
  blocks with skip/block-max metadata (reference: ``index`` rows in
  PostgreSQL, ``model/Index.java``),
- top-k search with posting intersection + BM25 / block-max pruning
  (reference: ``services/SearchServiceImpl.java`` Σtf relevance).

See SURVEY.md for the full operator mapping.
"""

from searchengine_spark.config import IndexConfig
from searchengine_spark.session import get_spark

__all__ = ["IndexConfig", "get_spark"]
__version__ = "0.1.0"
