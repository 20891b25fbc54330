"""Shared fixtures: one SparkSession, one tiny corpus, one built index.

The index build is session-scoped (it is the expensive part); tests
treat it read-only.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from searchengine_spark import IndexConfig, get_spark
from searchengine_spark.index.builder import build_index
from searchengine_spark.query.engine import SearchEngine
from searchengine_spark.sources.corpus import generate_corpus_rows
from tests.oracle import build_oracle_index

CFG = IndexConfig(n_buckets=4, n_salts=2, block_size=32)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="searchengine-tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus_rows():
    return generate_corpus_rows(n_repos=4, files_per_repo=25, seed=42)


@pytest.fixture(scope="session")
def oracle_index(corpus_rows):
    return build_oracle_index(corpus_rows)


@pytest.fixture(scope="session")
def index_dir(spark, corpus_rows, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("index"))
    docs = spark.createDataFrame(
        corpus_rows, schema=["repo", "path", "commit", "lang", "content"]
    )
    build_index(spark, docs, out, CFG, source="fixture", store_content=True)
    return out


@pytest.fixture(scope="session")
def engine(spark, index_dir):
    return SearchEngine(spark, index_dir)
