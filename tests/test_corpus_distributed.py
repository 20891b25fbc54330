"""Distributed corpus generator invariants (sources/corpus.py).

The scaling bench depends on the generated corpus being bit-identical
at any parallelism — these tests pin that property.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from searchengine_spark.sources.corpus import (
    CORPUS_COLUMNS,
    generate_corpus_distributed,
)


def _digest(df):
    row = df.select(
        F.sha2(F.concat_ws("|", *CORPUS_COLUMNS), 256).alias("h")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.conv(F.substring("h", 1, 12), 16, 10).cast("long")).alias("s"),
    ).collect()[0]
    return row["n"], row["s"]


N = 600


class TestDistributedGenerator:
    def test_partition_layout_independence(self, spark):
        a = _digest(generate_corpus_distributed(spark, N, num_partitions=2))
        b = _digest(generate_corpus_distributed(spark, N, num_partitions=13))
        assert a == b
        assert a[0] == N

    def test_seed_changes_content(self, spark):
        a = _digest(generate_corpus_distributed(spark, N, seed=42))
        b = _digest(generate_corpus_distributed(spark, N, seed=43))
        assert a != b

    def test_schema_and_uniqueness(self, spark):
        df = generate_corpus_distributed(spark, N)
        assert df.columns == CORPUS_COLUMNS
        assert df.select("repo", "path").distinct().count() == N
        # repos bounded by n_repos default; every content non-empty
        assert df.where(F.length("content") < 10).count() == 0

    def test_token_mix(self, spark):
        """The corpus must exercise head-term skew and identifiers."""
        toks = generate_corpus_distributed(spark, N).select(
            F.explode(F.split("content", " ")).alias("t")
        )
        by_freq = toks.groupBy("t").count().orderBy(F.desc("count"))
        top = by_freq.limit(5).collect()
        total = toks.count()
        # Zipf head: top-5 terms together cover a material share
        assert sum(r["count"] for r in top) > total * 0.05
        assert toks.where(F.col("t").rlike("^sym[0-9]{4}$")).count() > 0
        assert toks.where(F.col("t").rlike("_")).count() > 0


def test_load_corpus_catalog_table(spark, corpus_rows, tmp_path):
    """The catalog-table input seam (SURVEY.md §1.3 Iceberg status):
    load_corpus(spark, "<table name>") must read any catalog table —
    exactly how an Iceberg table is consumed on a lakehouse deployment
    (same spark.read.table call; Iceberg's pruning engages beneath the
    identical plan).  Exercised here against the built-in catalog."""
    from searchengine_spark.sources.corpus import CORPUS_COLUMNS, load_corpus

    docs = spark.createDataFrame(corpus_rows[:12], schema=CORPUS_COLUMNS)
    spark.sql("DROP TABLE IF EXISTS corpus_seam_test")
    docs.write.saveAsTable("corpus_seam_test")
    try:
        got = load_corpus(spark, "corpus_seam_test")
        assert got.columns == CORPUS_COLUMNS
        assert got.count() == 12
        assert {r["repo"] for r in got.select("repo").distinct().collect()} == {
            r[0] for r in corpus_rows[:12]
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS corpus_seam_test")


def test_iceberg_runtime_optional_knob(spark):
    """SPARK_GRAFT_ICEBERG is the documented lakehouse knob; without
    Iceberg jars on the classpath (this sandbox) the session must work
    with the knob unset, and an `ice` catalog must simply be absent."""
    import os

    assert not os.environ.get("SPARK_GRAFT_ICEBERG")
    assert spark.conf.get("spark.sql.catalog.ice", None) is None
