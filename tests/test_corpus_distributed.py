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
