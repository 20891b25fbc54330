"""Driver-side function parity with Spark JVM implementations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.functions.xxhash import bucket_of, xxhash64


@pytest.fixture(scope="module")
def sample_strings():
    import random

    rng = random.Random(42)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789-_/поиск語"
    samples = ["", "a", "spark", "x" * 31, "y" * 32, "z" * 100]
    samples += ["".join(rng.choice(alpha) for _ in range(rng.randint(1, 64))) for _ in range(200)]
    return samples


def test_xxhash64_matches_spark(spark, sample_strings):
    df = spark.createDataFrame([(s,) for s in sample_strings], "s string")
    rows = df.withColumn("h", F.xxhash64("s")).collect()
    for r in rows:
        assert xxhash64(r["s"].encode("utf-8")) == r["h"], r["s"]


def test_bucket_matches_spark_pmod(spark, sample_strings):
    n = 8
    df = spark.createDataFrame([(s,) for s in sample_strings], "s string")
    rows = df.withColumn("b", F.pmod(F.xxhash64("s"), F.lit(n))).collect()
    for r in rows:
        assert bucket_of(r["s"], n) == r["b"], r["s"]
