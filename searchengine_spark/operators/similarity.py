"""Approximate-nearest-neighbor search over embedding columns.

Not in the reference (no vector data there); first-class for a
training-data pipeline.  Three tiers:

- brute-force cosine top-k  — exact baseline; one narrow scan + top-k,
  fully Catalyst (``aggregate``/``zip_with`` higher-order functions,
  no UDF);
- IVF-style partitioned top-k — restrict the scan to the query's
  cluster cell(s); at scale the table is written partitioned by cell
  so this is partition pruning, not a filter;
- random-hyperplane LSH bucketing — deterministic seeded planes;
  bucket join for candidate generation.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, functions as F


def _dot(a: Column, b: Column) -> Column:
    """Σ a_i * b_i via higher-order functions (JVM-side, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_similarity(vec_col: Column, query: list[float]) -> Column:
    """Cosine between an array<float|double> column and a constant query
    vector.  Everything is cast to double before accumulation so the
    result is engine-portable (float32 accumulation is not)."""
    q = F.array(*[F.lit(float(x)) for x in query]).cast("array<double>")
    v = vec_col.cast("array<double>")
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query))
    return _dot(v, q) / (F.sqrt(_dot(v, v)) * F.lit(qnorm))


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k: (vec_id, cos) desc, id asc.

    Scan is narrow (id + vector only — column pruning), score is
    computed JVM-side, and the global top-k is a TakeOrderedAndProject
    (per-partition heap + driver merge), not a full sort.
    """
    out = df.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), query), 6).alias("cos"),
    )
    if exclude_id is not None:
        out = out.where(F.col(id_col) != exclude_id)
    return out.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)


def ivf_topk(
    df: DataFrame,
    query: list[float],
    query_label: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    exclude_id: int | None = None,
) -> DataFrame:
    """IVF-style ANN: search only the query's cluster cell.

    With the table partitioned by ``label_col`` this is partition
    pruning — the scale path reads 1/n_cells of the data.  (Here the
    label column plays the role of the coarse-quantizer cell id.)
    """
    return cosine_topk(
        df.where(F.col(label_col) == query_label),
        query,
        k,
        id_col,
        vec_col,
        exclude_id,
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_planes: int = 0,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cos) >= t.

    The embedding leg of the dedup family (dedup.py covers text legs).
    ``block_planes=0`` -> exact all-pairs (theta self-join on id_a <
    id_b; quadratic — the oracle-comparable test-scale path).
    ``block_planes>0`` -> candidate pairs must share a random-hyperplane
    sign bucket first, so the join key is the bucket and the pair space
    is Σ bucket² instead of n² — the 100 TB path (write the table
    partitioned by bucket and the self-join is co-located, no shuffle).
    """
    vd = F.col(vec_col).cast("array<double>")
    # normalize ONCE per vector (narrow pass) so each pair costs a single
    # dot product instead of three — the n² side must be as thin as possible
    v = df.select(
        F.col(id_col).alias("_id"),
        F.transform(vd, lambda x: x / F.sqrt(_dot(vd, vd))).alias("_v"),
    )
    if block_planes > 0:
        dim = len(df.select(vec_col).first()[0])
        planes = random_hyperplanes(dim, block_planes, seed)
        v = v.withColumn("_bucket", lsh_bucket(F.col("_v"), planes))
        join_cond = (F.col("l._bucket") == F.col("r._bucket")) & (
            F.col("l._id") < F.col("r._id")
        )
    else:
        join_cond = F.col("l._id") < F.col("r._id")
    l, r = v.alias("l"), v.alias("r")
    pairs = l.join(r, join_cond)
    cos = _dot(F.col("l._v"), F.col("r._v"))
    return (
        pairs.select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.round(cos, 6).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit-ish gaussian hyperplanes (seeded)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from random hyperplanes (int in [0, 2^P))."""
    v = vec_col.cast("array<double>")
    acc = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(v, p) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        acc = acc.bitwiseOR(F.shiftleft(bit, i))
    return acc


def lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """LSH-bucketed ANN: exact scoring restricted to the query's
    sign-bucket.  Approximate (recall < 1); the scale path when no
    precomputed cells exist — bucket assignment is one narrow pass,
    and with the table written partitioned by bucket it becomes
    partition pruning like IVF."""
    dim = len(query)
    planes = random_hyperplanes(dim, n_planes, seed)
    qbucket = 0
    for i, plane in enumerate(planes):
        dot = sum(a * b for a, b in zip(query, plane))
        if dot >= 0:
            qbucket |= 1 << i
    bucketed = df.where(lsh_bucket(F.col(vec_col), planes) == qbucket)
    return cosine_topk(bucketed, query, k, id_col, vec_col, exclude_id)
