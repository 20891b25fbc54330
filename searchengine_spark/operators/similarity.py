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
    block_bands: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cos) >= t.

    The embedding leg of the dedup family (dedup.py covers text legs).
    ``block_planes=0`` -> exact all-pairs (theta self-join on id_a <
    id_b; quadratic — the oracle-comparable test-scale path).
    ``block_planes=P > 0`` with ``block_bands=B`` -> banded
    random-hyperplane blocking: a candidate pair must share its P-bit
    sign bucket in >= 1 of B independent bands, so the join key is
    (band, bucket) and the pair space is B x Σ bucket² instead of n² —
    the 100 TB path (write the table partitioned by (band, bucket) and
    the self-join is co-located, no shuffle).  Candidate recall for a
    pair at angle θ is 1 - (1 - p^P)^B with p = 1 - θ/π; near-dup
    thresholds (t >= 0.9 => p >= 0.85) reach ~1.0 with e.g. P=2, B=8.
    Low thresholds need P=1 and many bands — at that point blocking
    stops being cheaper than all-pairs; use it for true near-dup
    ranges.  Emitted pairs are always exact-verified (popcount analog:
    the true cosine is computed on every candidate), so blocking can
    only lose pairs, never invent them.
    """
    vd = F.col(vec_col).cast("array<double>")
    # normalize ONCE per vector (narrow pass) so each pair costs a single
    # dot product instead of three — the n² side must be as thin as
    # possible.  The norm is materialized as its own column first: an
    # aggregate inside the transform lambda would be re-evaluated per
    # element (O(d²) per vector).
    v = (
        df.select(F.col(id_col).alias("_id"), vd.alias("_vd"))
        .withColumn("_norm", F.sqrt(_dot(F.col("_vd"), F.col("_vd"))))
        .select(
            "_id",
            F.transform(F.col("_vd"), lambda x: x / F.col("_norm")).alias("_v"),
        )
    )
    if block_planes > 0:
        dim = len(df.select(vec_col).first()[0])
        banded = v.select(
            "_id",
            "_v",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(band).alias("band"),
                            lsh_bucket(
                                F.col("_v"),
                                random_hyperplanes(
                                    dim, block_planes, seed + 1000 * band
                                ),
                            ).alias("bucket"),
                        )
                        for band in range(block_bands)
                    ]
                )
            ).alias("bb"),
        ).select("_id", "_v", "bb.band", "bb.bucket")
        l, r = banded.alias("l"), banded.alias("r")
        cos = _dot(F.col("l._v"), F.col("r._v"))
        # score every candidate, filter, THEN distinct: the dedup
        # shuffle carries 3 scalars of surviving pairs, not vector
        # payloads of every candidate (a pair sharing several bands
        # recomputes one d-length dot — cheaper than an array-distinct)
        return (
            l.join(
                r,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bucket") == F.col("r.bucket"))
                & (F.col("l._id") < F.col("r._id")),
            )
            .select(
                F.col("l._id").alias("id_a"),
                F.col("r._id").alias("id_b"),
                F.round(cos, 6).alias("cos"),
            )
            .where(F.col("cos") >= threshold)
            .distinct()
        )
    l, r = v.alias("l"), v.alias("r")
    pairs = l.join(r, F.col("l._id") < F.col("r._id"))
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


def _query_bucket(query: list[float], planes: list[list[float]]) -> int:
    """Driver-side sign-bucket of a constant query vector."""
    b = 0
    for i, plane in enumerate(planes):
        if sum(a * x for a, x in zip(query, plane)) >= 0:
            b |= 1 << i
    return b


def lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 4,
    n_bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Banded-LSH ANN, ad-hoc form: exact scoring restricted to rows
    that share the query's P-bit sign-bucket in >= 1 of B independent
    bands (candidate recall per neighbor at angle θ: 1 - (1 - p^P)^B,
    p = 1 - θ/π).  Approximate by design.

    This form evaluates B x P hyperplane dots over a FULL scan — fine
    for one-off queries, wrong as the serving path at 100 TB.  The
    scale path is :func:`write_lsh_index` + :func:`lsh_topk_indexed`:
    buckets precomputed once at write time, each probe a
    partition-pruned read (plan-asserted in tests)."""
    dim = len(query)
    cond = None
    for band in range(n_bands):
        planes = random_hyperplanes(dim, n_planes, seed + 1000 * band)
        hit = lsh_bucket(F.col(vec_col), planes) == _query_bucket(query, planes)
        cond = hit if cond is None else cond | hit
    return cosine_topk(df.where(cond), query, k, id_col, vec_col, exclude_id)


def write_lsh_index(
    df: DataFrame,
    out_path: str,
    n_planes: int = 4,
    n_bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Write the (band, bucket)-partitioned ANN store: B rows per
    vector, hive-partitioned by (band, bucket), so a query probe reads
    B pruned partitions instead of scanning the table.

    Storage is B x the vector payload — the classic LSH index
    trade-off (replication buys pruned probes; at 100 TB pick B and P
    so B/2^P of the corpus per probe-set is executor-friendly).  The
    plane seeds/shape are pinned in a sidecar so probes rebuild the
    exact same hyperplanes.
    """
    import json
    import os

    dim = len(df.select(vec_col).first()[0])
    banded = df.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        lsh_bucket(
                            F.col(vec_col),
                            random_hyperplanes(dim, n_planes, seed + 1000 * band),
                        ).alias("bucket"),
                    )
                    for band in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, vec_col, "bb.band", "bb.bucket")
    banded.write.mode("overwrite").partitionBy("band", "bucket").parquet(out_path)
    meta = {
        "n_planes": n_planes,
        "n_bands": n_bands,
        "seed": seed,
        "dim": dim,
        "id_col": id_col,
        "vec_col": vec_col,
    }
    # the plane-parameter sidecar goes through Spark's writer (one-row
    # JSON under the underscore-prefixed `_lsh_meta/`, which parquet
    # listings ignore), so the store works on ANY filesystem the
    # cluster can reach — HDFS/S3, not just local paths (ADVICE r3)
    spark = df.sparkSession
    spark.createDataFrame(
        [(json.dumps(meta, sort_keys=True),)], "meta string"
    ).coalesce(1).write.mode("overwrite").json(f"{out_path}/_lsh_meta")
    return meta


def lsh_topk_indexed(
    spark,
    index_path: str,
    query: list[float],
    k: int = 10,
    exclude_id: int | None = None,
) -> DataFrame:
    """Banded-LSH ANN over a :func:`write_lsh_index` store — the scale
    path: the query's per-band buckets are computed driver-side, the
    scan carries an OR of (band, bucket) partition filters (Catalyst
    prunes to exactly B directories), candidates are deduped by id and
    exact-scored.  Same candidate set — and therefore same results —
    as :func:`lsh_topk` with the same (P, B, seed)."""
    import json
    import os

    try:  # Spark-written sidecar: works on HDFS/S3/local alike
        meta = json.loads(
            spark.read.json(f"{index_path}/_lsh_meta").collect()[0]["meta"]
        )
    except Exception:  # legacy local-FS stores wrote a bare json file
        with open(os.path.join(index_path, "_lsh_meta.json")) as f:
            meta = json.load(f)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    cond = None
    for band in range(meta["n_bands"]):
        planes = random_hyperplanes(
            meta["dim"], meta["n_planes"], meta["seed"] + 1000 * band
        )
        hit = (F.col("band") == band) & (
            F.col("bucket") == _query_bucket(query, planes)
        )
        cond = hit if cond is None else cond | hit
    cand = (
        spark.read.parquet(index_path)
        .where(cond)  # partition filters only — plan-asserted in tests
        .dropDuplicates([id_col])
    )
    return cosine_topk(cand, query, k, id_col, vec_col, exclude_id)
