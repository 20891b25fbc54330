"""Deduplication operators for training-data pipelines.

Not in the reference (its only dedup is the crawl-frontier URL set,
``IndexingServiceImpl.java:62,207`` -> ``dropDuplicates`` analog); these
are the corpus-scale operators a 100 TB text pipeline needs:

- exact dedup            — hash + groupBy (one shuffle on the hash)
- MinHash + LSH          — shingle -> H minhashes -> banded bucket join;
  candidate generation cost is O(Σ bucket²) instead of O(n²)
- n-gram Jaccard         — exact pair similarity via shingle self-join
  (verification stage after LSH at scale, standalone at test scale)
- SimHash                — 64-bit near-dup fingerprint via xxhash64 bit
  voting (no SQL oracle: xxhash64 is engine-specific)

Determinism note: MinHash uses ``min(md5(seed || ':' || shingle))``
over the *hex string* ordering — deterministic, seedable, and exactly
reproducible in ANSI SQL (the DuckDB oracle), unlike
hash-function-dependent MinHashLSH implementations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from searchengine_spark.functions.text import shingles, simple_tokens


def exact_duplicate_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact-duplicate groups: (content_hash, n_dups, min_doc_id).

    One hash-shuffle; at 100 TB this is the cheapest dedup pass and
    runs first to shrink the corpus before any near-dup work.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("min_doc_id"),
        )
        .where(F.col("n_dups") > 1)
    )


def _shingle_frame(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, shingle) distinct pairs."""
    return (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(shingles(simple_tokens(text_col), n)).alias("shingle"),
        )
        .distinct()
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(_id, mh0..mh{H-1}) MinHash signature per doc.

    One explode + one groupBy with H min-aggregates (single shuffle);
    docs with < shingle_n tokens get no signature (dropped — they are
    handled by exact dedup).
    """
    sh = _shingle_frame(df, id_col, text_col, shingle_n)
    aggs = [
        F.min(F.md5(F.concat_ws(":", F.lit(str(s)), F.col("shingle")))).alias(f"mh{s}")
        for s in range(n_hashes)
    ]
    return sh.groupBy("_id").agg(*aggs)


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    shingle_n: int = 3,
    bands: int = 4,
) -> DataFrame:
    """LSH candidate pairs (doc_a < doc_b) sharing >= 1 signature band.

    Sig -> (band_id, band_key=md5(concat of the band's minhashes)) ->
    self-equi-join on the band bucket.  The join key is the bucket, so
    skewed buckets are exactly the head-term problem — AQE skew-join
    handles moderate skew; pathological buckets (all-identical docs)
    should be capped upstream by exact dedup.
    """
    rows = n_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n_hashes, shingle_n)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat_ws("|", *[F.col(f"mh{b * rows + r}") for r in range(rows)])
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select(F.col("_id"), F.explode(band_structs).alias("band")).select(
        "_id", "band.band_id", "band.band_key"
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("doc_a"), F.col("r._id").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard pairs: (doc_a, doc_b, jaccard) >= threshold.

    |A ∩ B| via shingle self-join, |A ∪ B| = |A| + |B| - |A ∩ B|.
    Shuffles on the shingle (self-join) then on the pair (groupBy) —
    at full scale run only on LSH candidates; standalone here because
    sf test corpora are small.
    """
    sh = _shingle_frame(df, id_col, text_col, shingle_n)
    sizes = sh.groupBy("_id").agg(F.count("*").alias("n_sh"))
    l, r = sh.alias("l"), sh.alias("r")
    common = (
        l.join(r, (F.col("l.shingle") == F.col("r.shingle")) & (F.col("l._id") < F.col("r._id")))
        .groupBy(F.col("l._id").alias("doc_a"), F.col("r._id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per doc: (doc_id, simhash).

    Token-level xxhash64 bit voting, entirely in Catalyst: explode
    tokens, for each bit position sum +-1 by the token-hash bit, then
    reassemble the sign bits.  No per-row Python; the 64 aggregate
    expressions compile into one whole-stage-codegen'd aggregate.
    (No SQL oracle — xxhash64 is Spark-specific — so the driver records
    the weaker rows-only check for this one.)
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(simple_tokens(text_col)).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    votes = toks.groupBy("_id").agg(
        *[
            F.sum(
                F.when(F.shiftrightunsigned(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    sim = None
    for b in range(64):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        contrib = F.shiftleft(bit, b)
        sim = contrib if sim is None else sim.bitwiseOR(contrib)
    return votes.select(F.col("_id").alias(id_col), sim.alias("simhash"))


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Banded exact match on 4 x 16-bit chunks prunes the pair space
    (a pair within Hamming distance 3 must agree on >= 1 chunk); the
    surviving pairs get an exact popcount check.
    """
    sim = simhash64(df, id_col, text_col)
    chunks = sim.select(
        F.col(id_col).alias("_id"),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftrightunsigned(F.col("simhash"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ch"),
    ).select("_id", "simhash", "ch.chunk_id", "ch.chunk")
    l, r = chunks.alias("l"), chunks.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.chunk_id") == F.col("r.chunk_id"))
            & (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("doc_a"),
            F.col("r._id").alias("doc_b"),
            F.col("l.simhash").alias("sim_a"),
            F.col("r.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
