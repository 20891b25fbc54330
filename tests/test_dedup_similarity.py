"""Property tests for the dedup / similarity operator families
(VERDICT r1 items 2-3): SimHash banding recall, banded-LSH ANN recall,
bucketed near-dup coverage, minhash numeric-prefix ordering parity.

Brute-force oracles are computed in plain Python/NumPy over collected
fixtures — small enough to be exact, independent of the Spark code
under test.
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators import dedup as D
from searchengine_spark.operators import similarity as S

EMB_PATH = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def docs_df(spark, corpus_rows):
    rows = [(i, content) for i, (_, _, _, _, content) in enumerate(corpus_rows)]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.read.parquet(EMB_PATH).cache()


@pytest.fixture(scope="module")
def emb_np(emb_df):
    rows = emb_df.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_U64 = (1 << 64) - 1


def _ham(a: int, b: int) -> int:
    # mask to u64: Spark longs arrive as signed Python ints and
    # bin(-x) would miscount the two's-complement bits
    return bin((a ^ b) & _U64).count("1")


def _brute_hamming_pairs(sims: dict[int, int], max_h: int) -> set[tuple]:
    return {
        (a, b)
        for a, b in itertools.combinations(sorted(sims), 2)
        if _ham(sims[a], sims[b]) <= max_h
    }


@pytest.mark.parametrize("portable", [False, True])
def test_simhash64_deterministic_and_bounded(docs_df, portable):
    a = {r["doc_id"]: r["simhash"] for r in D.simhash64(docs_df, portable=portable).collect()}
    b = {r["doc_id"]: r["simhash"] for r in D.simhash64(docs_df, portable=portable).collect()}
    assert a == b, "simhash must be deterministic"
    assert len(a) == docs_df.count()
    if portable:
        assert all(0 <= v < (1 << D.SIMHASH_PORTABLE_BITS) for v in a.values())
    # fingerprints should be well spread: no hash value collides across
    # many distinct docs unless content is duplicated
    from collections import Counter

    top = Counter(a.values()).most_common(1)[0][1]
    assert top <= 3


def test_simhash_similar_docs_closer_than_random(spark):
    base = "def compute_index(data, offset): return data[offset] + compute_hash(data)"
    rows = [
        (0, base),
        (1, base + " # trailing comment tweak"),
        (2, "totally unrelated prose about weather patterns and ocean currents over months"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sims = {r["doc_id"]: r["simhash"] for r in D.simhash64(df).collect()}
    assert _ham(sims[0], sims[1]) < _ham(sims[0], sims[2])


@pytest.mark.parametrize("max_h,portable", [(1, False), (3, False), (7, False), (3, True), (0, False)])
def test_simhash_banding_recall_is_total(docs_df, max_h, portable):
    """Pigeonhole banding must find EVERY pair within max_hamming —
    the r1 VERDICT bug (4x16 chunks vs max_hamming=8) would fail this."""
    sims = {
        r["doc_id"]: r["simhash"]
        for r in D.simhash64(docs_df, portable=portable).collect()
    }
    want = _brute_hamming_pairs(sims, max_h)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in D.simhash_near_pairs(
            docs_df, max_hamming=max_h, portable=portable
        ).collect()
    }
    assert got == want


def test_simhash_near_pairs_rejects_bad_max_hamming(docs_df):
    with pytest.raises(ValueError):
        D.simhash_near_pairs(docs_df, max_hamming=32)


# ---------------------------------------------------------------------------
# Banded-LSH ANN
# ---------------------------------------------------------------------------

def test_lsh_topk_subset_with_exact_scores(emb_df, emb_np):
    """Every LSH hit must carry its true cosine and appear in the exact
    ranking order (the approximation may only DROP candidates)."""
    ids, mat = emb_np
    q = mat[ids == 0][0]
    exact_cos = {int(i): float(np.dot(mat[ids == i][0], q)) for i in ids if i != 0}
    got = S.lsh_topk(emb_df, list(q), k=10, n_planes=4, n_bands=2, exclude_id=0).collect()
    cos_vals = [r["cos"] for r in got]
    assert cos_vals == sorted(cos_vals, reverse=True)
    for r in got:
        assert r["cos"] == pytest.approx(exact_cos[r["vec_id"]], abs=1e-5)


def test_lsh_topk_recall_with_enough_bands(emb_df):
    """P=2, B=8 recovers the exact top-10 on this fixture (measured,
    deterministic planes)."""
    row = emb_df.where(F.col("vec_id") == 0).collect()[0]
    q = [float(x) for x in row["embedding"]]
    exact = [r["vec_id"] for r in S.cosine_topk(emb_df, q, k=10, exclude_id=0).collect()]
    got = [
        r["vec_id"]
        for r in S.lsh_topk(emb_df, q, k=10, n_planes=2, n_bands=8, exclude_id=0).collect()
    ]
    assert got == exact


# ---------------------------------------------------------------------------
# Bucketed cosine near-dup
# ---------------------------------------------------------------------------

def _exact_pairs(emb_np, threshold):
    ids, mat = emb_np
    sims = mat @ mat.T
    out = set()
    for i, j in zip(*np.where(np.triu(sims, 1) >= threshold)):
        a, b = int(ids[i]), int(ids[j])
        out.add((min(a, b), max(a, b)))
    return out


def test_cosine_neardup_bucketed_subset_of_exact(emb_df, emb_np):
    want = _exact_pairs(emb_np, 0.35)
    got = {
        (r["id_a"], r["id_b"])
        for r in S.cosine_neardup_pairs(
            emb_df, threshold=0.35, block_planes=1, block_bands=4
        ).collect()
    }
    assert got <= want  # blocking may drop pairs, never invent them


@pytest.mark.parametrize("bands", [12, 16])
def test_cosine_neardup_bucketed_full_recall_at_enough_bands(emb_df, emb_np, bands):
    """Full recall (== exact all-pairs) at both B=12 — the shipped
    q_embed_neardup configuration (__spark_entry__.py) — and B=16."""
    want = _exact_pairs(emb_np, 0.35)
    got = {
        (r["id_a"], r["id_b"])
        for r in S.cosine_neardup_pairs(
            emb_df, threshold=0.35, block_planes=1, block_bands=bands
        ).collect()
    }
    assert got == want and len(want) > 100


def test_cosine_neardup_high_threshold_clusters(spark):
    """The production configuration (high threshold, several planes):
    synthetic clusters of true near-dups (cos >= 0.99) are all found
    with P=4, B=4 — the regime where blocking IS sub-quadratic."""
    rng = np.random.default_rng(7)
    bases = rng.normal(size=(12, 32))
    rows = []
    vid = 0
    for b in bases:
        for _ in range(4):  # 4 near-copies per cluster
            v = b + rng.normal(scale=0.02, size=32)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mat = np.array([r[1] for r in rows])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    want = {
        (i, j)
        for i, j in zip(*np.where(np.triu(sims, 1) >= 0.99))
    }
    assert len(want) >= 12 * 6  # every intra-cluster pair qualifies
    got = {
        (r["id_a"], r["id_b"])
        for r in S.cosine_neardup_pairs(
            df, threshold=0.99, block_planes=4, block_bands=4
        ).collect()
    }
    assert got == want


def test_ivf_label_partition_pruning(spark, emb_df, tmp_path):
    """The IVF scale claim made concrete: with the table written
    partitioned by cell (label), the cell filter becomes partition
    pruning — the scan lists only the query cell's directory."""
    p = str(tmp_path / "emb_by_label")
    emb_df.write.partitionBy("label").parquet(p)
    part = spark.read.parquet(p)
    row = emb_df.where(F.col("vec_id") == 0).collect()[0]
    q, label = [float(x) for x in row["embedding"]], int(row["label"])
    topk = S.ivf_topk(part, q, label, k=5, exclude_id=0)
    plan = topk._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "label" in plan.split("PartitionFilters", 1)[1][:200]
    # and the result is the exact within-cell ranking
    want = [
        r["vec_id"]
        for r in S.cosine_topk(
            emb_df.where(F.col("label") == label), q, k=5, exclude_id=0
        ).collect()
    ]
    assert [r["vec_id"] for r in topk.collect()] == want


def test_lsh_indexed_store_pruning_and_equality(spark, emb_df, emb_np, tmp_path):
    """VERDICT r2 #6: the (band, bucket)-partitioned ANN store — the
    probe plan must show partition filters on band/bucket (pruned read,
    not a full scan), and results must equal the scan-based lsh_topk at
    the same (P, B, seed), which is itself the exact top-10 here
    (measured recall 1.0 at P=2, B=8)."""
    p = str(tmp_path / "lsh_store")
    meta = S.write_lsh_index(emb_df, p, n_planes=2, n_bands=8)
    assert meta["dim"] == len(emb_df.select("embedding").first()[0])
    row = emb_df.where(F.col("vec_id") == 0).collect()[0]
    q = [float(x) for x in row["embedding"]]

    topk = S.lsh_topk_indexed(spark, p, q, k=10, exclude_id=0)
    plan = topk._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    part_filters = plan.split("PartitionFilters", 1)
    assert len(part_filters) == 2, "probe scan must carry partition filters"
    assert "band" in part_filters[1][:400] and "bucket" in part_filters[1][:400]

    got = [(r["vec_id"], r["cos"]) for r in topk.collect()]
    scan = [
        (r["vec_id"], r["cos"])
        for r in S.lsh_topk(
            emb_df, q, k=10, n_planes=2, n_bands=8, exclude_id=0
        ).collect()
    ]
    exact = [
        (r["vec_id"], r["cos"])
        for r in S.cosine_topk(emb_df, q, k=10, exclude_id=0).collect()
    ]
    assert got == scan == exact


# ---------------------------------------------------------------------------
# Exact Jaccard over LSH candidates (the 100 TB verification pipeline)
# ---------------------------------------------------------------------------

def test_jaccard_candidates_pipeline(spark, docs_df):
    """VERDICT r2 #5: ngram_jaccard_pairs(candidates=...) must equal
    the exact standalone result restricted to the candidate set (the
    verify stage can only confirm or reject candidates, never invent
    pairs), with candidate-sized relations only (no forced broadcast)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (100, base),
        (101, base + " lambda"),
        (102, base.replace("delta", "replaced")),
        (103, "wholly unrelated text tokens with nothing shared here at all"),
    ]
    df = docs_df.unionByName(
        spark.createDataFrame(rows, "doc_id long, text string")
    )
    cand = D.lsh_candidate_pairs(df, n_hashes=8, shingle_n=3, bands=4)
    cand_pairs = {(r["doc_a"], r["doc_b"]) for r in cand.collect()}
    assert (100, 101) in cand_pairs  # the planted near-dups are caught

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(
            df, threshold=0.2, shingle_n=3, candidates=cand
        ).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(df, threshold=0.2, shingle_n=3).collect()
    }
    want = {p: j for p, j in exact.items() if p in cand_pairs}
    assert got == want and (100, 101) in got


def test_jaccard_candidates_mode_forces_no_broadcast(spark, docs_df):
    """With forced-broadcast disabled the candidates-mode plan must not
    contain a BroadcastExchange — proof no broadcast HINT remains (the
    r2 finding: the per-doc size relation, which grows with the corpus,
    was hint-broadcast)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cand = D.lsh_candidate_pairs(docs_df, n_hashes=8, shingle_n=3, bands=4)
        out = D.ngram_jaccard_pairs(
            docs_df, threshold=0.2, shingle_n=3, candidates=cand
        )
        plan = out._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "BroadcastExchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


# ---------------------------------------------------------------------------
# Connected components (duplicate-cluster resolution)
# ---------------------------------------------------------------------------

def _uf_components(edges):
    """Brute-force union-find oracle: {node: min-id-of-component}."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_matches_union_find(spark):
    """Random graph + a 41-node chain (forces multiple contraction
    rounds) — large-star/small-star must agree with union-find."""
    rng = np.random.default_rng(5)
    edges = set()
    for _ in range(300):
        a, b = int(rng.integers(0, 120)), int(rng.integers(0, 120))
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edges |= {(1000 + i, 1001 + i) for i in range(40)}  # long chain
    df = spark.createDataFrame(sorted(edges), "doc_a long, doc_b long")
    got = {
        (r["node"], r["component"])
        for r in D.connected_components(df).collect()
    }
    want = set(_uf_components(edges).items())
    assert got == want


def test_connected_components_empty_and_single_edge(spark):
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert D.connected_components(empty).count() == 0
    one = spark.createDataFrame([(7, 3)], "doc_a long, doc_b long")
    got = {(r["node"], r["component"]) for r in D.connected_components(one).collect()}
    assert got == {(3, 3), (7, 3)}


def test_duplicate_clusters_canonical_flag(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long")
    got = {
        r["node"]: (r["component"], r["is_canonical"])
        for r in D.duplicate_clusters(df).collect()
    }
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False),
        10: (10, True), 11: (10, False),
    }


# ---------------------------------------------------------------------------
# MinHash portable-scheme parity + fast variant
# ---------------------------------------------------------------------------

def _py_minhash(shingles_, n_hashes):
    """Pure-Python recompute of the portable scheme: one md5 per
    shingle, 32-bit prefix base, (a*x + b) mod 2^31-1 permutations."""
    coeffs = D.minhash_coeffs(n_hashes)
    xs = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in shingles_]
    return [
        min((a * x + b) % D.MINHASH_PRIME for x in xs) for a, b in coeffs
    ]


def test_minhash_portable_matches_python_recompute(spark):
    """The engine's portable minhash values equal an independent Python
    recompute of the documented scheme — the same arithmetic the DuckDB
    oracle runs, so this pins engine<->oracle value parity."""
    df = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon"),
         (1, "one two three four five six seven")],
        "doc_id long, text string",
    )
    sigs = {r["_id"]: r for r in D.minhash_signatures(df, n_hashes=4, shingle_n=3).collect()}
    docs = {
        0: ["alpha beta gamma", "beta gamma delta", "gamma delta epsilon"],
        1: ["one two three", "two three four", "three four five",
            "four five six", "five six seven"],
    }
    for doc_id, sh in docs.items():
        want = _py_minhash(sh, 4)
        got = [sigs[doc_id][f"mh{s}"] for s in range(4)]
        assert got == want, doc_id


def test_minhash_coeffs_are_deterministic_and_in_field():
    a1 = D.minhash_coeffs(8)
    a2 = D.minhash_coeffs(8)
    assert a1 == a2  # engine and oracle must derive identical constants
    for a, b in a1:
        assert 1 <= a < D.MINHASH_PRIME and 0 <= b < D.MINHASH_PRIME
        # no-overflow proof obligation: max operand product < 2^63
        assert a * (2**32 - 1) + b < 2**63


def test_minhash_permutations_select_diverse_argmins():
    """The permutations must behave like independent random orderings:
    across seeds, the argmin shingle varies (a broken mixing scheme —
    e.g. min dominated by one base value — would pick the same shingle
    for every seed and collapse LSH to a single-hash scheme)."""
    rng = np.random.default_rng(7)
    shingles_ = [
        " ".join(str(rng.integers(0, 1000)) for _ in range(3)) for _ in range(200)
    ]
    coeffs = D.minhash_coeffs(16)
    xs = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in shingles_]
    argmins = {
        min(range(len(xs)), key=lambda i: (a * xs[i] + b) % D.MINHASH_PRIME)
        for a, b in coeffs
    }
    assert len(argmins) >= 8  # 16 seeds over 200 shingles: near-unique


def test_minhash_xxhash_variant_is_deterministic_and_finds_planted_pair(
    spark, docs_df
):
    """portable=False (per-seed xxhash64) — the Spark-native fast
    variant: deterministic across runs and catches the same planted
    near-dup the portable path catches (hash-agnostic LSH property)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = docs_df.unionByName(
        spark.createDataFrame(
            [(100, base), (101, base + " lambda")], "doc_id long, text string"
        )
    )
    p1 = {(r["doc_a"], r["doc_b"]) for r in D.lsh_candidate_pairs(
        df, n_hashes=8, shingle_n=3, bands=4, portable=False).collect()}
    p2 = {(r["doc_a"], r["doc_b"]) for r in D.lsh_candidate_pairs(
        df, n_hashes=8, shingle_n=3, bands=4, portable=False).collect()}
    assert p1 == p2
    assert (100, 101) in p1
