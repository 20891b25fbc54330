"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: full-analyzer BM25 top-k over the sf0.001
``documents`` corpus via the engine's inline pipeline.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
family from SURVEY.md §2 plus the training-data-pipeline operators
(dedup, ANN, text analysis), each with a DuckDB-runnable ANSI-SQL
oracle unless stated rows-only.  All computed columns are aliased
identically on both sides; float outputs are rounded to 6 (money sums
go through exact DECIMAL then cast to DOUBLE) so value-hashes match.

The documents-table queries use the SQL-parity tokenizer
(``searchengine_spark.functions.text.simple_tokens``); the engine's
full analyzer (identifier bypass, stop filter, lemmatizer) is exercised
against the pure-Python oracle in tests/ (see SURVEY.md §5).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from searchengine_spark.analyzer import IDENT_RE, STOPWORDS
from searchengine_spark.functions.text import simple_tokens
from searchengine_spark.operators import dedup as D
from searchengine_spark.operators import multimodal as MM
from searchengine_spark.operators import similarity as SIM
from searchengine_spark.operators import textstats as TS
from searchengine_spark.query.inline import inline_search_topk
from searchengine_spark.sources.corpus import corpus_from_documents_table

K1, B = 1.2, 0.75
AND_TERMS = ["spark", "query"]          # conjunctive search fixture
BM25_TERMS = ["spark", "dup"]           # disjunctive: one head, one rare
PRUNE_PCT = 80                          # df-percentage filter fixture


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat (doc_id, term, tf) via the SQL-parity tokenizer."""
    docs = _read(spark, sf_dir, "documents")
    occ = docs.select(
        "doc_id", F.explode(simple_tokens("text")).alias("term")
    )
    return occ.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))


# SQL fragment shared by the oracle queries: exploded token stream
_TOKS = (
    "SELECT doc_id, source, unnest(string_split(trim(regexp_replace(lower(text),"
    " '[^a-z0-9]+', ' ', 'g')), ' ')) AS term FROM documents"
)


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: real-analyzer inline BM25 top-10 on sf0.001."""
    corpus = corpus_from_documents_table(spark, "/root/testdata/sf0.001")
    return inline_search_topk(corpus, "spark query dup", k=10, mode="or")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_tf_postings(spark, sf_dir):
    """T2/T5/A1: tokenize + per-doc term frequency (lemma counts per
    document, LemmaFinder.java:65-78 analog)."""
    return _postings(spark, sf_dir)


def q_term_stats(spark, sf_dir):
    """S7/A2: term dictionary with document + collection frequency
    (lemma table analog, LemmaRepository.java:25-30)."""
    docs = _read(spark, sf_dir, "documents")
    occ = docs.select("doc_id", F.explode(simple_tokens("text")).alias("term"))
    return occ.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"),
        F.count("*").alias("cf"),
    )


def q_doc_lengths(spark, sf_dir):
    """doclen = post-tokenizer token count per doc (BM25 |d|)."""
    docs = _read(spark, sf_dir, "documents")
    occ = docs.select("doc_id", F.explode(simple_tokens("text")).alias("term"))
    return occ.groupBy("doc_id").agg(F.count("*").alias("doclen"))


def q_corpus_stats(spark, sf_dir):
    """A5/A6/A7: per-source statistics (StatisticsServiceImpl analog)."""
    docs = _read(spark, sf_dir, "documents")
    occ = docs.select(
        "source", "doc_id", F.explode(simple_tokens("text")).alias("term")
    )
    return occ.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.countDistinct("term").alias("n_terms"),
        F.count("*").alias("total_tokens"),
    )


def q_search_and_tf(spark, sf_dir):
    """J2/J3/A3/A4/O2: conjunctive Σtf search with max-normalized
    relevance (the reference scoring, SearchServiceImpl.java:116-161).

    A4's max-normalization is a scalar aggregate + 1-row broadcast
    cross join (the q_search_bm25 consts pattern), NOT a
    max-over-empty-window — the latter moves every matched doc to one
    partition at scale (WindowExec "No Partition Defined")."""
    ptf = _postings(spark, sf_dir).where(F.col("term").isin(AND_TERMS))
    agg = ptf.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("tf_sum"), F.count("*").alias("n")
    )
    matched = agg.where(F.col("n") == len(AND_TERMS)).select("doc_id", "tf_sum")
    mx = matched.agg(F.max("tf_sum").alias("mx"))
    rel = (
        matched.crossJoin(F.broadcast(mx))
        .withColumn("rel", F.round(F.col("tf_sum") / F.col("mx"), 6))
        .drop("mx")
    )
    return rel.orderBy(F.desc("tf_sum"), F.asc("doc_id")).limit(10)


def q_search_bm25(spark, sf_dir):
    """Q6: disjunctive BM25 top-10 (engine scoring, SURVEY.md §2.9).

    ONE Catalyst plan — corpus N, avgdl, and per-term df are computed
    in-plan (1-row broadcast cross joins), not collected to the driver
    first; idf = ln(1 + (N - df + 0.5)/(df + 0.5)) as a column
    expression.  (The SearchEngine path instead resolves these from a
    pruned metadata read — this query is the pure-DataFrame contract.)
    """
    docs = _read(spark, sf_dir, "documents")
    # NOT persisted: the plan references this relation four times, but
    # three of the references are term-filtered or column-pruned, and
    # Catalyst pushes those filters/projections into each subtree's
    # scan — measured 2x faster than materializing the full postings
    # relation once (persist forces all terms to disk/memory first).
    ptf = _postings(spark, sf_dir)
    dl = ptf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    consts = docs.agg(F.count("*").alias("n")).crossJoin(
        dl.agg(F.avg("dl").alias("avgdl"))
    )
    qtf = ptf.where(F.col("term").isin(BM25_TERMS))
    dfs = qtf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    scored = (
        qtf.join(F.broadcast(dfs), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(consts))
        .withColumn(
            "contrib",
            idf * F.col("tf") * (K1 + 1.0)
            / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.col("avgdl"))),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(10)
    )


def q_df_prune(spark, sf_dir):
    """F7/O1 prep: high-df pruning with Java integer-division semantics
    (SearchServiceImpl.java:108): keep terms with (100*df)//N <= 80."""
    n_docs = _read(spark, sf_dir, "documents").count()
    ts = q_term_stats(spark, sf_dir)
    pct = F.floor(F.lit(100) * F.col("df") / F.lit(n_docs)).cast("long")
    return (
        ts.withColumn("pct", pct)
        .where(F.col("pct") <= PRUNE_PCT)
        .select("term", "df", "pct")
    )


def q_missing_terms(spark, sf_dir):
    """J5/E3: anti-join guard — query terms absent from the dictionary
    (all-terms-present bail-out, SearchServiceImpl.java:104-107)."""
    qterms = spark.createDataFrame([("spark",), ("zzznope",)], "term string")
    vocab = _read(spark, sf_dir, "documents").select(
        F.explode(simple_tokens("text")).alias("term")
    ).distinct()
    return qterms.join(vocab, "term", "left_anti")


def q_intersection(spark, sf_dir):
    """E1/J3: posting intersection via semi-join (retainAll analog)."""
    occ = _read(spark, sf_dir, "documents").select(
        "doc_id", F.explode(simple_tokens("text")).alias("term")
    )
    has_dup = occ.where(F.col("term") == "dup").select("doc_id").distinct()
    has_spark = occ.where(F.col("term") == "spark").select("doc_id").distinct()
    return has_dup.join(has_spark, "doc_id", "left_semi")


def q_union_distinct(spark, sf_dir):
    """E2: set union with dedup (cross-site result accumulation analog)."""
    docs = _read(spark, sf_dir, "documents")
    occ = docs.select("doc_id", F.explode(simple_tokens("text")).alias("term"))
    a = occ.where(F.col("term") == "dup").select("doc_id")
    b = docs.where(F.col("source") == "src0").select("doc_id")
    return a.union(b).distinct()


def q_pagination(spark, sf_dir):
    """O3: offset/limit pagination window (rows 11-20 of the ranking,
    SearchServiceImpl.java:167-175).

    Scale shape: top-(offset+limit) via orderBy().limit() — a
    TakeOrderedAndProject (per-partition heap + driver merge), never a
    global row_number window over the full posting list — then the
    k-bounded page is ranked/sliced driver-side, exactly like the
    engine's own pagination (query/engine.py search(): collect k rows,
    slice [offset, offset+limit))."""
    offset, limit = 10, 10
    ptf = _postings(spark, sf_dir).where(F.col("term") == "join")
    top = (
        ptf.select("doc_id", "tf")
        .orderBy(F.desc("tf"), F.asc("doc_id"))
        .limit(offset + limit)
        .collect()
    )
    page = [
        (int(r["doc_id"]), int(r["tf"]), i + 1)
        for i, r in enumerate(top)
    ][offset: offset + limit]
    return spark.createDataFrame(page, "doc_id long, tf long, rn long")


def q_dedup_exact(spark, sf_dir):
    """Exact dedup: full-content hash groups (empty when corpus has no
    exact dups — parity still checked)."""
    return D.exact_duplicate_groups(_read(spark, sf_dir, "documents"), "doc_id", "text")


def q_fingerprint_dups(spark, sf_dir):
    """Fingerprint dedup: docs sharing a min-shingle-hash fingerprint."""
    fp = TS.doc_fingerprints(_read(spark, sf_dir, "documents"))
    return (
        fp.groupBy("fingerprint")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("min_doc_id"))
        .where(F.col("n_dups") > 1)
    )


def q_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup candidate pairs (8 hashes, 4 bands x 2)."""
    return D.lsh_candidate_pairs(
        _read(spark, sf_dir, "documents"), "doc_id", "text", n_hashes=8, shingle_n=3, bands=4
    )


def q_jaccard_pairs(spark, sf_dir):
    """Exact 3-gram Jaccard pairs >= 0.2 (LSH verification stage)."""
    return D.ngram_jaccard_pairs(
        _read(spark, sf_dir, "documents"), "doc_id", "text", shingle_n=3, threshold=0.2
    )


def q_simhash(spark, sf_dir):
    """SimHash fingerprints — engine-portable 60-bit md5-prefix variant
    (bit-for-bit reproducible in the SQL oracle; the faster xxhash64
    variant is property-tested in tests/test_dedup_similarity.py)."""
    return D.simhash64(
        _read(spark, sf_dir, "documents"), "doc_id", "text", portable=True
    )


def q_simhash_engine(spark, sf_dir):
    """SimHash fingerprints — the SCALE-path variant (full 64-bit
    xxhash64 token hashes, one JVM-side hash per token instead of
    conv(md5) decimal parsing).  No SQL oracle entry by design (DuckDB
    cannot reproduce Spark's xxhash64): the driver records a rows-only
    check, and equivalence properties (same near-dup recall behavior,
    deterministic output) are pinned in tests/test_dedup_similarity.py.
    Benchmarked as the headline simhash cost (VERDICT r4 #5) — the
    portable q_simhash row remains the hash-matched CORRECTNESS
    entry."""
    return D.simhash64(
        _read(spark, sf_dir, "documents"), "doc_id", "text", portable=False
    )


def q_simhash_near(spark, sf_dir):
    """SimHash near-dup pairs (Hamming <= 3) via pigeonhole banding on
    max_hamming+1 chunks; exact-verified with popcount."""
    out = D.simhash_near_pairs(
        _read(spark, sf_dir, "documents"), "doc_id", "text",
        max_hamming=3, portable=True,
    )
    return out.select(
        "doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming")
    )


def q_near_dup_components(spark, sf_dir):
    """Duplicate-cluster resolution: SimHash near-dup pairs (Hamming
    <= 3) resolved into connected components (node -> min-id component
    rep) via alternating large-star/small-star contraction — O(log n)
    rounds, no neighbor lists materialized.  The keep-policy stage a
    dedup pipeline runs after pair emission."""
    pairs = D.simhash_near_pairs(
        _read(spark, sf_dir, "documents"), "doc_id", "text",
        max_hamming=3, portable=True,
    )
    return D.connected_components(pairs).select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
    )


def _query_vec(spark, sf_dir):
    row = (
        _read(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == 0)
        .select("embedding", "label")
        .collect()[0]
    )
    return [float(x) for x in row["embedding"]], int(row["label"])


def q_ann_cosine(spark, sf_dir):
    """Brute-force cosine top-10 vs the vec_id=0 embedding."""
    vec, _ = _query_vec(spark, sf_dir)
    return SIM.cosine_topk(
        _read(spark, sf_dir, "embeddings"), vec, k=10, exclude_id=0
    )


def q_ann_ivf(spark, sf_dir):
    """IVF-style ANN: search only the query's cluster (label) cell."""
    vec, label = _query_vec(spark, sf_dir)
    return SIM.ivf_topk(
        _read(spark, sf_dir, "embeddings"), vec, label, k=10, exclude_id=0
    )


def q_ann_lsh(spark, sf_dir):
    """Banded random-hyperplane LSH ANN (2 planes x 8 bands).  At this
    band count the candidate set provably-by-measurement contains the
    exact top-10, so the exact-cosine SQL oracle hash-matches — the
    approximation is in the candidate generation, not the scores."""
    vec, _ = _query_vec(spark, sf_dir)
    return SIM.lsh_topk(
        _read(spark, sf_dir, "embeddings"), vec, k=10,
        n_planes=2, n_bands=8, exclude_id=0,
    )


def q_ann_lsh_indexed(spark, sf_dir):
    """Banded-LSH ANN through the (band, bucket)-partitioned store —
    the 100 TB serving path: buckets precomputed at write time, each
    probe an OR of (band, bucket) PARTITION FILTERS (B pruned dirs, not
    a scan; plan-asserted in tests/test_dedup_similarity.py).  Same
    (P, B, seed) as q_ann_lsh, so the exact-cosine SQL oracle
    hash-matches at the measured recall 1.0."""
    import hashlib
    import os

    # cache key = CONTENT fingerprint of the embeddings table (file
    # names + sizes + mtimes), not just the path: a regenerated corpus
    # at the same sf_dir must invalidate the store, or the probe would
    # silently score stale vectors (ADVICE r3).  Concurrent runs over
    # different corpus generations land in different dirs for free.
    emb = os.path.join(sf_dir, "embeddings.parquet")
    h = hashlib.md5(sf_dir.encode())
    listing = [emb] if os.path.isfile(emb) else sorted(
        os.path.join(emb, f) for f in os.listdir(emb)
    ) if os.path.isdir(emb) else []
    for f in listing:
        st = os.stat(f)
        h.update(f"{os.path.basename(f)}:{st.st_size}:{st.st_mtime_ns}".encode())
    store = "/tmp/lsh_store_" + h.hexdigest()[:16]
    if not os.path.exists(os.path.join(store, "_lsh_meta", "_SUCCESS")):
        SIM.write_lsh_index(
            _read(spark, sf_dir, "embeddings"), store, n_planes=2, n_bands=8
        )
    vec, _ = _query_vec(spark, sf_dir)
    return SIM.lsh_topk_indexed(spark, store, vec, k=10, exclude_id=0)


def q_embed_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs >= 0.35 via the BUCKETED
    path (banded hyperplane blocking, 1 plane x 12 bands — sized so
    candidate recall is 1.0 on this corpus, which the exact all-pairs
    SQL oracle verifies by hash-match).  Every emitted pair carries its
    exact cosine; blocking can only lose pairs, never invent them."""
    return SIM.cosine_neardup_pairs(
        _read(spark, sf_dir, "embeddings"), threshold=0.35,
        block_planes=1, block_bands=12,
    )


def q_media_features(spark, sf_dir):
    """Multimodal plumbing: text bytes as opaque binary media ->
    Arrow-batched feature extraction.  The kernel emits n_bytes and a
    payload sha256 computed from the exact bytes the decoder saw, which
    the SQL oracle recomputes — a hash-matched end-to-end check of the
    binary-column Arrow round-trip (the float feature vector itself is
    covered by tests/test_multimodal.py)."""
    media = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("lang") == "en", "image").otherwise("audio").alias("media_type"),
        F.lit(0).alias("width"),
        F.lit(0).alias("height"),
        F.col("n_chars").cast("int").alias("duration_ms"),
        F.encode("text", "utf-8").alias("data"),
    )
    return MM.extract_features(media).select(
        "doc_id", "media_type", "n_bytes", "payload_sha256"
    )


def q_frame_schedule(spark, sf_dir):
    """Multimodal frame-sampling schedule: pure-Catalyst sequence+explode
    over typed duration metadata (documents.n_chars plays duration_ms)."""
    media = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.lit("video").alias("media_type"),
        F.col("n_chars").cast("int").alias("duration_ms"),
    )
    return MM.sample_frames(media, every_ms=500).select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.col("frame_ts_ms").cast("long").alias("frame_ts_ms"),
    )


def q_token_counts(spark, sf_dir):
    """Token counting: whitespace vs normalized vs distinct vs BPE-ish
    pre-tokenizer segments (GPT-2-shape letter/digit/punct runs)."""
    out = TS.token_counts(_read(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.col("n_ws_tokens").cast("long").alias("n_ws_tokens"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_unique").cast("long").alias("n_unique"),
        F.col("n_bpe_segments").cast("long").alias("n_bpe_segments"),
    )


def q_quality(spark, sf_dir):
    """Quality scoring heuristics (length/digit/stopword ratios)."""
    out = TS.quality_scores(_read(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "avg_token_len",
        "digit_ratio",
        "stop_ratio",
        "quality",
    )


def q_langid(spark, sf_dir):
    """Marker-word language-ID heuristic."""
    return TS.language_id(_read(spark, sf_dir, "documents"))


def q_fingerprints(spark, sf_dir):
    """Per-doc min-shingle-hash fingerprint."""
    return TS.doc_fingerprints(_read(spark, sf_dir, "documents"))


def q_tpch_pricing(spark, sf_dir):
    """A-family: grouped aggregation with exact DECIMAL money sums
    (TPC-H Q1 shape)."""
    li = _read(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp")
    )
    disc = F.expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(30,4))"
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(F.expr("CAST(l_extendedprice AS DECIMAL(18,2))")).cast("double").alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            F.count("*").alias("n_rows"),
        )
    )


def q_rev_by_nation(spark, sf_dir):
    """J1/J4-family: multi-way join (lineitem⋈orders⋈customer⋈nation,
    nation broadcast) + exact revenue rollup."""
    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    rev = F.expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(30,4))"
    )
    # aggregation BELOW the joins: revenue rolls up to one exact
    # DECIMAL row per orderkey before touching orders, so the
    # order/customer joins carry |orders| pre-summed rows instead of
    # |lineitem| raw rows, and the per-nation countDistinct(o_orderkey)
    # (a two-phase expand at scale) becomes a plain count of the
    # already-distinct orderkeys.  DECIMAL sums are associative, so the
    # rollup of rollups is bit-identical to the flat sum the oracle
    # computes.
    per_order = li.groupBy("l_orderkey").agg(F.sum(rev).alias("o_rev"))
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum("o_rev").cast("double").alias("revenue"),
            F.count("o_orderkey").alias("n_orders"),
        )
    )


def q_top_customers(spark, sf_dir):
    """O2/O3-family: top-10 by exact revenue, deterministic tie-break."""
    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    rev = F.expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(30,4))"
    )
    # same shape as the engine's J4: aggregate below the joins, rank,
    # THEN materialize names.  Revenue pre-aggregates per orderkey, the
    # orders join carries only (o_orderkey, o_custkey), the per-custkey
    # rollup ranks via TakeOrderedAndProject, and the wide customer
    # relation joins against the 10 surviving rows (broadcast) instead
    # of shuffling c_name through the whole aggregation.
    per_order = li.groupBy("l_orderkey").agg(F.sum(rev).alias("o_rev"))
    per_cust = (
        per_order.join(
            orders.select("o_orderkey", "o_custkey"),
            per_order.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(F.sum("o_rev").cast("double").alias("revenue"))
    )
    top = per_cust.orderBy(F.desc("revenue"), F.asc("o_custkey")).limit(10)
    return (
        F.broadcast(top)
        .join(cust, top.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
    )


def q_events_hourly(spark, sf_dir):
    """Streaming-shaped batch op: tumbling 1h window aggregation over the
    events stream table (Structured-Streaming-equivalent plan)."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").start.alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("CAST(value AS DECIMAL(18,2))")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("w", "yyyy-MM-dd HH:mm").alias("hour"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def q_sessionize(spark, sf_dir):
    """Stateful-streaming-shaped batch op: 30-min-gap sessionization per
    user via lag window (applyInPandasWithState batch analog)."""
    ev = _read(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull() | (gap > 1800), 1).otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


def q_running_revenue(spark, sf_dir):
    """Window-function family: daily totals + running cumulative sum.

    Two-level prefix sum, the 100 TB window shape: the running sum is
    computed WITHIN each year partition (Window.partitionBy("y") — no
    single-partition global window), then shifted by the prior years'
    totals via a tiny broadcast non-equi self-join (|years| rows).
    Exact DECIMAL throughout; cast to double only at the output."""
    orders = _read(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d")
    ).agg(
        F.sum(F.expr("CAST(o_totalprice AS DECIMAL(18,2))")).alias("daily_dec")
    ).withColumn("y", F.substring("d", 1, 4))
    wy = W.partitionBy("y").orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    ytot = daily.groupBy("y").agg(F.sum("daily_dec").alias("y_tot"))
    zero = F.lit("0").cast("decimal(38,2)")
    yoff = (
        ytot.alias("a")
        .join(F.broadcast(ytot.alias("b")), F.col("b.y") < F.col("a.y"), "left")
        .groupBy(F.col("a.y").alias("y"))
        .agg(F.coalesce(F.sum("b.y_tot"), zero).alias("y_off"))
    )
    return (
        daily.withColumn("run_y", F.sum("daily_dec").over(wy))
        .join(F.broadcast(yoff), "y")
        .select(
            "d",
            F.col("daily_dec").cast("double").alias("daily"),
            (F.col("run_y") + F.col("y_off")).cast("double").alias("running"),
        )
    )


def q_flagship_engine(spark, sf_dir):
    """Full-analyzer inline BM25 top-10 — the flagship read path.

    The ENTIRE analyzer (tokenizer regex, identifier bypass, stop-set,
    suffix lemmatizer — searchengine_spark/analyzer.py) is deterministic
    regex+table rules, so the DuckDB oracle re-expresses it in ANSI SQL
    (_FLAGSHIP_ANALYZER_SQL) and hash-matches the BM25 top-10 end to
    end; bm25 is rounded to 6 AFTER the unrounded top-k ordering."""
    corpus = corpus_from_documents_table(spark, sf_dir)
    res = inline_search_topk(corpus, "spark query dup", k=10, mode="or")
    return res.select(
        "doc_id", "repo", F.round("bm25", 6).alias("bm25"), "tf_sum"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_tf_postings": q_tf_postings,
        "q_term_stats": q_term_stats,
        "q_doc_lengths": q_doc_lengths,
        "q_corpus_stats": q_corpus_stats,
        "q_search_and_tf": q_search_and_tf,
        "q_search_bm25": q_search_bm25,
        "q_df_prune": q_df_prune,
        "q_missing_terms": q_missing_terms,
        "q_intersection": q_intersection,
        "q_union_distinct": q_union_distinct,
        "q_pagination": q_pagination,
        "q_dedup_exact": q_dedup_exact,
        "q_fingerprint_dups": q_fingerprint_dups,
        "q_minhash_lsh": q_minhash_lsh,
        "q_jaccard_pairs": q_jaccard_pairs,
        "q_simhash": q_simhash,
        "q_simhash_engine": q_simhash_engine,
        "q_simhash_near": q_simhash_near,
        "q_near_dup_components": q_near_dup_components,
        "q_ann_cosine": q_ann_cosine,
        "q_ann_ivf": q_ann_ivf,
        "q_ann_lsh": q_ann_lsh,
        "q_ann_lsh_indexed": q_ann_lsh_indexed,
        "q_embed_neardup": q_embed_neardup,
        "q_media_features": q_media_features,
        "q_frame_schedule": q_frame_schedule,
        "q_token_counts": q_token_counts,
        "q_quality": q_quality,
        "q_langid": q_langid,
        "q_fingerprints": q_fingerprints,
        "q_tpch_pricing": q_tpch_pricing,
        "q_rev_by_nation": q_rev_by_nation,
        "q_top_customers": q_top_customers,
        "q_events_hourly": q_events_hourly,
        "q_sessionize": q_sessionize,
        "q_running_revenue": q_running_revenue,
        "q_flagship_engine": q_flagship_engine,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect of ANSI SQL; views pre-registered)
# ---------------------------------------------------------------------------

_SHINGLES = (
    "WITH ts AS (SELECT doc_id, string_split(trim(regexp_replace(lower(text),"
    " '[^a-z0-9]+', ' ', 'g')), ' ') AS arr FROM documents),\n"
    "sh AS (SELECT DISTINCT doc_id, array_to_string(arr[i:i+2], ' ') AS shingle\n"
    "       FROM ts, unnest(range(1, greatest(len(arr) - 1, 1))) AS r(i)\n"
    "       WHERE len(arr) >= 3)"
)

# Portable MinHash (operators/dedup.py minhash_signatures
# portable=True): ONE md5 per shingle, 32-bit prefix base x, then the
# H universal-hash permutations (a_s*x + b_s) mod 2^31-1 with the SAME
# minhash_coeffs the engine uses — each mh value matches bit-for-bit
# (all operands < 2^63, plain BIGINT arithmetic on both engines).
_MINHASH = (
    _SHINGLES
    + ",\nshx AS (SELECT doc_id,"
    " CAST(('0x' || substr(md5(shingle), 1, 8))::UBIGINT AS BIGINT) AS x"
    " FROM sh),\n"
    + "mh AS (SELECT doc_id, "
    + ", ".join(
        f"min(({a} * x + {b}) % {D.MINHASH_PRIME}) AS mh{s}"
        for s, (a, b) in enumerate(D.minhash_coeffs(8))
    )
    + " FROM shx GROUP BY doc_id)"
)

# 60-bit engine-portable SimHash (see operators/dedup.py simhash64
# portable=True): token hash = numeric value of the first 15 md5 hex
# chars — identical on both engines (Spark conv(_,16,10) == DuckDB
# ('0x'||_)::UBIGINT), so the bit votes and the reassembled sign bits
# match bit-for-bit.
_SIMHASH_BITS = 60
_SIMHASH_CTE = (
    "th AS (SELECT doc_id,"
    " CAST(('0x' || substr(md5(term), 1, 15))::UBIGINT AS BIGINT) AS h FROM toks),\n"
    "votes AS (SELECT doc_id, "
    + ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(_SIMHASH_BITS)
    )
    + " FROM th GROUP BY doc_id),\n"
    "sims AS (SELECT doc_id, CAST("
    + " + ".join(
        f"CASE WHEN b{b} > 0 THEN (1::BIGINT << {b}) ELSE 0 END"
        for b in range(_SIMHASH_BITS)
    )
    + " AS BIGINT) AS simhash FROM votes)"
)


# Full-analyzer oracle for the flagship query: the engine's analyzer
# (searchengine_spark/analyzer.py — tokenizer regex, identifier bypass,
# stop-set, ordered suffix rules) is deterministic regex+table logic,
# re-expressed here in DuckDB SQL so the driver can hash-match the
# inline BM25 read path end to end.  doc ids reproduce
# index/builder.py assign_doc_ids: dense rank over (repo, path,
# commit); corpus_from_documents_table makes path = 'doc-' || lpad(id),
# so ORDER BY (source, doc_id) is the same total order.
_STOPLIST_SQL = ", ".join(repr(w) for w in sorted(STOPWORDS))
_FLAGSHIP_ANALYZER_SQL = rf"""
WITH corpus AS (
  SELECT row_number() OVER (ORDER BY source, doc_id) - 1 AS cid,
         source AS repo, text
  FROM documents
),
rawtoks AS (
  SELECT cid, repo,
         unnest(string_split_regex(trim(regexp_replace(lower(text),
             '[^a-zа-яё0-9/\-\s]', ' ', 'g')), '\s+')) AS tok
  FROM corpus
),
toks AS (
  SELECT cid, repo,
         CASE
           WHEN regexp_full_match(tok, '{IDENT_RE}') THEN tok
           WHEN length(tok) >= 5 AND tok LIKE '%ies'
             THEN substr(tok, 1, length(tok) - 3) || 'y'
           WHEN length(tok) >= 5 AND tok LIKE '%sses'
             THEN substr(tok, 1, length(tok) - 2)
           WHEN length(tok) >= 6 AND tok LIKE '%ing'
             THEN substr(tok, 1, length(tok) - 3)
           WHEN length(tok) >= 5 AND tok LIKE '%ed'
             THEN substr(tok, 1, length(tok) - 2)
           WHEN length(tok) >= 4 AND tok LIKE '%s'
                AND tok NOT LIKE '%ss' AND tok NOT LIKE '%us'
                AND tok NOT LIKE '%is'
             THEN substr(tok, 1, length(tok) - 1)
           ELSE tok
         END AS term
  FROM rawtoks
  WHERE regexp_matches(tok, '[a-zа-яё0-9]')
    AND (regexp_full_match(tok, '{IDENT_RE}')
         OR tok NOT IN ({_STOPLIST_SQL}))
),
ptf AS (SELECT cid, repo, term, count(*) AS tf
        FROM toks GROUP BY cid, repo, term),
dl AS (SELECT cid, CAST(sum(tf) AS DOUBLE) AS dl FROM ptf GROUP BY cid),
consts AS (SELECT (SELECT count(*) FROM dl) AS n,
                  (SELECT avg(dl) FROM dl) AS avgdl),
dfs AS (SELECT term, count(*) AS df FROM ptf
        WHERE term IN ('spark', 'query', 'dup') GROUP BY term),
scored AS (
  SELECT p.cid, p.repo,
         ln(1.0 + (c.n - f.df + 0.5) / (f.df + 0.5)) * p.tf * (1.2 + 1.0)
           / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / c.avgdl)) AS contrib,
         p.tf AS tf
  FROM ptf p JOIN dfs f USING (term) JOIN dl d USING (cid)
             CROSS JOIN consts c
  WHERE p.term IN ('spark', 'query', 'dup')),
agg AS (SELECT cid, repo, sum(contrib) AS bm25_raw,
               CAST(sum(tf) AS BIGINT) AS tf_sum
        FROM scored GROUP BY cid, repo)
SELECT cid AS doc_id, repo, round(bm25_raw, 6) AS bm25, tf_sum
FROM agg ORDER BY bm25_raw DESC, cid LIMIT 10
"""


def oracle_sql() -> dict[str, str]:
    toks = f"WITH toks AS ({_TOKS})"
    return {
        "q_tf_postings": f"""
            {toks}
            SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
        """,
        "q_term_stats": f"""
            {toks}
            SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
            FROM toks GROUP BY term
        """,
        "q_doc_lengths": f"""
            {toks}
            SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id
        """,
        "q_corpus_stats": f"""
            {toks}
            SELECT source, count(DISTINCT doc_id) AS n_docs,
                   count(DISTINCT term) AS n_terms, count(*) AS total_tokens
            FROM toks GROUP BY source
        """,
        "q_search_and_tf": f"""
            {toks},
            ptf AS (SELECT doc_id, term, count(*) AS tf FROM toks
                    WHERE term IN ('spark', 'query') GROUP BY doc_id, term),
            agg AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS tf_sum, count(*) AS n
                    FROM ptf GROUP BY doc_id),
            m AS (SELECT doc_id, tf_sum,
                         round(tf_sum / (max(tf_sum) OVER ()), 6) AS rel
                  FROM agg WHERE n = 2)
            SELECT doc_id, tf_sum, rel FROM m
            ORDER BY tf_sum DESC, doc_id LIMIT 10
        """,
        "q_search_bm25": f"""
            {toks},
            ptf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
            dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM ptf GROUP BY doc_id),
            consts AS (SELECT (SELECT count(*) FROM documents) AS n,
                              (SELECT avg(dl) FROM dl) AS avgdl),
            dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM ptf
                    WHERE term IN ('spark', 'dup') GROUP BY term),
            scored AS (
              SELECT p.doc_id,
                     ln(1 + (c.n - f.df + 0.5) / (f.df + 0.5))
                       * p.tf * (1.2 + 1.0)
                       / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / c.avgdl)) AS contrib
              FROM ptf p JOIN dfs f USING (term)
                         JOIN dl d USING (doc_id)
                         CROSS JOIN consts c
              WHERE p.term IN ('spark', 'dup'))
            SELECT doc_id, round(sum(contrib), 6) AS bm25
            FROM scored GROUP BY doc_id
            ORDER BY bm25 DESC, doc_id LIMIT 10
        """,
        "q_df_prune": f"""
            {toks},
            ts AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term)
            SELECT term, df, (100 * df) // (SELECT count(*) FROM documents) AS pct
            FROM ts
            WHERE (100 * df) // (SELECT count(*) FROM documents) <= {PRUNE_PCT}
        """,
        "q_missing_terms": f"""
            {toks}
            SELECT term FROM (VALUES ('spark'), ('zzznope')) AS q(term)
            WHERE term NOT IN (SELECT DISTINCT term FROM toks)
        """,
        "q_intersection": f"""
            {toks}
            SELECT DISTINCT doc_id FROM toks WHERE term = 'dup'
              AND doc_id IN (SELECT doc_id FROM toks WHERE term = 'spark')
        """,
        "q_union_distinct": f"""
            {toks}
            SELECT doc_id FROM toks WHERE term = 'dup'
            UNION
            SELECT doc_id FROM documents WHERE source = 'src0'
        """,
        "q_pagination": f"""
            {toks},
            ptf AS (SELECT doc_id, count(*) AS tf FROM toks
                    WHERE term = 'join' GROUP BY doc_id),
            ranked AS (SELECT doc_id, tf,
                              row_number() OVER (ORDER BY tf DESC, doc_id) AS rn
                       FROM ptf)
            SELECT doc_id, tf, rn FROM ranked WHERE rn BETWEEN 11 AND 20
        """,
        "q_dedup_exact": """
            SELECT md5(text) AS content_hash, count(*) AS n_dups,
                   min(doc_id) AS min_doc_id
            FROM documents GROUP BY md5(text) HAVING count(*) > 1
        """,
        "q_fingerprint_dups": f"""
            {_SHINGLES},
            fp AS (SELECT d.doc_id,
                          coalesce(m.f, md5(lower(d.text))) AS fingerprint
                   FROM documents d
                   LEFT JOIN (SELECT doc_id, min(md5(shingle)) AS f
                              FROM sh GROUP BY doc_id) m USING (doc_id))
            SELECT fingerprint, count(*) AS n_dups, min(doc_id) AS min_doc_id
            FROM fp GROUP BY fingerprint HAVING count(*) > 1
        """,
        "q_minhash_lsh": f"""
            {_MINHASH},
            banded AS (
              SELECT doc_id, 0 AS band_id, md5(mh0 || '|' || mh1) AS band_key FROM mh
              UNION ALL SELECT doc_id, 1, md5(mh2 || '|' || mh3) FROM mh
              UNION ALL SELECT doc_id, 2, md5(mh4 || '|' || mh5) FROM mh
              UNION ALL SELECT doc_id, 3, md5(mh6 || '|' || mh7) FROM mh)
            SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
            FROM banded l JOIN banded r
              ON l.band_id = r.band_id AND l.band_key = r.band_key
             AND l.doc_id < r.doc_id
        """,
        "q_jaccard_pairs": f"""
            {_SHINGLES},
            sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
            common AS (SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, count(*) AS n_common
                       FROM sh l JOIN sh r
                         ON l.shingle = r.shingle AND l.doc_id < r.doc_id
                       GROUP BY l.doc_id, r.doc_id)
            SELECT doc_a, doc_b,
                   round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
            FROM common
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.2
        """,
        "q_simhash": f"""
            WITH toks AS ({_TOKS}),
            {_SIMHASH_CTE}
            SELECT doc_id, simhash FROM sims
        """,
        "q_simhash_near": f"""
            WITH toks AS ({_TOKS}),
            {_SIMHASH_CTE}
            SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
                   CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
            FROM sims l JOIN sims r ON l.doc_id < r.doc_id
            WHERE bit_count(xor(l.simhash, r.simhash)) <= 3
        """,
        "q_near_dup_components": f"""
            WITH RECURSIVE toks AS ({_TOKS}),
            {_SIMHASH_CTE},
            pairs AS (SELECT l.doc_id AS a, r.doc_id AS b
                      FROM sims l JOIN sims r ON l.doc_id < r.doc_id
                      WHERE bit_count(xor(l.simhash, r.simhash)) <= 3),
            und AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
            reach(node, lab) AS (
              SELECT a, a FROM und
              UNION
              SELECT u.b, r.lab FROM reach r JOIN und u ON u.a = r.node
            )
            SELECT node AS doc_id, CAST(min(lab) AS BIGINT) AS component
            FROM reach GROUP BY node
        """,
        "q_ann_lsh": """
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id,
                   round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                         / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                  CAST(e.embedding AS DOUBLE[])))
                            * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id != 0
            ORDER BY cos DESC, e.vec_id LIMIT 10
        """,
        "q_ann_lsh_indexed": """
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id,
                   round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                         / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                  CAST(e.embedding AS DOUBLE[])))
                            * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id != 0
            ORDER BY cos DESC, e.vec_id LIMIT 10
        """,
        "q_ann_cosine": """
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id,
                   round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                         / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                  CAST(e.embedding AS DOUBLE[])))
                            * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id != 0
            ORDER BY cos DESC, e.vec_id LIMIT 10
        """,
        "q_ann_ivf": """
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv, label AS ql
                       FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id,
                   round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                         / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                  CAST(e.embedding AS DOUBLE[])))
                            * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id != 0 AND e.label = q.ql
            ORDER BY cos DESC, e.vec_id LIMIT 10
        """,
        "q_embed_neardup": """
            SELECT l.vec_id AS id_a, r.vec_id AS id_b,
                   round(list_dot_product(CAST(l.embedding AS DOUBLE[]),
                                          CAST(r.embedding AS DOUBLE[]))
                         / (sqrt(list_dot_product(CAST(l.embedding AS DOUBLE[]),
                                                  CAST(l.embedding AS DOUBLE[])))
                            * sqrt(list_dot_product(CAST(r.embedding AS DOUBLE[]),
                                                    CAST(r.embedding AS DOUBLE[])))), 6) AS cos
            FROM embeddings l JOIN embeddings r ON l.vec_id < r.vec_id
            WHERE round(list_dot_product(CAST(l.embedding AS DOUBLE[]),
                                         CAST(r.embedding AS DOUBLE[]))
                        / (sqrt(list_dot_product(CAST(l.embedding AS DOUBLE[]),
                                                 CAST(l.embedding AS DOUBLE[])))
                           * sqrt(list_dot_product(CAST(r.embedding AS DOUBLE[]),
                                                   CAST(r.embedding AS DOUBLE[])))), 6) >= 0.35
        """,
        "q_media_features": """
            SELECT doc_id,
                   CASE WHEN lang = 'en' THEN 'image' ELSE 'audio' END AS media_type,
                   CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
                   sha256(text) AS payload_sha256
            FROM documents
        """,
        "q_frame_schedule": """
            SELECT doc_id,
                   CAST(row_number() OVER (PARTITION BY doc_id ORDER BY f.ts) - 1 AS BIGINT) AS frame_idx,
                   CAST(f.ts AS BIGINT) AS frame_ts_ms
            FROM documents, unnest(range(0, greatest(CAST(n_chars AS BIGINT) - 1, 0) + 1, 500)) AS f(ts)
        """,
        "q_token_counts": """
            SELECT doc_id,
                   CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_ws_tokens,
                   CAST(len(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '))) AS BIGINT) AS n_unique,
                   CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]+')) AS BIGINT) AS n_bpe_segments
            FROM documents
        """,
        "q_quality": f"""
            {toks},
            agg AS (
              SELECT doc_id, count(*) AS n,
                     CAST(sum(length(term)) AS DOUBLE) AS total_len,
                     count(*) FILTER (WHERE regexp_full_match(term, '[0-9]+')) AS n_digit,
                     count(*) FILTER (WHERE term IN ({", ".join(repr(s) for s in TS.QUALITY_STOPWORDS)})) AS n_stop
              FROM toks GROUP BY doc_id)
            SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
                   round(total_len / n, 6) AS avg_token_len,
                   round(n_digit / CAST(n AS DOUBLE), 6) AS digit_ratio,
                   round(n_stop / CAST(n AS DOUBLE), 6) AS stop_ratio,
                   round(least(n / 100.0, 1.0)
                         * (1.0 - n_digit / CAST(n AS DOUBLE))
                         * (0.5 + 0.5 * least(n_stop / CAST(n AS DOUBLE) * 5.0, 1.0)), 6) AS quality
            FROM agg
        """,
        "q_langid": f"""
            {toks},
            scores AS (
              SELECT doc_id,
                     count(*) FILTER (WHERE term IN ('der','die','das','und','nicht','ist')) AS s_de,
                     count(*) FILTER (WHERE term IN ('el','la','los','que','de','y')) AS s_es,
                     count(*) FILTER (WHERE term IN ('le','la','les','et','est','une')) AS s_fr,
                     count(*) FILTER (WHERE term IN ('de','shi','bu','le','wo','zai')) AS s_zh
              FROM toks GROUP BY doc_id)
            SELECT d.doc_id,
                   CASE WHEN s_zh >= s_fr AND s_zh >= s_es AND s_zh >= s_de AND s_zh > 0 THEN 'zh'
                        WHEN s_fr >= s_es AND s_fr >= s_de AND s_fr > 0 THEN 'fr'
                        WHEN s_es >= s_de AND s_es > 0 THEN 'es'
                        WHEN s_de > 0 THEN 'de'
                        ELSE 'en' END AS lang_pred
            FROM documents d LEFT JOIN scores USING (doc_id)
        """,
        "q_fingerprints": f"""
            {_SHINGLES}
            SELECT d.doc_id, coalesce(m.f, md5(lower(d.text))) AS fingerprint
            FROM documents d
            LEFT JOIN (SELECT doc_id, min(md5(shingle)) AS f FROM sh GROUP BY doc_id) m
              USING (doc_id)
        """,
        "q_tpch_pricing": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                                 * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS sum_disc_price,
                   count(*) AS n_rows
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q_rev_by_nation": """
            SELECT n_name,
                   CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                                 * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
                   count(DISTINCT o_orderkey) AS n_orders
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "q_top_customers": """
            SELECT c_custkey, c_name,
                   CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                                 * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY c_custkey, c_name
            ORDER BY revenue DESC, c_custkey LIMIT 10
        """,
        "q_events_hourly": """
            SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M') AS hour,
                   event_type, count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "q_sessionize": """
            WITH flagged AS (
              SELECT user_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR date_diff('second', lag(ts) OVER w, ts) > 1800
                          THEN 1 ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
                   count(*) AS n_events
            FROM flagged GROUP BY user_id
        """,
        "q_running_revenue": """
            WITH daily AS (
              SELECT strftime(o_orderdate, '%Y-%m-%d') AS d,
                     sum(CAST(o_totalprice AS DECIMAL(18,2))) AS daily_dec
              FROM orders GROUP BY 1)
            SELECT d, CAST(daily_dec AS DOUBLE) AS daily,
                   CAST(sum(daily_dec) OVER (ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
            FROM daily
        """,
        "q_flagship_engine": _FLAGSHIP_ANALYZER_SQL,
    }
