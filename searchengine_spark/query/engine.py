"""Query engine — the read path (reference ``GET /api/search``,
``controllers/ApiController.java:51-54`` ->
``services/SearchServiceImpl.java``).

Three scoring paths over the same index, all returning identical
results (tests assert this):

- ``engine="flat"`` — the M1 DataFrame spine: Catalyst-only plan over
  the flat postings parquet (bucket partition pruning + term pushdown,
  broadcast term stats, groupBy/sum, orderBy/limit).  The
  oracle-comparable path.
- ``engine="wand"`` — the M3 path: encoded posting runs, per-salt
  ``applyInPandas`` vectorized scorer with block-max pruning, per-salt
  top-k merged by a final tiny sort.  The scale path: work is
  distributed over doc-salt subspaces, only the query terms' runs are
  read (partition pruning on bucket + parquet pushdown on term).
- ``engine="local"`` — same WAND kernel, but reading the pruned
  parquet row groups driver-side via pyarrow.dataset.  Skips Spark job
  scheduling entirely: the p50-latency path for interactive queries
  (SURVEY.md §7.2 "Latency"); identical code path for scoring.

Semantics (``mode``):

- ``"and"``  — reference parity: conjunctive intersection, Σtf absolute
  relevance + max-normalized relative relevance
  (SearchServiceImpl.java:116-161), BM25 also reported.
- ``"or"``   — disjunctive BM25 top-k (block-max WAND).
"""

from __future__ import annotations

import json
import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from searchengine_spark.config import IndexConfig
from searchengine_spark.functions.xxhash import bucket_of
from searchengine_spark.index.maintain import (
    tombstone_exclude,
    tombstone_flat_cond,
    tombstone_pads_filter,
)
from searchengine_spark.operators.wand import ExcludeSet, score_salt_group
from searchengine_spark.plans.planner import PlannedQuery, bm25_idf, plan_query
from searchengine_spark.query.snippets import build_snippet
from searchengine_spark.sources.corpus import load_corpus

RESULT_SCHEMA = "doc_id long, bm25 double, tf_sum long"

#: count_matches(engine="local") materializes the query terms' flat
#: postings driver-side; above this many rows it falls back to the
#: distributed count (a head term at 10^12-doc scale must never be
#: pulled onto the driver)
LOCAL_COUNT_MAX_DF = 5_000_000


class SearchEngine:
    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.cfg = IndexConfig(**self.meta["config"])
        self.n_docs = int(self.meta["n_docs"])
        self.avgdl = float(self.meta["avgdl"]) or 1.0
        self._runs_path = os.path.join(index_dir, "postings")
        self._flat_path = os.path.join(index_dir, "stage1_postings")
        #: deletion vector from meta.json tombstones (delete_repo in
        #: tombstone mode) — every scoring path filters through it
        #: until compact() clears it; None on a tombstone-free index
        #: (the common case: zero overhead)
        self._exclude = tombstone_exclude(self.meta)
        #: Spark broadcast of the exclusion id array (non-contiguous
        #: tombstones only) — the distributed scorer ships the handle,
        #: never the array (same contract as _repo_ids_bc_cache)
        self._exclude_ids_bc = None
        self._repo_scope_cache: dict[str, tuple[int, float, int, int]] = {}
        #: repos whose doc ids are NOT a contiguous block (maintenance
        #: added docs after the build) -> sorted id array for scoping
        self._repo_ids_cache: dict[str, "object"] = {}
        #: Spark broadcast handles for those arrays (one broadcast per
        #: repo per engine instance; the distributed scorer ships the
        #: handle in its closure, not the array — VERDICT r3 #6)
        self._repo_ids_bc_cache: dict[str, "object"] = {}
        #: pyarrow.dataset objects memoized per relation: dataset
        #: discovery re-lists the directory tree on every construction,
        #: which the p50 path would otherwise pay per request.  An
        #: engine instance is a read snapshot of the index — after a
        #: maintenance mutation call :meth:`refresh` (reads that race a
        #: dir swap additionally self-heal: _read_table retries once on
        #: FileNotFoundError).
        self._pads_cache: dict[str, "object"] = {}

    def _dataset(self, rel: str, hive: bool = False):
        """Memoized pyarrow dataset over an index relation dir."""
        key = f"{rel}:{hive}"
        if key not in self._pads_cache:
            import pyarrow.dataset as pads

            kwargs = {"format": "parquet"}
            if hive:
                kwargs["partitioning"] = "hive"
            self._pads_cache[key] = pads.dataset(
                os.path.join(self.index_dir, rel), **kwargs
            )
        return self._pads_cache[key]

    def _read_table(self, rel: str, hive: bool = False, **kw):
        """``to_table`` over the memoized dataset, with ONE retry on
        FileNotFoundError: maintenance (index/maintain.py) swaps
        relation dirs via rename, so a memoized dataset can point at
        vanished part files.  The retry rebuilds the dataset against
        the swapped-in files; callers that also hold stale *scalar*
        caches (meta, repo scopes) should call :meth:`refresh`."""
        try:
            return self._dataset(rel, hive=hive).to_table(**kw)
        except FileNotFoundError:
            self._pads_cache.pop(f"{rel}:{hive}", None)
            return self._dataset(rel, hive=hive).to_table(**kw)

    def refresh(self) -> None:
        """Drop every memoized view of the index (pyarrow datasets,
        repo scopes, meta scalars, tombstone vector) and re-read
        meta.json — call on a live engine after a maintenance mutation
        (delete_repo / reindex_doc) instead of constructing a new
        SearchEngine."""
        self._pads_cache.clear()
        self._repo_scope_cache.clear()
        self._repo_ids_cache.clear()
        for bc in self._repo_ids_bc_cache.values():
            try:
                bc.unpersist()
            except Exception:
                pass
        self._repo_ids_bc_cache.clear()
        if self._exclude_ids_bc is not None:
            try:
                self._exclude_ids_bc.unpersist()
            except Exception:
                pass
            self._exclude_ids_bc = None
        with open(os.path.join(self.index_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.cfg = IndexConfig(**self.meta["config"])
        self.n_docs = int(self.meta["n_docs"])
        self.avgdl = float(self.meta["avgdl"]) or 1.0
        self._exclude = tombstone_exclude(self.meta)

    # ------------------------------------------------------------------
    # planning
    # ------------------------------------------------------------------
    def term_info(self, terms: list[str]) -> dict[str, tuple[int, int, int]]:
        """{term: (df, cf, bucket)} — the term dictionary point-lookup (J1).

        Driver-side pyarrow pruned read (predicate pushdown skips row
        groups whose term dictionary misses the query terms): Q terms
        cost one filtered parquet read, no Spark job — the p50 path.
        At 10^12 scale term_stats is still ~vocab-sized (millions of
        rows), well within a pushdown-pruned driver read.
        """
        import pyarrow.dataset as pads

        if not terms:
            return {}
        # hive=True: term_stats is bucket-partitioned (bucket is the
        # dir key, exposed by hive discovery); on a legacy flat layout
        # the same call reads bucket from the file columns
        tbl = self._read_table(
            "term_stats", hive=True,
            filter=pads.field("term").isin(terms),
            columns=["term", "df", "cf", "bucket"],
        )
        return {
            t: (int(df), int(cf), int(b))
            for t, df, cf, b in zip(
                tbl["term"].to_pylist(),
                tbl["df"].to_pylist(),
                tbl["cf"].to_pylist(),
                tbl["bucket"].to_pylist(),
            )
        }

    def repo_scope(self, repo: str) -> tuple[int, float, int, int]:
        """(n_pages, avgdl, doc_id_lo, doc_id_hi) of one repo — driver
        pyarrow pruned read of doc_stats, cached.  A freshly built
        repo's doc ids are contiguous (builder rank order), so scoping
        the scorer is usually a range restriction on the decoded runs;
        when maintenance (reindex_doc new-doc) has broken contiguity —
        detected here via hi-lo+1 != n — the repo's sorted id array is
        cached instead and the scorer filters by exact membership
        (repo-sized, bounded by the repo's own doc count)."""
        if repo not in self._repo_scope_cache:
            import numpy as np
            import pyarrow.compute as pc
            import pyarrow.dataset as pads

            tbl = self._read_table(
                "doc_stats", hive=True,
                filter=pads.field("repo") == repo, columns=["doc_id", "doclen"],
            )
            n = tbl.num_rows
            if n == 0:
                self._repo_scope_cache[repo] = (0, 0.0, 0, -1)
            else:
                lo = int(pc.min(tbl["doc_id"]).as_py())
                hi = int(pc.max(tbl["doc_id"]).as_py())
                self._repo_scope_cache[repo] = (
                    n,
                    float(pc.mean(tbl["doclen"]).as_py() or 0.0),
                    lo,
                    hi,
                )
                if hi - lo + 1 != n:  # maintenance broke contiguity
                    self._repo_ids_cache[repo] = np.sort(
                        tbl["doc_id"].to_numpy().astype(np.uint64)
                    )
        return self._repo_scope_cache[repo]

    def term_repo_df(self, terms: list[str], repo: str) -> dict[str, int]:
        """Per-(term, repo) document frequency — the reference's
        per-site ``lemma.frequency`` lookup (LemmaRepository.java:25-30)
        as a driver-side pruned read of term_repo_stats."""
        import pyarrow.dataset as pads

        if not terms:
            return {}
        # bucket-partitioned layout: prune to the query terms' bucket
        # dirs before the term/repo row-group filters (legacy flat
        # layout has no bucket field — skip the partition filter)
        filt = pads.field("term").isin(terms) & (pads.field("repo") == repo)
        if "bucket" in self._dataset("term_repo_stats", hive=True).schema.names:
            filt = filt & pads.field("bucket").isin(
                sorted({self._bucket_of(t) for t in terms})
            )
        tbl = self._read_table(
            "term_repo_stats", hive=True, filter=filt, columns=["term", "df"]
        )
        return dict(zip(tbl["term"].to_pylist(), (int(x) for x in tbl["df"].to_pylist())))

    def plan(
        self, query: str, repo: str | None = None
    ) -> tuple[PlannedQuery, dict[str, tuple[int, int, int]], tuple[int, float]]:
        """Plan a (possibly repo-scoped) query.

        Returns (plan, global term info3 for bucket routing, scoring
        scope = (N, avgdl)).  Scoped planning follows the reference's
        per-site loop (SearchServiceImpl.java:74-114): the all-terms
        guard, the ``100*df//N`` threshold, the rarest-first order, AND
        the scoring statistics all use the repo's own df and page count
        — a term present globally but absent in this repo short-circuits
        the scoped AND query.
        """
        from searchengine_spark.plans.planner import analyze_query

        terms = analyze_query(query)
        info3 = self.term_info(terms)
        if repo is None:
            plan = plan_query(
                query,
                {t: (df, cf) for t, (df, cf, _) in info3.items()},
                self.n_docs,
                self.cfg.search_filter_pct,
            )
            return plan, info3, (self.n_docs, self.avgdl)
        n_repo, avgdl_repo, _, _ = self.repo_scope(repo)
        rdf = self.term_repo_df(terms, repo)
        plan = plan_query(
            query,
            {t: (df, 0) for t, df in rdf.items()},
            n_repo,
            self.cfg.search_filter_pct,
        )
        return plan, info3, (n_repo, avgdl_repo or 1.0)

    # ------------------------------------------------------------------
    # scoring paths
    # ------------------------------------------------------------------
    def search_df(
        self,
        query: str,
        k: int = 10,
        mode: str = "and",
        engine: str = "wand",
        repo: str | None = None,
        planned: tuple | None = None,
    ) -> DataFrame:
        """Top-k as a DataFrame (doc_id, bm25, tf_sum), deterministic
        order (bm25 desc, doc_id asc).  ``planned`` lets callers reuse
        an already-computed ``plan()`` result (one term-dictionary read
        per request, not one per phase — the p50 path)."""
        plan, info3, scope = planned if planned is not None else self.plan(query, repo)
        if plan.empty and mode == "and":
            return self.spark.createDataFrame([], RESULT_SCHEMA)
        if not plan.ordered:
            return self.spark.createDataFrame([], RESULT_SCHEMA)
        if engine == "flat":
            return self._search_flat(plan, k, mode, repo, scope)
        if engine == "local":
            pdf = self._search_local(plan, info3, k, mode, repo, scope)
            return self.spark.createDataFrame(pdf, RESULT_SCHEMA)
        return self._search_wand(plan, info3, k, mode, repo, scope)

    def _idf_map(self, plan: PlannedQuery, n_docs: int) -> dict[str, float]:
        return {t: bm25_idf(df, n_docs) for t, df, _ in plan.ordered}

    def _search_flat(
        self,
        plan: PlannedQuery,
        k: int,
        mode: str,
        repo: str | None,
        scope: tuple[int, float],
    ) -> DataFrame:
        """Catalyst-only scoring over flat postings (M1 spine).

        Plan shape: pruned parquet scan (bucket dirs + term pushdown)
        -> broadcast join with the Q-row idf relation -> hash aggregate
        per doc -> top-k sort.  No Python in the loop.
        """
        spark = self.spark
        n_docs, avgdl = scope
        terms = [t for t, _, _ in plan.ordered]
        idfs = self._idf_map(plan, n_docs)
        buckets = sorted({self._bucket_of(t) for t in terms})
        flat = spark.read.parquet(self._flat_path).where(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )
        if repo is not None:
            flat = flat.where(F.col("repo") == repo)
        tcond = tombstone_flat_cond(self.meta)
        if tcond is not None:
            flat = flat.where(tcond)
        idf_df = spark.createDataFrame(
            [(t, float(idfs[t])) for t in terms], "term string, idf double"
        )
        k1, b = self.cfg.bm25_k1, self.cfg.bm25_b
        scored = flat.join(F.broadcast(idf_df), "term").withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl)),
        )
        agg = scored.groupBy("doc_id").agg(
            F.sum("contrib").alias("bm25"),
            F.sum("tf").cast("long").alias("tf_sum"),
            F.count("*").alias("n_terms"),
        )
        if mode == "and":
            agg = agg.where(F.col("n_terms") == len(terms))
        return (
            agg.select("doc_id", "bm25", "tf_sum")
            .orderBy(F.desc("bm25"), F.asc("doc_id"))
            .limit(k)
        )

    def _bucket_of(self, term: str) -> int:
        return bucket_of(term, self.cfg.n_buckets)

    def _runs_df(self, plan: PlannedQuery, repo: str | None) -> DataFrame:
        terms = [t for t, _, _ in plan.ordered]
        buckets = sorted({self._bucket_of(t) for t in terms})
        runs = self.spark.read.parquet(self._runs_path).where(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )
        return runs

    def _doc_range(self, repo: str | None):
        """Scoring scope for one repo: a contiguous (lo, hi) range, or
        the repo's sorted doc-id array when contiguity was broken by
        maintenance (TermRuns handles both)."""
        if repo is None:
            return None
        _, _, lo, hi = self.repo_scope(repo)
        ids = self._repo_ids_cache.get(repo)
        return ids if ids is not None else (lo, hi)

    def _search_wand(
        self,
        plan: PlannedQuery,
        info3: dict,
        k: int,
        mode: str,
        repo: str | None,
        scope: tuple[int, float],
    ) -> DataFrame:
        """Distributed per-salt scoring (see module docstring).  Repo
        scoping stays on the compressed-index path: the scorer restricts
        itself to the repo's contiguous doc-id range via block metadata
        (TermRuns.doc_range) — no flat fallback."""
        n_docs, avgdl = scope
        idfs = self._idf_map(plan, n_docs)
        k1, b = self.cfg.bm25_k1, self.cfg.bm25_b
        mode_and = mode == "and"
        n_query_terms = len(plan.ordered)
        doc_range = self._doc_range(repo)
        # a non-contiguous repo's id array goes to executors as a Spark
        # broadcast (once per repo per engine), NOT inside every task
        # closure — a 10^9-doc repo would otherwise serialize a
        # multi-GB array per task (VERDICT r3 #6)
        ids_bc = None
        if doc_range is not None and not isinstance(doc_range, tuple):
            if repo not in self._repo_ids_bc_cache:
                self._repo_ids_bc_cache[repo] = (
                    self.spark.sparkContext.broadcast(doc_range)
                )
            ids_bc = self._repo_ids_bc_cache[repo]
            doc_range = None  # keep the array itself out of the closure
        # tombstone deletion vector: ranges are tiny (ride the closure);
        # a non-contiguous id array goes out as a broadcast handle
        ex_ranges, ex_ids_bc = (), None
        if self._exclude is not None:
            ex_ranges = tuple(self._exclude.ranges)
            if self._exclude.ids is not None:
                if self._exclude_ids_bc is None:
                    self._exclude_ids_bc = self.spark.sparkContext.broadcast(
                        self._exclude.ids
                    )
                ex_ids_bc = self._exclude_ids_bc

        def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
            term_rows: dict[str, list[dict]] = {}
            for row in pdf.to_dict("records"):
                term_rows.setdefault(row["term"], []).append(row)
            if mode_and and len(term_rows) < n_query_terms:
                return pd.DataFrame(
                    {"doc_id": pd.Series(dtype="int64"),
                     "bm25": pd.Series(dtype="float64"),
                     "tf_sum": pd.Series(dtype="int64")}
                )
            exclude = None
            if ex_ranges or ex_ids_bc is not None:
                exclude = ExcludeSet(
                    ex_ranges, ex_ids_bc.value if ex_ids_bc is not None else None
                )
            docs, bm, tf = score_salt_group(
                term_rows, idfs, k, mode_and, k1, b, avgdl,
                doc_range=ids_bc.value if ids_bc is not None else doc_range,
                exclude=exclude,
            )
            return pd.DataFrame(
                {"doc_id": docs.astype("int64"), "bm25": bm, "tf_sum": tf}
            )

        per_salt = self._runs_df(plan, repo).groupBy("salt").applyInPandas(
            score_group, schema=RESULT_SCHEMA
        )
        return per_salt.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(k)

    def _search_local(
        self,
        plan: PlannedQuery,
        info3: dict,
        k: int,
        mode: str,
        repo: str | None,
        scope: tuple[int, float],
    ) -> pd.DataFrame:
        """Driver-local scoring via pyarrow.dataset pruned reads."""
        import pyarrow.dataset as pads

        terms = [t for t, _, _ in plan.ordered]
        buckets = sorted({info3[t][2] for t in terms if t in info3})
        filt = (pads.field("bucket").isin(buckets)) & (pads.field("term").isin(terms))
        tbl = self._read_table("postings", hive=True, filter=filt)
        pdf = tbl.to_pandas()
        n_docs, avgdl = scope
        idfs = self._idf_map(plan, n_docs)
        k1, b = self.cfg.bm25_k1, self.cfg.bm25_b
        mode_and = mode == "and"
        doc_range = self._doc_range(repo)
        outs = []
        for _, grp in pdf.groupby("salt"):
            term_rows: dict[str, list[dict]] = {}
            for row in grp.to_dict("records"):
                term_rows.setdefault(row["term"], []).append(row)
            if mode_and and len(term_rows) < len(terms):
                continue
            docs, bm, tf = score_salt_group(
                term_rows, idfs, k, mode_and, k1, b, avgdl,
                doc_range=doc_range, exclude=self._exclude,
            )
            outs.append(pd.DataFrame({"doc_id": docs.astype("int64"), "bm25": bm, "tf_sum": tf}))
        if not outs:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "bm25": pd.Series(dtype="float64"), "tf_sum": pd.Series(dtype="int64")})
        allr = pd.concat(outs, ignore_index=True)
        allr = allr.sort_values(["bm25", "doc_id"], ascending=[False, True], kind="mergesort")
        return allr.head(k).reset_index(drop=True)

    # ------------------------------------------------------------------
    # public API mirroring the reference REST surface
    # ------------------------------------------------------------------
    def search(
        self,
        query: str,
        offset: int = 0,
        limit: int = 10,
        repo: str | None = None,
        mode: str = "and",
        engine: str = "local",
        with_snippets: bool = True,
        with_count: bool = True,
    ) -> dict:
        """Reference ``SearchResponse`` shape
        (``dto/search/SearchResponse.java:8-13``, ``SearchData.java:6-13``):
        {result, count, data: [{site, siteName, uri, title, snippet,
        relevance}]} with site->repo, uri->path.

        ``with_count=False`` skips the pre-pagination total (a second
        postings read) and reports ``count=-1`` — the cheap path when a
        caller only wants the page.
        """
        if not query.strip():
            return {"result": False, "error": "Empty search query"}
        if offset < 0 or limit <= 0:
            return {"result": False, "error": "offset must be >= 0 and limit > 0"}
        planned = self.plan(query, repo)
        plan, info3, _ = planned
        if mode == "and" and plan.empty:
            return {"result": True, "count": 0, "data": []}
        k = offset + limit
        df = self.search_df(
            query, k=k, mode=mode, engine=engine, repo=repo, planned=planned
        )
        rows = df.collect() if isinstance(df, DataFrame) else list(df.itertuples())
        # count AND the relevance normalizer come from ONE matched-set
        # scan: the reference computes maxRank over ALL matched docs
        # BEFORE pagination (SearchServiceImpl.java:149-151), so a doc's
        # relevance is page-invariant and independent of the BM25 top-k
        # cut.  with_count=False skips that scan (the cheap path) and
        # normalizes by the max over the k collected rows instead — a
        # documented deviation bounded to that path.
        if with_count:
            total, max_tf = self._match_stats(plan, info3, mode, repo, engine)
        else:
            total = -1
            max_tf = max(
                (int(r.tf_sum if hasattr(r, "tf_sum") else r["tf_sum"]) for r in rows),
                default=0,
            )
        page = rows[offset: offset + limit]
        if not page:
            return {"result": True, "count": total, "data": []}

        doc_ids = [int(r.doc_id if hasattr(r, "doc_id") else r["doc_id"]) for r in page]
        scores = [float(r.bm25 if hasattr(r, "bm25") else r["bm25"]) for r in page]
        tf_sums = [int(r.tf_sum if hasattr(r, "tf_sum") else r["tf_sum"]) for r in page]
        max_tf = max_tf or 1
        docs_meta = self._doc_meta(doc_ids, need_content=with_snippets)
        qterms = {t for t, _, _ in plan.ordered}
        data = []
        for doc_id, score, tfs in zip(doc_ids, scores, tf_sums):
            m = docs_meta.get(doc_id, {})
            snippet = ""
            if with_snippets and "content" in m:
                snippet = build_snippet(m["content"], qterms)
            data.append(
                {
                    "site": m.get("repo", ""),
                    "siteName": m.get("repo", ""),
                    "uri": m.get("path", ""),
                    "title": m.get("path", "").rsplit("/", 1)[-1],
                    "snippet": snippet,
                    "relevance": tfs / max_tf if max_tf else 0.0,
                    "bm25": score,
                    "doc_id": doc_id,
                }
            )
        return {"result": True, "count": total, "data": data}

    def count_matches(
        self,
        query: str,
        mode: str = "and",
        repo: str | None = None,
        engine: str = "local",
        planned: tuple | None = None,
    ) -> int:
        """Total hit count pre-pagination (reference ``count``,
        SearchServiceImpl.java:171,200).

        ``engine="local"``: pyarrow pruned read of the flat postings
        (bucket dirs + term pushdown), pandas distinct/AND count — no
        Spark job.  Guard rail: when the query terms' summed global df
        exceeds ``LOCAL_COUNT_MAX_DF`` the local path would materialize
        that many rows on the driver, so it falls through to the
        distributed plan regardless of what the caller asked for.
        """
        plan, info3, _ = planned if planned is not None else self.plan(query, repo)
        return self._match_stats(plan, info3, mode, repo, engine)[0]

    def _match_stats(
        self,
        plan: PlannedQuery,
        info3: dict,
        mode: str,
        repo: str | None,
        engine: str = "local",
    ) -> tuple[int, int]:
        """(total matches, max Σtf) over the FULL matched-doc set,
        pre-pagination, from ONE pruned scan of the flat postings.

        The reference computes both on the same pass: ``count`` over
        all matched pages (SearchServiceImpl.java:171,200) and
        ``maxRank`` = max absolute relevance over ALL matched docs
        BEFORE pagination (:149-151) — so a doc's reported relevance is
        page-invariant.  Engine/guard-rail semantics are
        :meth:`count_matches`'s (local pyarrow path capped by
        ``LOCAL_COUNT_MAX_DF``, distributed fallback above it).
        """
        if not plan.ordered or (mode == "and" and plan.empty):
            return 0, 0
        terms = [t for t, _, _ in plan.ordered]
        buckets = sorted({self._bucket_of(t) for t in terms})
        total_df = sum(info3[t][0] for t in terms if t in info3)
        if engine == "local" and total_df > LOCAL_COUNT_MAX_DF:
            engine = "spark"
        if engine == "local":
            import pyarrow.dataset as pads

            filt = pads.field("bucket").isin(buckets) & pads.field("term").isin(terms)
            if repo is not None:
                filt = filt & (pads.field("repo") == repo)
            tfilt = tombstone_pads_filter(self.meta)
            if tfilt is not None:
                filt = filt & tfilt
            pdf = self._read_table(
                "stage1_postings", hive=True,
                filter=filt, columns=["doc_id", "term", "tf"],
            ).to_pandas()
            if pdf.empty:
                return 0, 0
            per_doc = pdf.groupby("doc_id").agg(
                n=("term", "nunique"), tf_sum=("tf", "sum")
            )
            if mode == "and":
                per_doc = per_doc[per_doc["n"] == len(terms)]
            if per_doc.empty:
                return 0, 0
            return int(len(per_doc)), int(per_doc["tf_sum"].max())
        flat = self.spark.read.parquet(self._flat_path).where(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )
        if repo is not None:
            flat = flat.where(F.col("repo") == repo)
        tcond = tombstone_flat_cond(self.meta)
        if tcond is not None:
            flat = flat.where(tcond)
        per_doc = flat.groupBy("doc_id").agg(
            F.countDistinct("term").alias("n"),
            F.sum("tf").cast("long").alias("tf_sum"),
        )
        if mode == "and":
            per_doc = per_doc.where(F.col("n") == len(terms))
        row = per_doc.agg(
            F.count("*").alias("total"), F.max("tf_sum").alias("mx")
        ).collect()[0]
        return int(row["total"]), int(row["mx"] or 0)

    @staticmethod
    def _doc_keys_condition(metas: list[dict]):
        """OR-of-(repo ∧ path) conjunctions over k result rows: pushes
        down on BOTH plain columns, so the parquet reader prunes row
        groups instead of scanning the corpus — a computed concat_ws
        key would defeat pushdown and turn every store_content=False
        snippet fetch into a full 100 TB scan (VERDICT r3 #3;
        plan-asserted in tools/capture_plans.py)."""
        cond = None
        for m in metas:
            c = (F.col("repo") == m["repo"]) & (F.col("path") == m["path"])
            cond = c if cond is None else cond | c
        return cond

    def _doc_meta(self, doc_ids: list[int], need_content: bool = True) -> dict[int, dict]:
        """Materialize doc metadata (+ content when snippets are wanted)
        for k result rows only (join AFTER top-k — J4,
        SearchServiceImpl.java:176).  Driver-side pyarrow pruned read:
        hive partition pruning on ``ds_part = pmod(doc_id, P)`` (the
        builder's layout) skips every partition dir the k ids don't
        hash into, then row-group statistics on doc_id prune within
        them; no Spark job on the p50 path.  ``need_content=False``
        additionally skips the wide content column entirely."""
        import pyarrow.dataset as pads

        ds = self._dataset("doc_stats", hive=True)
        cols = [f.name for f in ds.schema]
        if not need_content and "content" in cols:
            cols = [c for c in cols if c != "content"]
        filt = pads.field("doc_id").isin(doc_ids)
        if "ds_part" in cols:
            cols = [c for c in cols if c != "ds_part"]
            parts = sorted({d % self.cfg.doc_stats_parts for d in doc_ids})
            filt = pads.field("ds_part").isin(parts) & filt
        tbl = self._read_table("doc_stats", hive=True, filter=filt, columns=cols)
        out = {int(m["doc_id"]): m for m in tbl.to_pylist()}
        if not need_content:
            return out
        if out and "content" in next(iter(out.values())):
            return out  # built with store_content=True
        src = self.meta.get("source")
        if src and out:
            try:
                corpus = load_corpus(self.spark, src)
                crows = corpus.where(
                    self._doc_keys_condition(list(out.values()))
                ).select(
                    "repo", "path", "content"
                ).collect()
                by_key = {(r["repo"], r["path"]): r["content"] for r in crows}
                for m in out.values():
                    m["content"] = by_key.get((m["repo"], m["path"]), "")
            except Exception:
                pass
        return out

    # ------------------------------------------------------------------
    # statistics (reference GET /api/statistics,
    # services/StatisticsServiceImpl.java:31-62)
    # ------------------------------------------------------------------
    def statistics_df(self) -> DataFrame:
        """Per-repo statistics as a DataFrame — the 10^8-repo form of
        :meth:`statistics` (which collects per-repo rows to the driver
        for the reference's small-site-list response shape; SCALE.md
        §8).  Columns: (repo, pages, lemmas)."""
        ds = self.spark.read.parquet(os.path.join(self.index_dir, "doc_stats"))
        trs = self.spark.read.parquet(
            os.path.join(self.index_dir, "term_repo_stats")
        )
        pages = ds.groupBy("repo").agg(F.count("*").alias("pages"))
        lemmas = trs.groupBy("repo").agg(
            F.countDistinct("term").alias("lemmas")
        )
        return (
            pages.join(lemmas, "repo", "left")
            .select(
                "repo",
                "pages",
                F.coalesce("lemmas", F.lit(0)).cast("long").alias("lemmas"),
            )
        )

    def statistics(self) -> dict:
        """Reference ``GET /api/statistics``
        (``StatisticsServiceImpl.java:31-62``): totals + per-site rows
        with the LIVE build state — ``indexing`` and each row's
        status/statusTime/error come from the builder's persisted state
        machine (``_checkpoints/build.json``, the ``site.status``
        analog), not a hardcoded flag.  The engine tracks one state per
        index (builds are whole-corpus), so every detailed row carries
        the index-level status."""
        from searchengine_spark.index.builder import read_build_status

        build = read_build_status(self.index_dir) or {
            "status": "INDEXED",
            "status_time": None,
            "last_error": None,
        }
        ds = self.spark.read.parquet(os.path.join(self.index_dir, "doc_stats"))
        trs = self.spark.read.parquet(os.path.join(self.index_dir, "term_repo_stats"))
        pages = {r["repo"]: r["n"] for r in ds.groupBy("repo").agg(F.count("*").alias("n")).collect()}
        lemmas = {
            r["repo"]: r["n"]
            for r in trs.groupBy("repo").agg(F.countDistinct("term").alias("n")).collect()
        }
        detailed = [
            {
                "url": repo,
                "name": repo,
                "pages": int(pages.get(repo, 0)),
                "lemmas": int(lemmas.get(repo, 0)),
                "status": build["status"],
                "statusTime": build["status_time"],
                "error": build["last_error"],
            }
            for repo in sorted(pages)
        ]
        return {
            "result": True,
            "statistics": {
                "total": {
                    "sites": len(pages),
                    "pages": int(sum(pages.values())),
                    "lemmas": int(self.meta["n_terms"]),
                    "indexing": build["status"] == "INDEXING",
                },
                "detailed": detailed,
            },
        }
