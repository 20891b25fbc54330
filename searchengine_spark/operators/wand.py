"""Top-k scoring over encoded posting runs — the custom physical
operator Spark lacks (SURVEY.md §2.3 J3, §2.8).

Replaces the reference's in-memory posting intersection + Σtf scoring
(``services/SearchServiceImpl.java:116-147``) with a vectorized,
doc-salt-parallel scorer:

- every posting run with salt ``r`` covers the doc subspace
  ``doc_id ≡ r (mod S)`` for *every* term, so each salt group can be
  scored independently and the per-salt top-k merged at the end — that
  is the distribution strategy (no doc appears in two salt groups);
- inside a salt group everything is NumPy: searchsorted-based galloping
  intersection for AND, bincount-style accumulation for OR, and a
  batch-style *block-max* pruning pass (BMW re-shaped for vectorized
  execution) that only decodes blocks whose upper bound can still make
  the current top-k.

Scoring modes (both computed in one pass):

- ``tf``   — reference parity: Σ tf over query terms
  (SearchServiceImpl.java:141-147);
- ``bm25`` — engine scoring: Σ idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
  (SURVEY.md §2.9).
"""

from __future__ import annotations

import numpy as np

from searchengine_spark.index.format import decode_run


class ExcludeSet:
    """Tombstoned doc ids (a Lucene-style deletion vector, applied at
    read time): contiguous ``(lo, hi)`` ranges — the shape a repo purge
    leaves when the builder's rank order gave it a contiguous id block
    — plus an optional sorted id array for repos whose contiguity
    maintenance had broken.  ``delete_repo(mode="tombstone")`` records
    these in meta.json; every scoring path filters decoded postings
    through :meth:`keep` until ``compact()`` rewrites them away
    (index/maintain.py).  Unlike ``TermRuns.doc_range`` (an INCLUDE
    scope that can prune whole blocks), exclusion cannot skip blocks —
    a block overlapping a tombstone may still hold live docs — so this
    is a post-decode mask only."""

    __slots__ = ("ranges", "ids")

    def __init__(self, ranges=(), ids=None):
        self.ranges = [(int(lo), int(hi)) for lo, hi in ranges]
        self.ids = (
            np.asarray(ids, dtype=np.uint64) if ids is not None and len(ids) else None
        )

    def __bool__(self) -> bool:
        return bool(self.ranges) or self.ids is not None

    def keep(self, d: np.ndarray) -> np.ndarray:
        """Bool mask over doc ids ``d``: True = NOT tombstoned."""
        m = np.ones(d.shape, dtype=bool)
        for lo, hi in self.ranges:
            m &= (d < np.uint64(lo)) | (d > np.uint64(hi))
        if self.ids is not None:
            pos = np.minimum(np.searchsorted(self.ids, d), self.ids.size - 1)
            m &= self.ids[pos] != d
        return m

    def overlaps(self, first: np.ndarray, last: np.ndarray) -> np.ndarray:
        """Per-interval bool over ``[first, last]`` id ranges: may the
        interval contain a tombstoned id?  Used by ``compact()`` to
        forward untouched posting runs without decoding them."""
        first = np.asarray(first, dtype=np.uint64)
        last = np.asarray(last, dtype=np.uint64)
        m = np.zeros(first.shape, dtype=bool)
        for lo, hi in self.ranges:
            m |= (last >= np.uint64(lo)) & (first <= np.uint64(hi))
        if self.ids is not None:
            lo_pos = np.searchsorted(self.ids, first, side="left")
            hi_pos = np.searchsorted(self.ids, last, side="right")
            m |= hi_pos > lo_pos
        return m


def _bm25_scores(
    tfs: np.ndarray, dls: np.ndarray, idf: float, k1: float, b: float, avgdl: float
) -> np.ndarray:
    tf = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    denom = tf + k1 * (1.0 - b + b * dl / avgdl)
    return idf * tf * (k1 + 1.0) / denom


def _block_ub(
    max_tf: np.ndarray, min_dl: np.ndarray, idf: float, k1: float, b: float, avgdl: float
) -> np.ndarray:
    """Per-block BM25 upper bound: achieved at (max_tf, min_dl)."""
    return _bm25_scores(max_tf, min_dl, idf, k1, b, avgdl)


class TermRuns:
    """All runs of one term within one salt group, lazily decodable.

    ``doc_range`` restricts every decode to a doc-id subspace using
    block metadata first (skip whole blocks that cannot contain a
    selected doc) — the repo-scoped read path.  Two forms:

    - ``(lo, hi)`` tuple — contiguous range (builder rank order gives
      every freshly built repo a contiguous id block);
    - sorted ``np.ndarray`` of doc ids — exact membership, used when
      maintenance (reindex_doc adding a doc to an existing repo) has
      broken contiguity; searchsorted per block keeps the pruning.
    """

    def __init__(
        self,
        rows: list[dict],
        idf: float,
        k1: float,
        b: float,
        avgdl: float,
        doc_range: "tuple[int, int] | np.ndarray | None" = None,
        exclude: "ExcludeSet | None" = None,
    ):
        self.rows = rows
        self.idf = idf
        self.k1, self.b, self.avgdl = k1, b, avgdl
        self.exclude = exclude if exclude else None
        if isinstance(doc_range, np.ndarray):
            self._ids = np.asarray(doc_range, dtype=np.uint64)
            self.doc_range = (
                (int(self._ids[0]), int(self._ids[-1]))
                if self._ids.size
                else (0, -1)
            )
        else:
            self._ids = None
            self.doc_range = doc_range
        self.df = sum(int(r["df_run"]) for r in rows)
        self._decoded: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None

    def block_overlap(self, r) -> np.ndarray:
        """Per-block bool: may the block's [first, last] contain a
        selected doc?  All-true when unscoped."""
        first = np.asarray(r["block_first"], dtype=np.uint64)
        if self.doc_range is None:
            return np.ones(first.shape, dtype=bool)
        last = np.asarray(r["block_last"], dtype=np.uint64)
        if self._ids is not None:
            if self._ids.size == 0:
                return np.zeros(first.shape, dtype=bool)
            lo_pos = np.searchsorted(self._ids, first, side="left")
            hi_pos = np.searchsorted(self._ids, last, side="right")
            return hi_pos > lo_pos
        lo, hi = self.doc_range
        if hi < lo:
            return np.zeros(first.shape, dtype=bool)
        return (last >= np.uint64(lo)) & (first <= np.uint64(hi))

    def _range_filter(self, d, t, l):
        """Include-scope (doc_range) AND tombstone-exclusion mask.  All
        scoring paths funnel decoded postings through here: decode_all
        directly, the pruned-OR phase-B explicitly, and lookup's probe
        docs transitively (probes come from another term's decode)."""
        if self.exclude is not None and d.size:
            m = self.exclude.keep(d)
            d, t, l = d[m], t[m], l[m]
        if self.doc_range is None or d.size == 0:
            return d, t, l
        if self._ids is not None:
            if self._ids.size == 0:
                m = np.zeros(d.shape, dtype=bool)
            else:
                pos = np.minimum(
                    np.searchsorted(self._ids, d), self._ids.size - 1
                )
                m = self._ids[pos] == d
            return d[m], t[m], l[m]
        lo, hi = self.doc_range
        if hi < lo:  # empty scope; uint64(hi) would wrap to 2^64-1
            m = np.zeros(d.shape, dtype=bool)
        else:
            m = (d >= np.uint64(lo)) & (d <= np.uint64(hi))
        return d[m], t[m], l[m]

    def block_bounds(self) -> float:
        """Max BM25 upper bound over all (in-range) blocks of this term."""
        ub = 0.0
        for r in self.rows:
            keep = self.block_overlap(r)
            mt = np.asarray(r["block_max_tf"], dtype=np.float64)[keep]
            md = np.asarray(r["block_min_dl"], dtype=np.float64)[keep]
            if mt.size:
                ub = max(ub, float(_block_ub(mt, md, self.idf, self.k1, self.b, self.avgdl).max()))
        return ub

    def decode_all(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        if self._decoded is None:
            ds, ts, ls = [], [], []
            for r in self.rows:
                if self.doc_range is None:
                    d, t, l = decode_run(r)
                else:  # decode only blocks overlapping the range
                    ids = np.flatnonzero(self.block_overlap(r))
                    if ids.size == 0:
                        continue
                    d, t, l = decode_run(r, ids)
                ds.append(d)
                ts.append(t)
                ls.append(l)
            d = np.concatenate(ds) if ds else np.empty(0, dtype=np.uint64)
            t = np.concatenate(ts) if ts else np.empty(0, dtype=np.uint64)
            l = np.concatenate(ls) if ls else np.empty(0, dtype=np.uint64)
            d, t, l = self._range_filter(d, t, l)
            order = np.argsort(d, kind="mergesort")  # runs may interleave doc ranges
            self._decoded = (d[order], t[order], l[order])
        return self._decoded

    def decode_selected(self, keep_mask_per_row: list[np.ndarray]):
        """Decode only the chosen blocks of each run (skip-pointer path)."""
        ds, ts, ls = [], [], []
        for r, mask in zip(self.rows, keep_mask_per_row):
            ids = np.flatnonzero(mask)
            if ids.size == 0:
                continue
            d, t, l = decode_run(r, ids)
            ds.append(d)
            ts.append(t)
            ls.append(l)
        if not ds:
            z = np.empty(0, dtype=np.uint64)
            return z, z.copy(), z.copy()
        d = np.concatenate(ds)
        t = np.concatenate(ts)
        l = np.concatenate(ls)
        order = np.argsort(d, kind="mergesort")
        return d[order], t[order], l[order]

    def lookup(self, docs: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(found_mask, tf, dl) for the given sorted doc ids.

        Block-selective: only decodes blocks whose [first, last] range
        intersects the probe set — the skip-pointer read path.
        """
        masks = []
        for r in self.rows:
            first = np.asarray(r["block_first"], dtype=np.uint64)
            last = np.asarray(r["block_last"], dtype=np.uint64)
            # block may contain a probe iff some probe is in [first, last]
            lo = np.searchsorted(docs, first, side="left")
            hi = np.searchsorted(docs, last, side="right")
            masks.append(hi > lo)
        d, t, l = self.decode_selected(masks)
        if d.size == 0:
            z = np.zeros(docs.shape, dtype=np.int64)
            return np.zeros(docs.shape, dtype=bool), z, z.copy()
        pos = np.searchsorted(d, docs)
        pos_c = np.minimum(pos, d.size - 1)
        found = d[pos_c] == docs
        tf = np.where(found, t[pos_c], 0)
        dl = np.where(found, l[pos_c], 0)
        return found, tf.astype(np.int64), dl.astype(np.int64)

    def score(self, tfs: np.ndarray, dls: np.ndarray) -> np.ndarray:
        return _bm25_scores(tfs, dls, self.idf, self.k1, self.b, self.avgdl)


def _topk(docs: np.ndarray, bm25: np.ndarray, tf_sum: np.ndarray, k: int):
    """Exact top-k by (bm25 desc, doc_id asc) — pinned tie-break."""
    if docs.size == 0:
        return docs, bm25, tf_sum
    if docs.size > k:
        # candidates = everything >= the kth score (keeps exact ties for
        # the deterministic doc_id tie-break), then sort just those
        kth = -np.partition(-bm25, k - 1)[k - 1]
        cand = np.flatnonzero(bm25 >= kth)
    else:
        cand = np.arange(docs.size)
    order = np.lexsort((docs[cand], -bm25[cand]))
    cand = cand[order][:k]
    return docs[cand], bm25[cand], tf_sum[cand]


def score_salt_group(
    term_rows: dict[str, list[dict]],
    term_meta: dict[str, float],
    k: int,
    mode_and: bool,
    k1: float,
    b: float,
    avgdl: float,
    prune: bool = True,
    doc_range: "tuple[int, int] | np.ndarray | None" = None,
    exclude: "ExcludeSet | None" = None,
):
    """Score one salt group.  Returns (doc_ids, bm25, tf_sum) top-k.

    ``term_rows``: term -> list of run rows (dict-like) in this salt.
    ``term_meta``: term -> idf.
    ``mode_and``: True = conjunctive (reference semantics, every term
    must match); False = disjunctive BM25 top-k with block-max pruning.
    ``doc_range``: restrict scoring to a doc-id subspace (repo scoping
    — the per-site loop of SearchServiceImpl.java:74-82): a contiguous
    (lo, hi) range, or a sorted id array when maintenance broke the
    repo's contiguity (see TermRuns).
    ``exclude``: tombstoned doc ids (delete_repo deletion vector) —
    filtered out of every decode until ``compact()``.
    """
    terms = [
        TermRuns(rows, term_meta[t], k1, b, avgdl, doc_range, exclude)
        for t, rows in term_rows.items()
    ]
    terms.sort(key=lambda tr: tr.df)  # rarest first (SearchServiceImpl:112)
    if not terms:
        z = np.empty(0, dtype=np.uint64)
        return z, np.empty(0), np.empty(0, dtype=np.int64)

    if mode_and:
        return _score_and(terms, k)
    if prune and len(terms) > 1:
        return _score_or_pruned(terms, k)
    return _score_or_exhaustive(terms, k)


def _score_and(terms: list["TermRuns"], k: int):
    """Conjunctive: galloping intersection, rarest list drives.

    Candidates = rarest term's postings; every other term filters them
    via block-selective searchsorted lookup (the reference's
    ``retainAll`` loop, SearchServiceImpl.java:125-137, with early exit
    on empty).
    """
    docs, tfs, dls = terms[0].decode_all()
    tf_sum = tfs.astype(np.int64)
    bm25 = terms[0].score(tfs, dls)
    for tr in terms[1:]:
        if docs.size == 0:
            break  # early exit (reference :135)
        found, tf, dl = tr.lookup(docs)
        docs, tf_sum, bm25 = docs[found], tf_sum[found], bm25[found]
        tf, dl = tf[found], dl[found]
        tf_sum = tf_sum + tf
        bm25 = bm25 + tr.score(tf, dl)
    return _topk(docs, bm25, tf_sum, k)


def _score_or_exhaustive(terms: list["TermRuns"], k: int):
    """Disjunctive: accumulate all postings (vectorized baseline)."""
    all_docs, all_bm, all_tf = [], [], []
    for tr in terms:
        d, t, l = tr.decode_all()
        all_docs.append(d)
        all_bm.append(tr.score(t, l))
        all_tf.append(t.astype(np.int64))
    docs = np.concatenate(all_docs)
    uniq, inv = np.unique(docs, return_inverse=True)
    bm25 = np.bincount(inv, weights=np.concatenate(all_bm), minlength=uniq.size)
    tf_sum = np.bincount(inv, weights=np.concatenate(all_tf), minlength=uniq.size).astype(np.int64)
    return _topk(uniq, bm25, tf_sum, k)


def _score_or_pruned(terms: list["TermRuns"], k: int):
    """Disjunctive with block-max pruning (batch-shaped BMW).  Exact.

    Phase A (seed θ): fully score the docs of the highest-impact term
    (max idf·ub) — gives a lower bound θ = kth best score so far.
    Phase B: for every other term, decode only blocks whose upper bound
    plus the sum of the *other* terms' global upper bounds can beat θ;
    docs from surviving blocks are fully scored via block-selective
    lookups.  A doc skipped in every term's pruning provably scores
    < θ, so the result equals the exhaustive top-k (property-tested).
    """
    ubs = np.array([tr.block_bounds() for tr in terms])
    total_ub = float(ubs.sum())
    seed_i = int(np.argmax(ubs))

    def full_score(probe_docs: np.ndarray):
        bm = np.zeros(probe_docs.size)
        tfs = np.zeros(probe_docs.size, dtype=np.int64)
        for tr in terms:
            found, tf, dl = tr.lookup(probe_docs)
            bm += np.where(found, tr.score(tf, dl), 0.0)
            tfs += np.where(found, tf, 0)
        return bm, tfs

    seed_docs, _, _ = terms[seed_i].decode_all()
    seed_bm, seed_tf = full_score(seed_docs)
    d0, b0, t0 = _topk(seed_docs, seed_bm, seed_tf, k)
    theta = float(b0[k - 1]) if b0.size >= k else -np.inf

    extra: list[np.ndarray] = []
    for i, tr in enumerate(terms):
        if i == seed_i:
            continue
        others_ub = total_ub - float(ubs[i])
        masks = []
        for r in tr.rows:
            mt = np.asarray(r["block_max_tf"], dtype=np.float64)
            md = np.asarray(r["block_min_dl"], dtype=np.float64)
            bub = _block_ub(mt, md, tr.idf, tr.k1, tr.b, tr.avgdl)
            masks.append((bub + others_ub >= theta) & tr.block_overlap(r))
        d, t, l = tr.decode_selected(masks)
        d, _, _ = tr._range_filter(d, t, l)
        extra.append(d)
    if extra:
        cand = np.unique(np.concatenate(extra))
        # drop docs already scored in the seed phase
        if seed_docs.size:
            pos_c = np.minimum(np.searchsorted(seed_docs, cand), seed_docs.size - 1)
            fresh = cand[seed_docs[pos_c] != cand]
        else:
            fresh = cand
        if fresh.size:
            fb, ft = full_score(fresh)
            all_d = np.concatenate([seed_docs, fresh])
            all_b = np.concatenate([seed_bm, fb])
            all_t = np.concatenate([seed_tf, ft])
            return _topk(all_d, all_b, all_t, k)
    return d0, b0, t0
