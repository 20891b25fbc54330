"""Pinned pure-Python oracle (SURVEY.md §5.1).

A deliberately naive, single-process implementation of the full
index+search semantics (§2.9 scoring contract) in plain dicts/lists.
Everything the Spark engine produces is compared against this.

It shares ONLY the analyzer functions with the engine (the analyzer is
the pinned contract both sides must agree on — FIXTURES.md §4); all
indexing/scoring logic here is independent code.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter
from dataclasses import dataclass, field

from searchengine_spark.analyzer import analyze_text, is_identifier


@dataclass
class OracleIndex:
    #: (repo, path, commit, lang, content) sorted by (repo, path, commit)
    docs: list[tuple[str, str, str, str, str]] = field(default_factory=list)
    #: doc_id -> {term: tf}
    doc_tfs: dict[int, dict[str, int]] = field(default_factory=dict)
    #: term -> {doc_id: tf}
    postings: dict[str, dict[int, int]] = field(default_factory=dict)
    #: doc_id -> doclen (= Σ tf)
    doclen: dict[int, int] = field(default_factory=dict)
    #: (term, repo) -> df
    df_repo: dict[tuple[str, str], int] = field(default_factory=dict)

    @property
    def n_docs(self) -> int:
        return len(self.docs)

    @property
    def avgdl(self) -> float:
        return (sum(self.doclen.values()) / len(self.doclen)) if self.doclen else 1.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def sha256(self, doc_id: int) -> str:
        return hashlib.sha256(self.docs[doc_id][4].encode("utf-8")).hexdigest()


def build_oracle_index(rows: list[tuple[str, str, str, str, str]]) -> OracleIndex:
    """rows: (repo, path, commit, lang, content) in any order."""
    idx = OracleIndex()
    idx.docs = sorted(rows, key=lambda r: (r[0], r[1], r[2]))
    for doc_id, (repo, path, commit, lang, content) in enumerate(idx.docs):
        tf = Counter(analyze_text(content))
        idx.doc_tfs[doc_id] = dict(tf)
        idx.doclen[doc_id] = sum(tf.values())
        for term, n in tf.items():
            idx.postings.setdefault(term, {})[doc_id] = n
            key = (term, repo)
            idx.df_repo[key] = idx.df_repo.get(key, 0) + 1
    return idx


def oracle_bm25_idf(df: int, n: int) -> float:
    return math.log(1.0 + (n - df + 0.5) / (df + 0.5))


def oracle_bm25(idx: OracleIndex, term: str, doc_id: int, k1: float, b: float) -> float:
    tf = idx.postings.get(term, {}).get(doc_id, 0)
    if tf == 0:
        return 0.0
    idf = oracle_bm25_idf(idx.df(term), idx.n_docs)
    dl = idx.doclen[doc_id]
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / idx.avgdl))


def oracle_plan_terms(
    idx: OracleIndex, query: str, search_filter_pct: int = 100
) -> tuple[list[str], list[str], list[str]]:
    """-> (ordered surviving terms rarest-first, missing, pruned)."""
    seen: dict[str, None] = {}
    for t in analyze_text(query):
        seen.setdefault(t)
    missing, pruned, kept = [], [], []
    for t in seen:
        df = idx.df(t)
        if df == 0:
            missing.append(t)
            continue
        if (100 * df) // idx.n_docs > search_filter_pct and not is_identifier(t):
            pruned.append(t)
            continue
        kept.append(t)
    kept.sort(key=lambda t: (idx.df(t), t))
    return kept, missing, pruned


def oracle_search(
    idx: OracleIndex,
    query: str,
    k: int = 10,
    mode: str = "and",
    k1: float = 1.2,
    b: float = 0.75,
    search_filter_pct: int = 100,
    repo: str | None = None,
) -> list[tuple[int, float, int]]:
    """-> [(doc_id, bm25, tf_sum)] sorted by (bm25 desc, doc_id asc).

    AND mode reproduces the reference pipeline: all-terms-present
    bail-out, posting intersection, Σtf; BM25 computed alongside.
    With ``repo``, planning AND scoring are per-repo (the reference's
    per-site loop, SearchServiceImpl.java:74-114): the guard and the
    ``100*df//N`` threshold use the repo's own df and page count, and
    BM25 uses per-repo N/avgdl — a term present globally but absent in
    the repo short-circuits a scoped AND query.
    """
    if repo is None:
        terms, missing, _ = oracle_plan_terms(idx, query, search_filter_pct)
        in_scope = None
        n_eff, avgdl_eff = idx.n_docs, idx.avgdl
        df_of = idx.df
    else:
        in_scope = {d for d in range(idx.n_docs) if idx.docs[d][0] == repo}
        n_eff = len(in_scope)
        dls = [idx.doclen[d] for d in in_scope]
        avgdl_eff = (sum(dls) / len(dls)) if dls else 1.0

        def df_of(t: str) -> int:
            return idx.df_repo.get((t, repo), 0)

        seen: dict[str, None] = {}
        for t in analyze_text(query):
            seen.setdefault(t)
        terms, missing = [], []
        for t in seen:
            df = df_of(t)
            if df == 0:
                missing.append(t)
                continue
            if n_eff and (100 * df) // n_eff > search_filter_pct and not is_identifier(t):
                continue
            terms.append(t)
        terms.sort(key=lambda t: (df_of(t), t))
    if not terms or (mode == "and" and missing):
        return []
    doc_ids: set[int] | None = None
    if mode == "and":
        for t in terms:  # rarest-first intersection
            pages = set(idx.postings.get(t, {}))
            doc_ids = pages if doc_ids is None else (doc_ids & pages)
            if not doc_ids:
                return []
    else:
        doc_ids = set()
        for t in terms:
            doc_ids |= set(idx.postings.get(t, {}))
    assert doc_ids is not None
    if in_scope is not None:
        doc_ids = doc_ids & in_scope
    results = []
    for d in doc_ids:
        bm = 0.0
        tf_sum = 0
        for t in terms:
            tf = idx.postings.get(t, {}).get(d, 0)
            tf_sum += tf
            if tf:
                idf = oracle_bm25_idf(df_of(t), n_eff)
                dl = idx.doclen[d]
                bm += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl_eff))
        results.append((d, bm, tf_sum))
    results.sort(key=lambda r: (-r[1], r[0]))
    return results[:k]


def oracle_tf_relevance(
    idx: OracleIndex, query: str, search_filter_pct: int = 100
) -> list[tuple[int, int, float]]:
    """Reference Σtf + max-normalized relevance
    (SearchServiceImpl.java:141-161): [(doc_id, abs_rel, rel)] sorted by
    (rel desc, doc_id asc)."""
    terms, missing, _ = oracle_plan_terms(idx, query, search_filter_pct)
    if not terms or missing:
        return []
    doc_ids: set[int] | None = None
    for t in terms:
        pages = set(idx.postings.get(t, {}))
        doc_ids = pages if doc_ids is None else (doc_ids & pages)
        if not doc_ids:
            return []
    abs_rel = {
        d: sum(idx.postings.get(t, {}).get(d, 0) for t in terms) for d in doc_ids
    }
    mx = max(abs_rel.values())
    out = [(d, a, a / mx) for d, a in abs_rel.items()]
    out.sort(key=lambda r: (-r[2], r[0]))
    return out
