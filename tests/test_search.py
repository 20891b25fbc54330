"""Search correctness vs the oracle: rank-identical top-k, BM25 score
tolerance 1e-6 (order exact with doc_id tie-break), Σtf reference
relevance, engine-path equivalence (flat == wand == local ==
wand-unpruned), pagination, guards (SURVEY.md §5.4/5.6)."""

from __future__ import annotations

import pytest

from tests.conftest import CFG
from tests.oracle import oracle_search, oracle_tf_relevance

# Query set (FIXTURES.md §2 composition): rare terms, identifiers,
# conjunctions, empty intersections, missing terms, digit/hyphen ids.
QUERIES = [
    "index",
    "search engine",
    "index search query",
    "def return",          # python keywords (head terms)
    "getManager",          # camel identifier -> 'getmanager'
    "42",                  # digit-seq identifier
    "parse_buffer index",  # snake -> parse buffer
    "ghostterm9999",       # not in dictionary
    "the of and",          # stopwords only
    "commonterm",          # near-100% df stop term
    "commonterm index",
    "build merge split",
]

ENGINES = ["flat", "wand", "local"]


def _rows(df):
    import pandas as pd

    if isinstance(df, pd.DataFrame):
        return [(int(r.doc_id), float(r.bm25), int(r.tf_sum)) for r in df.itertuples()]
    return [(r["doc_id"], r["bm25"], r["tf_sum"]) for r in df.collect()]


@pytest.mark.parametrize("query", QUERIES)
@pytest.mark.parametrize("mode", ["and", "or"])
def test_rank_identical_to_oracle(engine, oracle_index, query, mode):
    got = _rows(engine.search_df(query, k=10, mode=mode, engine="local"))
    want = oracle_search(
        oracle_index, query, k=10, mode=mode,
        k1=CFG.bm25_k1, b=CFG.bm25_b, search_filter_pct=CFG.search_filter_pct,
    )
    assert [g[0] for g in got] == [w[0] for w in want], query
    for (gd, gb, gt), (wd, wb, wt) in zip(got, want):
        assert abs(gb - wb) < 1e-6, (query, gd)
        assert gt == wt, (query, gd)


@pytest.mark.parametrize("query", ["index search", "def return", "commonterm index", "42"])
@pytest.mark.parametrize("mode", ["and", "or"])
def test_engine_paths_agree(engine, query, mode):
    results = {e: _rows(engine.search_df(query, k=10, mode=mode, engine=e)) for e in ENGINES}
    base = results["flat"]
    for other in ("wand", "local"):
        rows = results[other]
        assert [r[0] for r in rows] == [r[0] for r in base], other
        assert [r[2] for r in rows] == [r[2] for r in base], other
        for (_, gb, _), (_, wb, _) in zip(rows, base):
            assert abs(gb - wb) < 1e-9, other


def test_blockmax_pruned_equals_exhaustive(engine, oracle_index):
    """The block-max pruning pass must be exact (SURVEY.md §7.2)."""
    from searchengine_spark.operators import wand as W

    for query in ["index search query", "build merge split", "def return index"]:
        plan, info3, _ = engine.plan(query)
        if not plan.ordered:
            continue
        import os

        runs = engine._runs_df(plan, None).collect()
        by_salt: dict[int, dict[str, list]] = {}
        for r in runs:
            by_salt.setdefault(r["salt"], {}).setdefault(r["term"], []).append(r.asDict())
        idfs = engine._idf_map(plan, engine.n_docs)
        for salt, term_rows in by_salt.items():
            a = W.score_salt_group(term_rows, idfs, 10, False, CFG.bm25_k1, CFG.bm25_b, engine.avgdl, prune=True)
            b = W.score_salt_group(term_rows, idfs, 10, False, CFG.bm25_k1, CFG.bm25_b, engine.avgdl, prune=False)
            assert a[0].tolist() == b[0].tolist(), (query, salt)
            assert a[1].tolist() == pytest.approx(b[1].tolist())


def test_tf_relevance_matches_reference_semantics(engine, oracle_index):
    """Σtf + max-normalization parity (SearchServiceImpl.java:141-161):
    relevance values must EQUAL the oracle's globally-normalized ones."""
    for query in ["index search", "def return", "build"]:
        want = oracle_tf_relevance(oracle_index, query, CFG.search_filter_pct)
        res = engine.search(query, limit=len(want) or 1, mode="and", engine="local")
        assert res["result"]
        # the API sorts by bm25; compare as mapping doc -> normalized Σtf
        want_map = {d: rel for d, _, rel in want}
        for d in res["data"]:
            assert d["relevance"] == pytest.approx(want_map[d["doc_id"]]), query


def test_relevance_normalized_by_global_max_across_pages(engine, oracle_index):
    """The normalizer is max Σtf over ALL matched docs BEFORE
    pagination (SearchServiceImpl.java:149-151) — page-invariant: an
    offset>0 page that does NOT contain the global-max-Σtf doc must
    still divide by the global max, not its own page max (VERDICT r3
    #1 regression pin)."""
    for query in ["index", "def return", "index search"]:
        want = oracle_tf_relevance(oracle_index, query, CFG.search_filter_pct)
        if len(want) < 8:
            continue
        want_map = {d: rel for d, _, rel in want}
        abs_map = {d: a for d, a, _ in want}
        global_max = max(abs_map.values())
        res = engine.search(query, offset=5, limit=5, mode="and", engine="local")
        page_tf = [abs_map[d["doc_id"]] for d in res["data"]]
        if res["data"] and max(page_tf) < global_max:
            # discriminating page: page-local max != global max, so a
            # page-local normalizer would yield a 1.0 here — assert the
            # exact global values instead
            for d in res["data"]:
                assert d["relevance"] == pytest.approx(want_map[d["doc_id"]])
            assert all(d["relevance"] < 1.0 for d in res["data"])
            return
    pytest.skip("fixture produced no page whose local max != global max")


def test_missing_term_empty_result(engine):
    res = engine.search("ghostterm9999 index", mode="and", engine="local")
    assert res == {"result": True, "count": 0, "data": []}


def test_empty_query_is_error(engine):
    res = engine.search("   ")
    assert res["result"] is False


def test_stopword_only_query_empty(engine):
    res = engine.search("the of and", mode="and", engine="local")
    assert res["count"] == 0


def test_pagination_slices_global_ranking(engine, oracle_index):
    want = oracle_search(oracle_index, "index", k=100, mode="and",
                         k1=CFG.bm25_k1, b=CFG.bm25_b)
    p1 = engine.search("index", offset=0, limit=5, mode="and", engine="local")
    p2 = engine.search("index", offset=5, limit=5, mode="and", engine="local")
    got = [d["doc_id"] for d in p1["data"]] + [d["doc_id"] for d in p2["data"]]
    assert got == [w[0] for w in want[:10]]
    assert p1["count"] == len(want)


def test_count_is_prelimit_total(engine, oracle_index):
    want = oracle_search(oracle_index, "index search", k=10**6, mode="and",
                         k1=CFG.bm25_k1, b=CFG.bm25_b)
    res = engine.search("index search", limit=3, mode="and", engine="local")
    assert res["count"] == len(want)
    assert len(res["data"]) == min(3, len(want))


def test_snippets_highlight_query_terms(engine):
    res = engine.search("index search", limit=3, mode="and", engine="local")
    assert res["data"], "expected hits"
    for d in res["data"]:
        assert "<b>" in d["snippet"], d


def test_high_df_pruning_via_config(spark, index_dir, oracle_index):
    """With search_filter_pct lowered, near-universal 'commonterm' is
    pruned from queries (but identifiers stay)."""
    import json
    import os

    from searchengine_spark.query.engine import SearchEngine

    eng = SearchEngine(spark, index_dir)
    # pick a threshold between 'index' df% and 'commonterm' df% (~97%)
    info = eng.term_info(["commonterm", "index"])
    pct_common = (100 * info["commonterm"][0]) // eng.n_docs
    pct_index = (100 * info["index"][0]) // eng.n_docs
    assert pct_common > pct_index, "fixture assumption"
    threshold = pct_index  # keeps 'index' (<=), prunes 'commonterm' (>)
    object.__setattr__(eng.cfg, "search_filter_pct", threshold)
    plan, _, _ = eng.plan("commonterm index")
    assert plan.pruned == ["commonterm"]
    assert [t for t, _, _ in plan.ordered] == ["index"]
    # oracle agrees
    want = oracle_search(oracle_index, "commonterm index", k=10, mode="and",
                         k1=CFG.bm25_k1, b=CFG.bm25_b, search_filter_pct=threshold)
    got = _rows(eng.search_df("commonterm index", k=10, mode="and", engine="local"))
    assert [g[0] for g in got] == [w[0] for w in want]


@pytest.mark.parametrize("eng_path", ENGINES)
@pytest.mark.parametrize("query", ["index", "index search", "def return", "42"])
def test_repo_scoped_search_rank_identical(engine, oracle_index, eng_path, query):
    """Scoped queries use per-repo planning + scoring (reference
    per-site loop) and stay rank-identical to the per-repo oracle on
    every engine path — including the compressed-index WAND path (no
    flat fallback)."""
    repos = sorted({d[0] for d in oracle_index.docs})
    for repo in repos[:2]:
        for mode in ("and", "or"):
            want = oracle_search(oracle_index, query, k=10, mode=mode,
                                 k1=CFG.bm25_k1, b=CFG.bm25_b, repo=repo)
            got = _rows(engine.search_df(query, k=10, mode=mode,
                                         engine=eng_path, repo=repo))
            assert [g[0] for g in got] == [w[0] for w in want], (repo, mode)
            for (gd, gb, gt), (wd, wb, wt) in zip(got, want):
                assert abs(gb - wb) < 1e-6, (repo, mode, gd)
                assert gt == wt


def test_repo_scoped_guard_term_missing_in_repo(engine, oracle_index):
    """A term that exists globally but not in the scoped repo must
    short-circuit the scoped AND query (SearchServiceImpl.java:104-107
    evaluated per site) — even though an unscoped query matches."""
    repos = sorted({d[0] for d in oracle_index.docs})
    # find a (term, repo) pair where the term exists globally but not
    # in that repo
    candidates = [
        (t, repo)
        for t in oracle_index.postings
        for repo in repos
        if (t, repo) not in oracle_index.df_repo
    ]
    assert candidates, "fixture must contain repo-exclusive terms"
    term, repo = candidates[0]
    assert engine.search(term, repo=repo, mode="and")["count"] == 0
    plan, _, _ = engine.plan(term, repo=repo)
    assert plan.missing == [term]
    # unscoped, the same term matches
    assert engine.search(term, mode="and")["count"] > 0


def test_repo_scoped_df_threshold_uses_repo_pages(engine, oracle_index):
    """The 100*df//N prune threshold must use the repo's own page count
    (SearchServiceImpl.java:108 inside the per-site loop)."""
    repos = sorted({d[0] for d in oracle_index.docs})
    repo = repos[0]
    n_repo = sum(1 for d in oracle_index.docs if d[0] == repo)
    got_n, got_avgdl, lo, hi = engine.repo_scope(repo)
    assert got_n == n_repo
    assert hi - lo + 1 == n_repo  # contiguous ids
    # threshold=0: every non-identifier term with df_repo > 0 prunes
    import dataclasses

    object.__setattr__(engine.cfg, "search_filter_pct", 0)
    try:
        plan, _, _ = engine.plan("index", repo=repo)
        assert plan.pruned == ["index"] or plan.missing == ["index"]
    finally:
        object.__setattr__(engine.cfg, "search_filter_pct", 100)


def test_search_without_count_skips_second_scan(engine):
    r = engine.search("index search", limit=3, with_count=False)
    assert r["result"] is True and r["count"] == -1 and r["data"]


def test_count_local_falls_back_to_spark_above_df_cap(engine, monkeypatch):
    """count_matches must not materialize head-term postings on the
    driver: with the cap forced to 0 the local engine silently routes
    through the distributed plan and agrees with it."""
    import searchengine_spark.query.engine as EM

    monkeypatch.setattr(EM, "LOCAL_COUNT_MAX_DF", 0)
    forced = engine.count_matches("index", engine="local")
    monkeypatch.undo()
    assert forced == engine.count_matches("index", engine="spark")
    assert forced == engine.count_matches("index", engine="local")


# ---------------------------------------------------------------------------
# snippet reference-shape pins (SearchServiceImpl.java:218-267)
# ---------------------------------------------------------------------------

def test_snippet_reference_shape():
    from searchengine_spark.query.snippets import build_snippet

    # empty text and no-hit text -> "" (:219, :236)
    assert build_snippet("", {"index"}) == ""
    assert build_snippet("no match anywhere here", {"zzz"}) == ""
    # hit -> outer "..." framing with no inner padding space (:266)
    s = build_snippet("aa bb index cc dd", {"index"})
    assert s.startswith("...") and s.endswith("...")
    assert not s.startswith("... ") and not s.endswith(" ...")
    assert "<b>index</b>" in s


def test_snippet_three_window_cap_and_no_extension():
    """At most 3 windows, joined by ' ... '; the scan STOPS the moment
    the 3rd window is created — a later hit never extends it
    (:249-251)."""
    from searchengine_spark.query.snippets import build_snippet

    toks = [f"t{i}" for i in range(60)]
    for pos in (0, 20, 40, 52):
        toks[pos] = "index"
    s = build_snippet(" ".join(toks), {"index"})
    assert s.count(" ... ") == 2  # exactly 3 fragments
    assert s.count("<b>index</b>") == 3
    # window 3 is [35, 45]; the 4th hit at 52 must NOT appear
    assert "t52" not in s and "t46" not in s


def test_snippet_windows_merge_adjacent_hits():
    from searchengine_spark.query.snippets import build_snippet

    toks = [f"w{i}" for i in range(30)]
    toks[10] = "index"
    toks[14] = "search"  # within ±5 of the first hit -> merged window
    s = build_snippet(" ".join(toks), {"index", "search"})
    assert s.count(" ... ") == 0  # single merged fragment
    assert "<b>index</b>" in s and "<b>search</b>" in s


# ---------------------------------------------------------------------------
# ExcludeSet (the tombstone deletion vector's scorer-side mask)
# ---------------------------------------------------------------------------

def test_exclude_set_keep_ranges_and_ids():
    import numpy as np

    from searchengine_spark.operators.wand import ExcludeSet

    d = np.arange(0, 20, dtype=np.uint64)
    ex = ExcludeSet(ranges=[(3, 5), (9, 9)])
    kept = d[ex.keep(d)]
    assert set(kept.tolist()) == set(range(20)) - {3, 4, 5, 9}

    ex2 = ExcludeSet(ids=[2, 7, 19])
    kept2 = d[ex2.keep(d)]
    assert set(kept2.tolist()) == set(range(20)) - {2, 7, 19}

    # combined, id above every excluded id (searchsorted clamp edge)
    ex3 = ExcludeSet(ranges=[(0, 1)], ids=[5])
    d3 = np.array([0, 1, 2, 5, 19], dtype=np.uint64)
    assert d3[ex3.keep(d3)].tolist() == [2, 19]

    # empty set keeps everything and is falsy
    ex4 = ExcludeSet()
    assert not ex4 and ex4.keep(d).all()


def test_exclude_set_overlaps_block_metadata():
    import numpy as np

    from searchengine_spark.operators.wand import ExcludeSet

    first = np.array([0, 10, 20, 30], dtype=np.uint64)
    last = np.array([9, 19, 29, 39], dtype=np.uint64)
    # range straddling two blocks touches both; exact-boundary touches
    ex = ExcludeSet(ranges=[(15, 20)])
    assert ex.overlaps(first, last).tolist() == [False, True, True, False]
    # id form: only the block containing the id overlaps
    ex2 = ExcludeSet(ids=[35])
    assert ex2.overlaps(first, last).tolist() == [False, False, False, True]
    # id outside every block: nothing overlaps
    ex3 = ExcludeSet(ids=[40])
    assert ex3.overlaps(first, last).tolist() == [False, False, False, False]


def test_match_stats_scan_is_row_group_pruned(engine):
    """VERDICT r4 #6: search(with_count=True) pays one _match_stats
    pruned scan of the flat postings — assert (timing-free) that the
    pruning is real: hive partition pruning keeps only the query
    terms' bucket dirs, and parquet row-group statistics keep only row
    groups whose term min/max straddles a query term."""
    import pyarrow.dataset as pads

    terms = ["getmanager"]  # rare term: prunes hard
    info = engine.term_info(terms)
    assert terms[0] in info
    buckets = sorted({info[t][2] for t in terms})
    ds = engine._dataset("stage1_postings", hive=True)  # noqa: SLF001

    all_frags = list(ds.get_fragments())
    filt = pads.field("bucket").isin(buckets) & pads.field("term").isin(terms)
    kept_frags = list(ds.get_fragments(filter=filt))
    # partition pruning: only the term's bucket dir survives (the
    # sentinel bucket=-1 dir and every other bucket dir are skipped)
    assert 0 < len(kept_frags) < len(all_frags)
    for frag in kept_frags:
        assert f"bucket={buckets[0]}" in frag.path

    # row-group pruning: files are term-sorted, so statistics drop row
    # groups outside the term's range whenever a file has several
    total_rgs = sum(len(f.row_groups) for f in kept_frags)
    kept_rgs = sum(
        len(list(f.split_by_row_group(filt, schema=ds.schema)))
        for f in kept_frags
    )
    assert kept_rgs <= total_rgs
    # and the scan's answer is right (ties the assertion to the path)
    total, max_tf = engine._match_stats(  # noqa: SLF001
        *engine.plan("getManager")[:2], "and", None, "local"
    )
    assert total >= 1 and max_tf >= 1
