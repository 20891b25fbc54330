"""Query planner: df-percentage integer-division boundary, identifier
exemption, rarest-first ordering, missing-term handling
(SearchServiceImpl.java:99-114 semantics)."""

from __future__ import annotations

from searchengine_spark.plans.planner import analyze_query, bm25_idf, plan_query


def test_integer_division_boundary():
    # N=3 docs, df=2 -> 100*2//3 = 66; filter 66 keeps (66 > 66 false),
    # filter 65 prunes.  Exact reference semantics (:108, int division).
    info = {"t": (2, 10)}
    keep = plan_query("t", info, n_docs=3, search_filter_pct=66)
    assert keep.ordered == [("t", 2, 10)] and not keep.pruned
    prune = plan_query("t", info, n_docs=3, search_filter_pct=65)
    assert prune.pruned == ["t"] and not prune.ordered


def test_identifier_exempt_from_df_filter():
    # identifiers bypass the high-df prune (:270-274)
    info = {"42": (100, 100), "common": (100, 100)}
    plan = plan_query("42 common", info, n_docs=100, search_filter_pct=50)
    assert [t for t, _, _ in plan.ordered] == ["42"]
    assert plan.pruned == ["common"]


def test_rarest_first_order():
    info = {"aa": (30, 1), "bb": (10, 1), "cc": (20, 1)}
    plan = plan_query("aa bb cc", info, n_docs=1000)
    assert [t for t, _, _ in plan.ordered] == ["bb", "cc", "aa"]


def test_df_tie_breaks_on_term():
    info = {"zz": (5, 1), "aa": (5, 1)}
    plan = plan_query("zz aa", info, n_docs=100)
    assert [t for t, _, _ in plan.ordered] == ["aa", "zz"]


def test_missing_term_marks_empty():
    plan = plan_query("ghost", {}, n_docs=10)
    assert plan.missing == ["ghost"] and plan.empty


def test_query_analysis_dedups_preserving_order():
    assert analyze_query("index the index search") == ["index", "search"]


def test_stop_only_query_is_empty():
    plan = plan_query("the of and", {}, n_docs=10)
    assert plan.terms == [] and plan.empty


def test_bm25_idf_pinned():
    # ln(1 + (N - df + .5)/(df + .5))
    import math

    assert abs(bm25_idf(1, 100) - math.log(1 + 99.5 / 1.5)) < 1e-12
    assert bm25_idf(100, 100) > 0  # never negative with this formula
