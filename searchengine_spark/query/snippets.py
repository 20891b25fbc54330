"""Snippet generation — ±5-token windows with <b> highlights.

Re-expression of the reference's snippet builder
(``services/SearchServiceImpl.java:218-267``): find query-term hits in
the raw text, take up to 3 merged windows of ±5 tokens around hits,
join with " ... ", wrap hit tokens in ``<b>``, frame the whole snippet
in outer ``"..."`` (:266).  Reference edge semantics pinned by tests:
empty text and no-hit text both return ``""`` (:219,236), and the
moment the 3rd window is CREATED the scan stops — later hits never
extend it (:249-251).  Runs driver-side over the k result rows only
(the reference likewise parses only the visible page, :175-196 — cost
bounded by k, not corpus size).
"""

from __future__ import annotations

from searchengine_spark.analyzer import analyze_text

WINDOW = 5
MAX_WINDOWS = 3


def build_snippet(content: str, query_terms: set[str]) -> str:
    raw_tokens = content.split()
    if not raw_tokens:
        return ""
    hits = [
        i
        for i, tok in enumerate(raw_tokens)
        if any(t in query_terms for t in analyze_text(tok))
    ]
    if not hits:
        return ""  # reference: no query lemma on the page -> "" (:236)
    # merge overlapping ±WINDOW intervals; stop the moment the
    # MAX_WINDOWS-th window is created (reference :249-251 breaks right
    # after the add — the last window is never extended by later hits)
    intervals: list[list[int]] = []
    for h in hits:
        lo, hi = max(0, h - WINDOW), min(len(raw_tokens) - 1, h + WINDOW)
        if intervals and lo <= intervals[-1][1] + 1:
            intervals[-1][1] = hi
        else:
            intervals.append([lo, hi])
            if len(intervals) == MAX_WINDOWS:
                break
    hit_set = set(hits)
    parts = []
    for lo, hi in intervals:
        words = [
            f"<b>{raw_tokens[i]}</b>" if i in hit_set else raw_tokens[i]
            for i in range(lo, hi + 1)
        ]
        parts.append(" ".join(words))
    return "..." + " ... ".join(parts) + "..."
