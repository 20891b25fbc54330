"""Snippet generation — ±5-token windows with <b> highlights.

Re-expression of the reference's snippet builder
(``services/SearchServiceImpl.java:218-267``): find query-term hits in
the raw text, take up to 3 merged windows of ±5 tokens around hits,
join with " ... ", wrap hit tokens in ``<b>``.  Runs driver-side over
the k result rows only (the reference likewise parses only the visible
page, :175-196 — cost bounded by k, not corpus size).
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
        return " ".join(raw_tokens[: 2 * WINDOW + 1])
    # merge overlapping ±WINDOW intervals, keep first MAX_WINDOWS
    intervals: list[list[int]] = []
    for h in hits:
        lo, hi = max(0, h - WINDOW), min(len(raw_tokens) - 1, h + WINDOW)
        if intervals and lo <= intervals[-1][1] + 1:
            intervals[-1][1] = hi
        else:
            if len(intervals) == MAX_WINDOWS:
                break
            intervals.append([lo, hi])
    hit_set = set(hits)
    parts = []
    for lo, hi in intervals:
        words = [
            f"<b>{raw_tokens[i]}</b>" if i in hit_set else raw_tokens[i]
            for i in range(lo, hi + 1)
        ]
        parts.append(" ".join(words))
    return " ... ".join(parts)
