"""Tokenizer + normalizer ("lemma transform") — the analyzer contract.

Re-expression of the reference's per-page lemma pipeline
(``services/LemmaFinder.java``):

- tokenize   (LemmaFinder.java:143-148): lowercase, replace everything
  outside ``[а-яА-Яa-zA-Z0-9/\\-\\s]`` with a space, split on whitespace;
- identifier bypass (LemmaFinder.java:47-55,102-105,125-127,159-161):
  digit sequences, hyphenated case-ids and path-like tokens skip both
  the significance filter and lemmatization and index verbatim;
- significance filter (LemmaFinder.java:124-141): the reference drops
  words whose morphology tags are conjunction/interjection/preposition/
  particle (application.yaml:66-69); our corpus is source code, so the
  analog is a pinned stop-set of English/code function words;
- lemmatize  (LemmaFinder.java:102-111): the reference uses the Russian
  Lucene-morphology dictionary (a JVM artifact); the rebuild pins its own
  deterministic rule-based suffix-stripping normalizer.  Parity is
  engine-vs-oracle (tests/oracle.py uses the *same* functions), not
  engine-vs-JVM — see SURVEY.md §7.2.

Two implementations, tested for parity (tests/test_analyzer.py):

- :func:`analyze_text` — pure Python, one string -> list of terms.  Used
  by the pytest oracle.  Obviously correct, slow.
- :func:`tokens_frame` — vectorized pandas (``.str`` ops + ``np.select``),
  runs inside ``mapInPandas`` Arrow batches.  No per-row Python in the
  hot path.

Changing ANY rule here bumps ``IndexConfig.analyzer_version``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# --- tokenize ---------------------------------------------------------------
# Reference symbol class [^а-яА-Яa-zA-Z0-9/\-\s] (LemmaFinder.java:39),
# applied after lowercasing; ё added since Python lowercasing keeps it.
SYMBOL_RE = r"[^a-zа-яё0-9/\-\s]"
_SYMBOL_PAT = re.compile(SYMBOL_RE)
_WS_PAT = re.compile(r"\s+")

# --- identifier bypass ------------------------------------------------------
# digit-seq >= 2 digits (LemmaFinder.java:159-161), hyphenated id
# (case-id, LemmaFinder.java:54-55), path-like (court-case docket with
# '/', LemmaFinder.java:47-48).
IDENT_RE = r"(?:\d{2,}|[a-z0-9]+(?:-[a-z0-9]+)+|[a-z0-9\-]*/[a-z0-9/\-]*)"
_IDENT_PAT = re.compile(IDENT_RE + r"\Z")

# Token must contain at least one alphanumeric to survive (drops bare
# '-', '/', '--' left by the symbol replacement).  ONE source pattern
# shared by the pure-Python and Arrow kernels so a rule change can
# never desynchronize them between fuzz runs (ADVICE r4).
HAS_ALNUM_RE = r"[a-zа-яё0-9]"
_HAS_ALNUM_PAT = re.compile(HAS_ALNUM_RE)

# --- significance filter ----------------------------------------------------
# Stop-set: analog of the reference's POS-tag exceptions СОЮЗ/МЕЖД/ПРЕДЛ/
# ЧАСТ (conjunction/interjection/preposition/particle, application.yaml:
# 66-69) for an English/code corpus: closed-class function words only —
# never code keywords (those carry signal in a code corpus).
STOPWORDS = frozenset(
    """a an and are as at be but by did do does else had has have if in is it
    no not of on or so than that the then this to was were with""".split()
)

# --- lemmatizer (deterministic suffix rules) --------------------------------
# Applied to non-identifier, non-stopword tokens.  First matching rule
# wins; order is significant and mirrored exactly in the vectorized path.
#   (suffix, min_token_len, replacement)
_SUFFIX_RULES: list[tuple[str, int, str]] = [
    ("ies", 5, "y"),      # queries -> query
    ("sses", 5, "ss"),    # classes -> class
    ("ing", 6, ""),       # building -> build
    ("ed", 5, ""),        # indexed -> index
]
# plain plural 's' handled separately (needs negative conditions)
_S_EXCL_SUFFIXES = ("ss", "us", "is")


def lemmatize_token(tok: str) -> str:
    """Pure-Python lemmatizer for one already-lowercased token."""
    for suffix, min_len, repl in _SUFFIX_RULES:
        if len(tok) >= min_len and tok.endswith(suffix):
            return tok[: -len(suffix)] + repl
    if len(tok) >= 4 and tok.endswith("s") and not tok.endswith(_S_EXCL_SUFFIXES):
        return tok[:-1]
    return tok


def tokenize_text(text: str) -> list[str]:
    """Pure-Python tokenizer: raw surviving tokens (pre stop/lemma)."""
    lowered = text.lower()
    cleaned = _SYMBOL_PAT.sub(" ", lowered)
    return [t for t in _WS_PAT.split(cleaned.strip()) if t and _HAS_ALNUM_PAT.search(t)]


def is_identifier(tok: str) -> bool:
    return _IDENT_PAT.match(tok) is not None


def analyze_text(text: str) -> list[str]:
    """Pure-Python analyzer: text -> list of index terms (with repeats).

    The oracle path.  Identifiers bypass stop-filter and lemmatizer
    (LemmaFinder.java:125-127,102-105); other tokens are stop-filtered
    then suffix-normalized.
    """
    out: list[str] = []
    for tok in tokenize_text(text):
        if is_identifier(tok):
            out.append(tok)
        elif tok not in STOPWORDS:
            out.append(lemmatize_token(tok))
    return out


# --------------------------------------------------------------------------
# Vectorized path (pandas/NumPy) — used inside mapInPandas Arrow batches.
# --------------------------------------------------------------------------

def _lemmatize_series(toks: pd.Series) -> pd.Series:
    """Vectorized mirror of :func:`lemmatize_token` (same rule order)."""
    lens = toks.str.len()
    conds = [
        (lens >= 5) & toks.str.endswith("ies"),
        (lens >= 5) & toks.str.endswith("sses"),
        (lens >= 6) & toks.str.endswith("ing"),
        (lens >= 5) & toks.str.endswith("ed"),
        (lens >= 4)
        & toks.str.endswith("s")
        & ~toks.str.endswith("ss")
        & ~toks.str.endswith("us")
        & ~toks.str.endswith("is"),
    ]
    choices = [
        toks.str.slice(0, -3) + "y",
        toks.str.slice(0, -2),
        toks.str.slice(0, -3),
        toks.str.slice(0, -2),
        toks.str.slice(0, -1),
    ]
    return pd.Series(np.select(conds, choices, default=toks), index=toks.index)


def tokens_frame(ids: pd.Series, texts: pd.Series) -> pd.DataFrame:
    """Vectorized analyzer over an Arrow batch.

    Input: parallel Series of doc ids and raw texts.  Output: exploded
    DataFrame ``(doc_id, term)`` — one row per term *occurrence* (the
    caller aggregates tf).  All string work is pandas ``.str`` /
    ``np.select``; no Python-level per-row loop.
    """
    cleaned = (
        texts.fillna("")
        .str.lower()
        .str.replace(_SYMBOL_PAT, " ", regex=True)
        .str.split()
    )
    frame = pd.DataFrame({"doc_id": ids.values, "term": cleaned.values})
    frame = frame.explode("term", ignore_index=True)
    frame = frame.dropna(subset=["term"])
    toks = frame["term"].astype(str)
    has_alnum = toks.str.contains(_HAS_ALNUM_PAT, regex=True)
    frame, toks = frame[has_alnum], toks[has_alnum]
    if frame.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "term": pd.Series(dtype="object")})
    ident = toks.str.fullmatch(IDENT_RE)
    stop = toks.isin(STOPWORDS)
    keep = ident | ~stop
    frame, toks, ident = frame[keep], toks[keep], ident[keep]
    lemmas = toks.copy()
    non_ident = ~ident
    if non_ident.any():
        lemmas.loc[non_ident] = _lemmatize_series(toks[non_ident])
    out = pd.DataFrame({"doc_id": frame["doc_id"].values, "term": lemmas.values})
    return out


# --------------------------------------------------------------------------
# Arrow-compute path — used inside mapInArrow batches (the build hot
# path).  Same pinned rules as the pandas/pure paths; parity is enforced
# by tests/test_analyzer.py fuzz across all three implementations.
# Semantics notes vs Python re (why the engines agree on this contract):
# Python's \s is a superset of RE2's, but any Python-only whitespace
# char is simply NOT replaced by RE2's negated class — i.e. it IS
# replaced with a space — and both outcomes are token boundaries after
# the whitespace split; Python's \d never differs here because non-ASCII
# digits are already replaced by the symbol class in both engines.
# --------------------------------------------------------------------------

def _lemmatize_arrow(toks):
    """Arrow-compute mirror of :func:`lemmatize_token` (same rule order;
    first match wins -> nested if_else built from the LAST rule up)."""
    import pyarrow.compute as pc

    lens = pc.utf8_length(toks)

    def _sl(stop):
        return pc.utf8_slice_codeunits(toks, start=0, stop=stop)

    out = pc.if_else(
        pc.and_(
            pc.and_(
                pc.greater_equal(lens, 4), pc.ends_with(toks, pattern="s")
            ),
            pc.invert(
                pc.or_(
                    pc.or_(
                        pc.ends_with(toks, pattern="ss"),
                        pc.ends_with(toks, pattern="us"),
                    ),
                    pc.ends_with(toks, pattern="is"),
                )
            ),
        ),
        _sl(-1),
        toks,
    )
    out = pc.if_else(
        pc.and_(pc.greater_equal(lens, 5), pc.ends_with(toks, pattern="ed")),
        _sl(-2),
        out,
    )
    out = pc.if_else(
        pc.and_(pc.greater_equal(lens, 6), pc.ends_with(toks, pattern="ing")),
        _sl(-3),
        out,
    )
    out = pc.if_else(
        pc.and_(pc.greater_equal(lens, 5), pc.ends_with(toks, pattern="sses")),
        _sl(-2),
        out,
    )
    out = pc.if_else(
        pc.and_(pc.greater_equal(lens, 5), pc.ends_with(toks, pattern="ies")),
        pc.binary_join_element_wise(_sl(-3), "y", ""),
        out,
    )
    return out


def analyze_batch_arrow(doc_ids, texts):
    """Arrow-compute analyzer + per-doc tf: one Arrow batch ->
    pa.Table (doc_id int64, term string, tf int32).

    The C++-vectorized twin of :func:`term_frequencies`: pandas ``.str``
    ops dispatch a Python string method per element, which dominates the
    index build; here lowercasing, symbol replacement, whitespace split,
    identifier/stop classification, suffix lemmatization, and the
    (doc_id, term) count all run inside Arrow compute kernels."""
    import pyarrow as pa
    import pyarrow.compute as pc

    texts = pc.fill_null(texts, "")
    # The one case mapping where Python and utf8proc disagree AND the
    # result lands inside the kept symbol class: Python lowers İ
    # (U+0130) to "i" + combining dot (the dot then splits the token),
    # utf8proc to a bare "i" (token merges).  Pin Python's mapping.
    texts = pc.replace_substring(texts, pattern="İ", replacement="i̇")
    cleaned = pc.replace_substring_regex(
        pc.utf8_lower(texts), pattern=SYMBOL_RE, replacement=" "
    )
    toks_list = pc.utf8_split_whitespace(cleaned)
    flat = pc.list_flatten(toks_list)
    reps = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
    ids_rep = np.repeat(
        doc_ids.to_numpy(zero_copy_only=False).astype(np.int64), reps
    )
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "tf": pa.array([], pa.int32()),
        }
    )
    if len(flat) == 0:
        return empty
    has_alnum = pc.match_substring_regex(flat, pattern=HAS_ALNUM_RE)
    flat = pc.filter(flat, has_alnum)
    ids_rep = ids_rep[has_alnum.to_numpy(zero_copy_only=False)]
    if len(flat) == 0:
        return empty
    ident = pc.match_substring_regex(flat, pattern=r"^(?:" + IDENT_RE + r")$")
    stop = pc.is_in(flat, value_set=pa.array(sorted(STOPWORDS)))
    keep = pc.or_(ident, pc.invert(stop))
    flat = pc.filter(flat, keep)
    ids_rep = ids_rep[keep.to_numpy(zero_copy_only=False)]
    if len(flat) == 0:
        return empty
    ident = pc.filter(ident, keep)
    terms = pc.if_else(ident, flat, _lemmatize_arrow(flat))
    occ = pa.table({"doc_id": pa.array(ids_rep), "term": terms})
    tf = occ.group_by(["doc_id", "term"], use_threads=False).aggregate(
        [([], "count_all")]
    )
    # build by NAME, not position: pyarrow's group_by column ordering
    # (keys-first vs aggregates-first) has differed across releases and
    # the repo pins no lower bound (ADVICE r4)
    return tf.select(["doc_id", "term"]).append_column(
        "tf", pc.cast(tf.column("count_all"), pa.int32())
    )


def term_frequencies(ids: pd.Series, texts: pd.Series) -> pd.DataFrame:
    """Vectorized analyzer + per-doc tf count.

    Output ``(doc_id, term, tf)`` — the postings relation for one Arrow
    batch (reference: HashMap.merge tf count, LemmaFinder.java:65-78).
    Emitting aggregated tf here (instead of exploded occurrences)
    shrinks the shuffle by ~avg-tf x.
    """
    occ = tokens_frame(ids, texts)
    if occ.empty:
        return pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "term": pd.Series(dtype="object"),
                "tf": pd.Series(dtype="int32"),
            }
        )
    tf = occ.groupby(["doc_id", "term"], sort=False).size().reset_index(name="tf")
    tf["tf"] = tf["tf"].astype("int32")
    return tf
