"""Analyzer contract tests (FIXTURES.md §4): pure-Python and vectorized
paths can never drift apart, and the pinned rules behave as specified
(tokenizer class, identifier bypass, stop filter, suffix rules)."""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from searchengine_spark.analyzer import (
    STOPWORDS,
    analyze_text,
    is_identifier,
    lemmatize_token,
    term_frequencies,
    tokenize_text,
)

CASES = [
    # (text, expected terms incl. repeats)
    ("Hello World", ["hello", "world"]),
    ("the a of and", []),  # all stopwords
    ("The Indexed Queries", ["index", "query"]),
    ("42 7", ["42", "7"]),  # '7': not a digit-seq identifier, not a stopword -> kept
    ("foo-bar baz", ["foo-bar", "baz"]),
    ("src/main/App.java", ["src/main/app", "java"]),  # '.' breaks the token
    ("x == y && z", ["x", "y", "z"]),
    ("builders building builds", ["builder", "build", "build"]),
    ("classes class", ["class", "class"]),
    ("", []),
    ("   \n\t  ", []),
    ("--- // -", []),
    ("CamelCase snake_case", ["camelcase", "snake", "case"]),
    ("12-34-ab", ["12-34-ab"]),  # hyphenated identifier, verbatim
    ("was were is", []),
]


@pytest.mark.parametrize("text,expected", CASES)
def test_analyze_cases(text, expected):
    assert analyze_text(text) == expected


def test_case_7_kept():
    # '7' is a 1-digit token: not an identifier (needs >= 2 digits), not
    # a stopword -> survives as itself
    assert analyze_text("42 7") == ["42", "7"]


def test_identifier_patterns():
    assert is_identifier("42")
    assert is_identifier("123456")
    assert not is_identifier("4")  # single digit: not a digit-seq id
    assert is_identifier("12-34-ab")
    assert is_identifier("foo-bar")
    assert is_identifier("src/main/java")
    assert not is_identifier("plain")
    assert not is_identifier("the")


def test_identifier_bypasses_stop_and_lemma():
    # 'the-end' is hyphenated -> identifier -> verbatim even though 'the'
    # is a stopword and 'end' would otherwise pass through the lemmatizer
    assert analyze_text("the-end") == ["the-end"]


def test_lemmatizer_rules():
    assert lemmatize_token("queries") == "query"
    assert lemmatize_token("classes") == "class"
    assert lemmatize_token("building") == "build"
    assert lemmatize_token("indexed") == "index"
    assert lemmatize_token("tables") == "table"
    assert lemmatize_token("class") == "class"  # ss excluded
    assert lemmatize_token("status") == "status"  # us excluded
    assert lemmatize_token("this") == "this"  # is excluded
    assert lemmatize_token("gas") == "gas"  # len < 4: unchanged
    assert lemmatize_token("ring") == "ring"  # len < 6: 'ing' kept


def _vec_counter(text: str) -> Counter:
    out = term_frequencies(pd.Series([0]), pd.Series([text]))
    return Counter(dict(zip(out["term"], out["tf"])))


@pytest.mark.parametrize("text,_", CASES)
def test_vectorized_parity_cases(text, _):
    assert _vec_counter(text) == Counter(analyze_text(text))


@given(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs", "Sm"),
            whitelist_characters="-/_\n\t",
        ),
        max_size=300,
    )
)
@settings(max_examples=150, deadline=None)
def test_vectorized_parity_fuzz(text):
    assert _vec_counter(text) == Counter(analyze_text(text))


def test_multi_row_batch():
    texts = ["index the index", "", "foo-bar foo-bar baz", "the of and"]
    out = term_frequencies(pd.Series(range(4)), pd.Series(texts))
    got = {
        (int(r.doc_id), r.term): int(r.tf) for r in out.itertuples(index=False)
    }
    assert got == {(0, "index"): 2, (2, "foo-bar"): 2, (2, "baz"): 1}


def test_stopwords_are_closed_class():
    # stop set must never contain code keywords (they carry signal)
    for kw in ["def", "class", "import", "return", "new", "while", "function"]:
        assert kw not in STOPWORDS


def test_tokenize_strips_symbols():
    assert tokenize_text("a+b=c; d(e)") == ["a", "b", "c", "d", "e"]


def _arrow_counter(text: str) -> Counter:
    import pyarrow as pa

    from searchengine_spark.analyzer import analyze_batch_arrow

    tbl = analyze_batch_arrow(
        pa.array([0], pa.int64()), pa.array([text], pa.string())
    )
    return Counter(
        dict(
            zip(
                tbl.column("term").to_pylist(),
                (int(x) for x in tbl.column("tf").to_pylist()),
            )
        )
    )


@pytest.mark.parametrize("text,_", CASES)
def test_arrow_parity_cases(text, _):
    assert _arrow_counter(text) == Counter(analyze_text(text))


@given(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs", "Sm"),
            whitelist_characters="-/_\n\t",
        ),
        max_size=300,
    )
)
@settings(max_examples=150, deadline=None)
def test_arrow_parity_fuzz(text):
    """The Arrow-compute analyzer (the build's mapInArrow hot path) can
    never drift from the pure-Python contract — including the İ case
    mapping where Python and utf8proc disagree (pinned in
    analyze_batch_arrow)."""
    assert _arrow_counter(text) == Counter(analyze_text(text))
