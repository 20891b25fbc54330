"""Column-expression text helpers (pure Catalyst, no UDFs).

``simple_tokens`` is the *SQL-parity* tokenizer used by the
driver-facing queries: lowercase, collapse ``[^a-z0-9]+`` to spaces,
split — chosen because it is expressible identically in ANSI SQL
(DuckDB oracle) and stays entirely inside whole-stage codegen.  The
engine's own analyzer (searchengine_spark.analyzer) is richer
(identifier bypass, stop filter, lemmatizer) and is exercised against
the pure-Python oracle in pytest instead.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

SIMPLE_TOKEN_RE = "[^a-z0-9]+"


def simple_tokens(col: Column | str) -> Column:
    """text -> array<string> of lowercase alnum tokens (no empties)."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.split(F.trim(F.regexp_replace(F.lower(c), SIMPLE_TOKEN_RE, " ")), " ")
    return F.filter(arr, lambda t: t != "")


def shingles(tokens: Column, n: int = 3) -> Column:
    """array<string> tokens -> array<string> of n-word shingles.

    ``transform(sequence(...))`` keeps it in Catalyst; empty/short docs
    yield an empty array.
    """
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tokens) - n),
            lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
