"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

All pure Catalyst column expressions (whole-stage codegen, no UDFs) —
each has an exact ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from searchengine_spark.functions.text import shingles, simple_tokens

#: closed-class markers for the quality stop-ratio (subset that exists
#: in generic English text; pinned, shared with the SQL oracle)
QUALITY_STOPWORDS = ["the", "a", "of", "and", "is", "to", "in"]

#: per-language marker words for the n-gram/keyword language-ID
#: heuristic (deterministic scoring, ties broken by language code)
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht", "ist"],
    "es": ["el", "la", "los", "que", "de", "y"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "zh": ["de", "shi", "bu", "le", "wo", "zai"],
}


#: BPE-ish pre-tokenization segments over lowercased text: letter runs,
#: digit runs, and non-alnum-non-space runs — the GPT-2-style
#: pre-tokenizer shape, simplified to a pattern whose semantics are
#: identical in Java regex (Spark) and RE2 (DuckDB oracle).  Counting
#: these segments approximates subword token counts well enough for
#: corpus budgeting (letters still merge into BPE pieces, but the
#: segment count is the pre-merge upper bound the tokenizer starts from).
BPE_SEGMENT_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_ws_tokens, n_tokens, n_unique, n_bpe_segments) —
    whitespace split vs normalized alnum tokens vs distinct terms vs
    BPE-ish pre-tokenizer segments (see :data:`BPE_SEGMENT_RE`)."""
    bpe = F.size(
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(BPE_SEGMENT_RE), F.lit(0)
        )
    )
    # tokens materialized once (multiple references to the tokenizer
    # EXPRESSION would each re-tokenize — see _shingle_frame note)
    return df.select(
        F.col(id_col),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_ws_tokens"),
        simple_tokens(text_col).alias("_toks"),
        bpe.alias("n_bpe_segments"),
    ).select(
        F.col(id_col),
        "n_ws_tokens",
        F.size(F.col("_toks")).alias("n_tokens"),
        F.size(F.array_distinct(F.col("_toks"))).alias("n_unique"),
        "n_bpe_segments",
    )


def quality_scores(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, avg_token_len, digit_ratio, stop_ratio,
    quality) — cheap heuristics a pretraining filter would gate on.

    quality = clamp(n_tokens/100) * (1 - digit_ratio) *
              (0.5 + 0.5 * min(stop_ratio * 5, 1)) — pinned formula,
    rounded to 6 so the SQL oracle hashes identically.
    """
    # tokens + counts materialized in staged projections: every extra
    # reference to the tokenizer expression re-tokenizes (see
    # dedup._shingle_frame note)
    toks = F.col("_toks")
    n = F.col("_n")
    staged = df.select(
        F.col(id_col), simple_tokens(text_col).alias("_toks")
    ).withColumn("_n", F.size(toks))
    total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    n_digit = F.size(F.filter(toks, lambda t: t.rlike("^[0-9]+$")))
    stop_arr = F.array(*[F.lit(s) for s in QUALITY_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    nf = n.cast("double")
    staged = staged.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.round(F.when(n > 0, total_len / nf).otherwise(0.0), 6).alias("avg_token_len"),
        F.when(n > 0, n_digit / nf).otherwise(F.lit(0.0)).alias("_digit_ratio"),
        F.when(n > 0, n_stop / nf).otherwise(F.lit(0.0)).alias("_stop_ratio"),
    )
    quality = (
        F.least(F.col("n_tokens").cast("double") / 100.0, F.lit(1.0))
        * (F.lit(1.0) - F.col("_digit_ratio"))
        * (F.lit(0.5) + F.lit(0.5) * F.least(F.col("_stop_ratio") * 5.0, F.lit(1.0)))
    )
    return staged.select(
        F.col(id_col),
        "n_tokens",
        "avg_token_len",
        F.round(F.col("_digit_ratio"), 6).alias("digit_ratio"),
        F.round(F.col("_stop_ratio"), 6).alias("stop_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred) — marker-word voting, 'en' fallback.

    Deterministic: score(lang) = count of tokens in the marker list;
    argmax, ties broken toward the alphabetically-last language code
    (mirrors the desc struct sort below AND the SQL oracle's CASE
    chain); 'en' when all scores are 0.
    """
    toks = F.col("_toks")  # materialized once — see _shingle_frame note
    scores = []
    for lang in sorted(LANG_MARKERS):
        marker_arr = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t))).alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.sort_array(F.array(*scores), asc=False)[0]
    pred = F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("en"))
    return df.select(
        F.col(id_col), simple_tokens(text_col).alias("_toks")
    ).select(F.col(id_col), pred.alias("lang_pred"))


def doc_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle_n: int = 3
) -> DataFrame:
    """(doc_id, fingerprint) — min-hash-of-shingles document
    fingerprint (winnowing-style min-sampling, global window).

    Equal fingerprints => likely containment/duplication; cheap
    clustering key for near-dup triage.
    """
    sh = shingles(F.col("_toks"), shingle_n)  # tokens materialized once
    fp = F.array_min(F.transform(sh, lambda s: F.md5(s)))
    return df.select(
        F.col(id_col),
        F.col(text_col),
        simple_tokens(text_col).alias("_toks"),
    ).select(
        F.col(id_col),
        F.coalesce(fp, F.md5(F.lower(F.col(text_col)))).alias("fingerprint"),
    )
