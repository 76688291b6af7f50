"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All pure built-in column expressions (regexp_extract_all / size / md5 —
whole-stage codegen, no Python), so they hold up at 100 TB: narrow
per-row transforms, no shuffle, filters push to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# BPE-ish tokenization: words | numbers | single non-space symbol
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_EN_STOPWORDS_RE = r"(?i)\b(the|and|of|to|in|is|a|that|it|for)\b"
_PUNCT_RE = r"[^A-Za-z0-9\s]"


def token_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_RE), 0))


def whitespace_token_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(r"\S+"), 0))


def stopword_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(_EN_STOPWORDS_RE), 0))


def punct_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(_PUNCT_RE), 0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: lengths, token counts, punctuation and
    stopword ratios.  Downstream filters (e.g. drop docs with
    stopword_ratio < x) stay native predicates → predicate pushdown."""
    c = F.col(text_col)
    n_tok = whitespace_token_count(c)
    return df.withColumns(
        {
            "n_chars_m": F.length(c),
            "n_tokens_ws": n_tok,
            "n_tokens_bpe": token_count(c),
            "punct_ratio": F.round(punct_count(c) / F.greatest(F.length(c), F.lit(1)), 6),
            "stopword_ratio": F.round(
                stopword_count(c) / F.greatest(n_tok, F.lit(1)).cast("double"), 6
            ),
            "mean_token_len": F.round(
                F.length(F.regexp_replace(c, r"\s+", "")) / F.greatest(n_tok, F.lit(1)).cast("double"), 6
            ),
        }
    )


def english_score(col: Column) -> Column:
    """Language-ID heuristic: English stopword hits per whitespace token.
    A real system plugs a model in via mapInPandas; this n-gram/stopword
    heuristic is the deterministic, SQL-checkable baseline."""
    return F.round(
        stopword_count(col) / F.greatest(whitespace_token_count(col), F.lit(1)).cast("double"), 6
    )


def fingerprint(col: Column) -> Column:
    """Normalized content fingerprint: md5 over lowercased alphanumerics.
    Robust to whitespace/punct/case changes — the exact-dedup key."""
    return F.md5(F.lower(F.regexp_replace(col, r"[^A-Za-z0-9]+", "")))
