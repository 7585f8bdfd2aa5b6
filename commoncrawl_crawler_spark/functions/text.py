"""Text-analysis scalar functions (training-data pipeline tier).

The reference's text surface is parser-era (HTML parse, charset
detect -- ParserMapper.java:340-733); a modern corpus engine adds
language-ID, quality scoring, token counting, and document
fingerprinting. Everything here is a Column expression (JVM-side,
codegen) -- no Python in the hot path. Each has an exact ANSI-SQL
twin so the DuckDB oracle can verify it.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf

# tiny per-language stopword marker sets for the n-gram/stopword
# language heuristic; production swaps in fastText or CLD3 (not
# available in this container)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "de", "que", "los"),
    "zh": (),  # non-spaced scripts need charset-range tests, not stopwords
}


def token_count_expr(col: Column) -> Column:
    """Whitespace token count; size(split) stays in codegen."""
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(col), r"\s+"))
    )


def word_chars_expr(col: Column) -> Column:
    """Count of word characters (letters/digits/underscore)."""
    return F.length(F.regexp_replace(col, r"[^\w]", ""))


def punct_ratio_expr(col: Column) -> Column:
    """Punctuation density = non-word, non-space chars / total."""
    punct = F.length(F.regexp_replace(col, r"[\w\s]", ""))
    return F.round(punct / F.greatest(F.length(col), F.lit(1)), 6)


def stopword_count_expr(col: Column, lang: str = "en") -> Column:
    """Occurrences of the language's marker stopwords (word-bounded)."""
    markers = LANG_MARKERS.get(lang, ())
    if not markers:
        return F.lit(0)
    pattern = r"\b(?:" + "|".join(markers) + r")\b"
    # count = (len - len(removed)) impossible for words; use size of split-find
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pattern), F.lit(0)))


def quality_score_expr(col: Column) -> Column:
    """Heuristic quality in [0,1]: length band + low punctuation +
    stopword presence. The standard cheap pre-filter tier of a
    training-data pipeline (C4/Gopher-rule style, public recipes)."""
    n = F.length(col)
    length_ok = F.when((n >= 50) & (n <= 20000), 1.0).otherwise(0.3)
    punct_ok = F.when(punct_ratio_expr(col) < 0.2, 1.0).otherwise(0.4)
    stop_ok = F.when(stopword_count_expr(col) > 0, 1.0).otherwise(0.5)
    return F.round((length_ok + punct_ok + stop_ok) / 3, 6)


def langid_scores_expr(col: Column) -> Column:
    """Stopword-vote language ID over the marker sets; returns the
    argmax language code or 'und'. Pure when/otherwise chain."""
    lowered = F.lower(col)
    scores = {
        lang: F.size(
            F.regexp_extract_all(
                lowered, F.lit(r"\b(?:" + "|".join(m) + r")\b"), F.lit(0)
            )
        )
        for lang, m in LANG_MARKERS.items()
        if m
    }
    langs = list(scores)
    best_score: Column = F.lit(0)
    for lang in langs:
        best_score = F.greatest(best_score, scores[lang])
    result = F.lit("und")
    # reversed so earlier langs win ties (deterministic)
    for lang in reversed(langs):
        result = F.when(
            (scores[lang] > 0) & (scores[lang] == best_score), lang
        ).otherwise(result)
    return result


def char_ngrams_expr(col: Column, n: int = 4) -> Column:
    """Array of character n-grams via sequence+transform -- the
    shingle set for Jaccard similarity, without leaving the JVM."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(col) - (n - 1), F.lit(1))),
        lambda i: col.substr(i, F.lit(n)),
    )


# GPT-2-style pretokenizer subset: contraction suffixes, space-glued
# letter runs, digit runs, symbol runs, whitespace. No lookaround, so
# Java regex (Spark) and RE2 (DuckDB oracle) agree on every match.
BPE_TOKEN_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"


def bpe_token_count_expr(col: Column) -> Column:
    """BPE-ish token count: matches of the GPT-2-style pretokenizer
    regex. The whitespace count (token_count_expr) undercounts what a
    subword tokenizer bills for punctuation-heavy text; this is the
    standard cheap estimator of "LLM tokens" without a vocab file."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_PATTERN), F.lit(0)))


def winnow_fingerprints_expr(col: Column, k: int = 8, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): hash every char k-gram, slide a w-hash window, keep
    each window's minimum, distinct+sort the kept hashes. Any shared
    substring of length >= k + w - 1 is guaranteed to share a
    fingerprint -- the rolling-hash selection the reference's MD5
    whole-document signature (ParserMapper.java:828-832) cannot give.

    Arrow-batched pandas UDF (numpy sliding-window min), NOT nested
    transform() exprs: referencing the k-gram hash array inside a
    lambda re-inlines -- and re-evaluates -- the whole md5 subtree per
    window position (O(n^2 * w) md5 calls per document). Hashes are
    the md5->60-bit-bigint form both engines share, so the selected
    fingerprint sets oracle-match exactly.
    """
    @pandas_udf("array<long>")
    def winnow(texts: pd.Series) -> pd.Series:
        md5 = hashlib.md5
        from_bytes = int.from_bytes
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            n = max(len(t) - (k - 1), 1)
            b = t.encode("utf-8")
            # first 15 hex chars == (first 8 digest bytes as big-endian
            # int) >> 4; parsing digest bytes skips the hexdigest
            # string round-trip. ASCII docs (the common case) gram over
            # a memoryview of the encoded bytes -- zero-copy slices and
            # one encode per doc; multi-byte docs keep exact CHAR-gram
            # semantics (what the oracle's substr() does) by slicing
            # the str.
            if len(b) == len(t):
                mv = memoryview(b)
                it = (
                    from_bytes(md5(mv[i : i + k]).digest()[:8], "big") >> 4
                    for i in range(n)
                )
            else:
                it = (
                    from_bytes(
                        md5(t[i : i + k].encode("utf-8")).digest()[:8], "big"
                    )
                    >> 4
                    for i in range(n)
                )
            hs = np.fromiter(it, dtype=np.int64, count=n)
            if n >= w:
                kept = np.lib.stride_tricks.sliding_window_view(hs, w).min(axis=1)
            else:
                kept = hs.min(keepdims=True)
            out.append(np.unique(kept))  # sorted ascending, deduped
        return pd.Series(out)

    return winnow(col)


def doc_fingerprint_expr(col: Column) -> Column:
    """Deterministic 64-bit document fingerprint (content signature).

    The reference uses MD5 over content bytes as the exact-dup
    signature (ParserMapper.java:828-832). xxhash64 keeps it a cheap
    JVM built-in; md5-hex is also exposed for oracle-matched queries
    since DuckDB computes identical md5 strings.
    """
    return F.xxhash64(col)


def md5_signature_expr(col: Column) -> Column:
    return F.md5(col)
