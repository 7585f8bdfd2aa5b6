"""Text-analysis operators over the documents table (training-data
tier; function kernels in functions/text.py). All Column-expression
based -- the whole pipeline stays in whole-stage codegen."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text


def document_profile(documents: DataFrame) -> DataFrame:
    """Per-document feature row: tokens, word chars, punctuation
    ratio, quality score. The cheap-filter tier every corpus pipeline
    runs first."""
    return documents.select(
        "doc_id",
        "lang",
        text.token_count_expr(F.col("text")).alias("tokens"),
        text.word_chars_expr(F.col("text")).alias("word_chars"),
        text.punct_ratio_expr(F.col("text")).alias("punct_ratio"),
        F.length(F.col("text")).alias("chars"),
    ).orderBy("doc_id")


def language_profile(documents: DataFrame) -> DataFrame:
    """Stopword-vote language ID vs the labeled lang column --
    per-language confusion counts."""
    pred = documents.select(
        "doc_id", "lang", text.langid_scores_expr(F.col("text")).alias("pred_lang")
    )
    return (
        pred.groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("lang", "pred_lang")
    )


def quality_buckets(documents: DataFrame) -> DataFrame:
    """Quality-score histogram per language."""
    q = documents.select(
        "lang", text.quality_score_expr(F.col("text")).alias("q")
    )
    return (
        q.groupBy("lang", F.round(F.col("q"), 2).alias("q_bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("lang", "q_bucket")
    )


def token_stats_by_source(documents: DataFrame) -> DataFrame:
    """Per-source token statistics -- corpus composition report."""
    toks = documents.select(
        "source", text.token_count_expr(F.col("text")).alias("tokens")
    )
    return (
        toks.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("tokens").alias("total_tokens"),
            F.min("tokens").alias("min_tokens"),
            F.max("tokens").alias("max_tokens"),
        )
        .orderBy("source")
    )


def fingerprint_documents(documents: DataFrame) -> DataFrame:
    """Deterministic content fingerprints: md5 (exact-dup signature,
    ParserMapper.java:828-832) + xxhash64 (cheap 64-bit)."""
    return documents.select(
        "doc_id",
        text.md5_signature_expr(F.col("text")).alias("md5_sig"),
        text.doc_fingerprint_expr(F.col("text")).alias("xx64_sig"),
    ).orderBy("doc_id")
