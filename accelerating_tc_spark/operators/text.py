"""Text analysis over the `documents` table (training-data pipeline ops).

Everything here stays in built-in pyspark.sql.functions (JVM-side,
whole-stage codegen) except the rolling-hash fingerprint, which is a
vectorized pandas kernel. Token semantics are pinned to the regex
``[^a-z]+`` over lowercased text so the DuckDB oracles in
__spark_entry__.py tokenize identically.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z]+"

# tiny public stopword samples per language (language-ID heuristic)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "a"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"),
    "fr": ("le", "la", "les", "et", "est", "pas", "un", "une", "avec", "pour"),
    "es": ("el", "la", "los", "las", "y", "es", "no", "un", "una", "con"),
}


def tokens_col(text_col: str = "text") -> F.Column:
    """Lowercased alpha tokens, empties removed — shared by all text ops."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda t: F.length(t) > 0
    )


def doc_stats(documents: DataFrame) -> DataFrame:
    """Per-document quality features: token count, char length, punctuation
    ratio, stopword ratio (en), mean token length, and a [0,1] quality score
    (monotone in length, penalized by punctuation excess)."""
    toks = tokens_col().alias("toks")
    base = documents.select("doc_id", "text", toks)
    n_tokens = F.size("toks")
    n_chars = F.length("text")
    punct = n_chars - F.length(F.regexp_replace("text", r"[.,;:!?]", ""))
    stop_hits = F.size(
        F.filter("toks", lambda t: t.isin(*LANG_STOPWORDS["en"]))
    )
    tok_chars = F.aggregate(
        "toks", F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return base.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_chars.cast("long").alias("n_chars"),
        F.round(punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(stop_hits / F.greatest(n_tokens, F.lit(1)), 6).alias("stop_ratio"),
        F.round(tok_chars / F.greatest(n_tokens, F.lit(1)), 6).alias("mean_token_len"),
        F.round(
            F.least(n_tokens / F.lit(100.0), F.lit(1.0))
            * (F.lit(1.0) - F.least(punct / F.greatest(n_chars, F.lit(1)) * 4, F.lit(1.0))),
            6,
        ).alias("quality_score"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Predicted language by stopword hits; deterministic tie-break
    (count desc, lang asc); 'und' (undetermined) when nothing matches."""
    base = documents.select("doc_id", tokens_col().alias("toks"))
    scores = [
        F.size(F.filter("toks", lambda t: t.isin(*words))).alias(f"score_{lang}")
        for lang, words in sorted(LANG_STOPWORDS.items())
    ]
    scored = base.select("doc_id", *scores)
    # argmax with (score desc, lang asc): fold over the sorted language list
    pred = F.lit("und")
    best = F.lit(0)
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        s = F.col(f"score_{lang}")
        pred = F.when(s >= F.greatest(best, F.lit(1)), F.lit(lang)).otherwise(pred)
        best = F.greatest(best, s)
    return scored.select("doc_id", pred.alias("pred_lang"), best.cast("long").alias("score"))


def token_counts(documents: DataFrame, top_n: int = 100) -> DataFrame:
    """Global token frequencies, deterministic top-N (count desc, token asc)."""
    return (
        documents.select(F.explode(tokens_col()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(top_n)
    )


def doc_fingerprint(documents: DataFrame) -> DataFrame:
    """Whole-document fingerprint: md5 of whitespace-normalized lowercase
    text — the exact-dedup key (SQL-oracle-able in DuckDB)."""
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    return documents.select("doc_id", F.md5(norm).alias("fingerprint"))


def clean_corpus(
    documents: DataFrame,
    min_tokens: int = 50,
    min_quality: float = 0.2,
    langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """The canonical training-data cleaning pipeline, composed from the
    scoring + dedup operators: keep documents that (a) pass the length and
    quality gates, (b) are in an accepted language, and (c) are the
    canonical (minimum-id) copy within their exact-duplicate group.
    Returns (doc_id, pred_lang, n_tokens, quality_score)."""
    from . import dedup

    stats = doc_stats(documents).select("doc_id", "n_tokens", "quality_score")
    lang = lang_id(documents).select("doc_id", "pred_lang")
    non_canonical_dups = dedup.exact_duplicate_groups(documents).where(
        F.col("doc_id") != F.col("group_id")
    )
    return (
        documents.select("doc_id")
        .join(stats, "doc_id")
        .join(lang, "doc_id")
        .where(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("quality_score") >= min_quality)
            & F.col("pred_lang").isin(*langs)
        )
        .join(non_canonical_dups, "doc_id", "left_anti")
        .select("doc_id", "pred_lang", "n_tokens", "quality_score")
    )


_WINNOW_SCHEMA = "doc_id long, minhash_fp long"
_B = np.uint64(1099511628211)  # FNV-ish rolling base (public constant)


def rolling_fingerprints(documents: DataFrame, window: int = 16) -> DataFrame:
    """Winnowing-style rolling-hash fingerprint: min of the rolling hashes of
    all `window`-byte substrings of the normalized text. Vectorized numpy
    per Arrow batch (polynomial rolling hash computed with cumulative
    products in C, no per-byte Python)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = np.zeros(len(pdf), dtype=np.int64)
            for i, txt in enumerate(pdf["text"]):
                b = np.frombuffer((txt or "").lower().encode(), dtype=np.uint8).astype(np.uint64)
                if len(b) < window:
                    h = np.uint64(0)
                    for x in b:
                        h = h * _B + x
                    fps[i] = np.int64(h)
                    continue
                # rolling hash via strided window matmul-free evaluation:
                # h_j = sum b[j+k] * B^(w-1-k); evaluate with a cumulative trick
                powers = _B ** np.arange(window - 1, -1, -1, dtype=np.uint64)
                win = np.lib.stride_tricks.sliding_window_view(b, window)
                hashes = (win * powers).sum(axis=1)  # uint64 wraparound = mod 2^64
                fps[i] = np.int64(hashes.min().astype(np.int64))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "minhash_fp": fps})

    return documents.select("doc_id", "text").mapInPandas(run, schema=_WINNOW_SCHEMA)
