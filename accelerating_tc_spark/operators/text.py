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


def doc_top_terms(documents: DataFrame, k: int = 3, stoplist_n: int = 100) -> DataFrame:
    """(doc_id, rank, token, tf): each document's k most characteristic
    terms — highest term frequency AFTER excluding the corpus's global
    top-`stoplist_n` tokens (a data-derived stoplist, so no hand-curated
    language list leaks into the contract). Ties break token-ascending;
    every step is integer arithmetic, so the SQL oracle is hash-exact with
    no float-rounding fragility.

    Scale posture: tf is a hash aggregate on (doc_id, token); the stoplist
    is `stoplist_n` rows (broadcast anti-join); ranking partitions by
    doc_id — per-document windows, never a global sort. The inverted-index
    building block (token -> doc postings) is the `tf` intermediate.
    """
    from pyspark.sql import Window

    tf = (
        documents.select("doc_id", F.explode(tokens_col()).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stop = F.broadcast(token_counts(documents, top_n=stoplist_n).select("token"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("token"))
    return (
        tf.join(stop, "token", "left_anti")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("doc_id", "rank", "token", "tf")
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
_WINNOW_SET_SCHEMA = "doc_id long, fingerprint long"
_B = np.uint64(1099511628211)  # FNV-ish rolling base (public constant)


def rolling_fingerprints(documents: DataFrame, window: int = 16) -> DataFrame:
    """Winnowing-style rolling-hash fingerprint: min of the rolling hashes of
    all `window`-byte substrings of the normalized text. Vectorized numpy
    per Arrow batch (polynomial rolling hash computed with cumulative
    products in C, no per-byte Python)."""

    # B is odd -> invertible mod 2^64, so prefix hashes vectorize across a
    # WHOLE batch at once: H_j = B^(j-1) · Σ_{k<j} b_k·B^(-k) (all uint64
    # wraparound arithmetic = mod 2^64), and any window's hash is
    # H_{j+w} − H_j·B^w — including windows of the concatenation of many
    # docs, as long as per-doc valid ranges exclude boundary-spanning
    # positions. No per-doc Python loop remains; per-doc mins come from
    # np.minimum.reduceat over the valid slices.
    b_inv = np.uint64(pow(int(_B), -1, 1 << 64))

    def _chunk_fps(enc: list[bytes], w: int) -> np.ndarray:
        lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=len(enc))
        n = int(lens.sum())
        fps = np.zeros(len(enc), dtype=np.int64)
        if n == 0:
            return fps
        b = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.uint64)
        pow_b = np.empty(n + 1, dtype=np.uint64)
        pow_b[0] = 1
        np.cumprod(np.full(n, _B, dtype=np.uint64), out=pow_b[1:])
        pow_inv = np.empty(n, dtype=np.uint64)
        pow_inv[0] = 1
        if n > 1:
            np.cumprod(np.full(n - 1, b_inv, dtype=np.uint64), out=pow_inv[1:])
        h = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(b * pow_inv, out=h[1:])
        h[1:] *= pow_b[:n]  # H_j = B^(j-1) · S_j
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        ends = starts + lens
        long_mask = lens >= w
        if long_mask.any():
            wh = h[w:] - h[:-w] * pow_b[w]  # hash of every w-window
            # trailing dummy so an exclusive end == len(wh) is a legal
            # reduceat index (only even-position segments are kept)
            wh = np.concatenate((wh, np.zeros(1, dtype=np.uint64)))
            vs = starts[long_mask]
            ve = ends[long_mask] - w + 1  # exclusive end of valid positions
            pairs = np.empty(2 * len(vs), dtype=np.int64)
            pairs[0::2], pairs[1::2] = vs, ve
            mins = np.minimum.reduceat(wh, pairs)[0::2]
            fps[long_mask] = mins.astype(np.int64)
        short_mask = (~long_mask) & (lens > 0)
        if short_mask.any():
            s, e, ln = starts[short_mask], ends[short_mask], lens[short_mask]
            vals = h[e] - h[s] * pow_b[ln]  # whole-doc polynomial hash
            fps[short_mask] = vals.astype(np.int64)
        return fps

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            enc = [(t or "").lower().encode() for t in pdf["text"]]
            outs = [
                _chunk_fps(chunk, window) for chunk in _byte_chunks(enc)
            ]
            fps = np.concatenate(outs) if outs else np.zeros(0, dtype=np.int64)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "minhash_fp": fps})

    return documents.select("doc_id", "text").mapInPandas(run, schema=_WINNOW_SCHEMA)


# bound the working set of the batched hash kernels (~6 uint64 arrays +
# a g-wide strided view over the chunk's bytes)
_MAX_CHUNK_BYTES = 4 << 20


def _byte_chunks(enc: list[bytes]) -> Iterator[list[bytes]]:
    i = 0
    while i < len(enc):
        j, nb = i, 0
        while j < len(enc) and (nb == 0 or nb + len(enc[j]) <= _MAX_CHUNK_BYTES):
            nb += len(enc[j])
            j += 1
        yield enc[i:j]
        i = j


def winnowing_fingerprint_set(
    documents: DataFrame, k: int = 16, guarantee: int = 8
) -> DataFrame:
    """TRUE winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03 — public
    algorithm): hash every k-byte substring, then keep each g-window's
    MINIMUM hash; the distinct selected hashes are the document's
    fingerprint SET. Guarantees: any shared substring of length >= k+g-1
    yields a shared fingerprint — the basis for CONTAINMENT detection
    (quotes, partial plagiarism) that whole-document signatures miss.

    Same batched prefix-hash machinery as rolling_fingerprints (modular-
    inverse prefix hashes over the chunk concatenation); the g-window
    minima come from one strided-view min over the global hash array with
    doc-boundary-spanning windows masked by valid ranges. Short docs
    (fewer than g windows) keep the min of what exists; docs shorter than
    k keep their whole-doc hash.
    Output: (doc_id, fingerprint) multi-rows.
    """
    b_inv = np.uint64(pow(int(_B), -1, 1 << 64))

    def _chunk_sets(enc: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
        """(doc_idx, fingerprint) pairs, deduplicated, for one chunk."""
        lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=len(enc))
        n = int(lens.sum())
        if n == 0:
            return (
                np.arange(len(enc), dtype=np.int64),
                np.zeros(len(enc), dtype=np.int64),
            )
        b = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.uint64)
        pow_b = np.empty(n + 1, dtype=np.uint64)
        pow_b[0] = 1
        np.cumprod(np.full(n, _B, dtype=np.uint64), out=pow_b[1:])
        pow_inv = np.empty(n, dtype=np.uint64)
        pow_inv[0] = 1
        if n > 1:
            np.cumprod(np.full(n - 1, b_inv, dtype=np.uint64), out=pow_inv[1:])
        h = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(b * pow_inv, out=h[1:])
        h[1:] *= pow_b[:n]
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        ends = starts + lens

        doc_parts: list[np.ndarray] = []
        fp_parts: list[np.ndarray] = []
        long_mask = lens >= k
        if long_mask.any() and n >= k:
            wh = h[k:] - h[:-k] * pow_b[k]  # every k-gram's hash
            g = guarantee
            if len(wh) >= g:
                smin = np.min(
                    np.lib.stride_tricks.sliding_window_view(wh, g), axis=1
                )
            else:
                smin = np.zeros(0, dtype=np.uint64)
            for i in np.nonzero(long_mask)[0]:
                lo, hi = int(starts[i]), int(ends[i]) - k + 1  # k-gram range
                if hi - lo >= g:
                    sel = np.unique(smin[lo : hi - g + 1])
                else:
                    sel = wh[lo:hi].min(keepdims=True)
                doc_parts.append(np.full(len(sel), i, dtype=np.int64))
                fp_parts.append(sel.astype(np.int64))
        short_mask = ~long_mask
        if short_mask.any():
            s, e, ln = starts[short_mask], ends[short_mask], lens[short_mask]
            vals = (h[e] - h[s] * pow_b[ln]).astype(np.int64)
            doc_parts.append(np.nonzero(short_mask)[0].astype(np.int64))
            fp_parts.append(vals)
        return np.concatenate(doc_parts), np.concatenate(fp_parts)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            enc = [(t or "").lower().encode() for t in pdf["text"]]
            outs = []
            off = 0
            for chunk in _byte_chunks(enc):
                d, f = _chunk_sets(chunk)
                outs.append(
                    pd.DataFrame({"doc_id": ids[off + d], "fingerprint": f})
                )
                off += len(chunk)
            out = (
                pd.concat(outs, ignore_index=True)
                if outs
                else pd.DataFrame({"doc_id": [], "fingerprint": []})
            )
            yield out

    return documents.select("doc_id", "text").mapInPandas(
        run, schema=_WINNOW_SET_SCHEMA
    )


def containment_candidates(
    documents: DataFrame, k: int = 16, guarantee: int = 8, min_shared: int = 2
) -> DataFrame:
    """(doc_a, doc_b, shared_fps): document pairs sharing >= min_shared
    winnowed fingerprints — the containment/partial-overlap detector
    (a long quote of one doc inside another shares its selected
    fingerprints even when whole-document similarity is near zero, which
    MinHash/SimHash cannot see). Join cost ~ fingerprint bucket sizes,
    never all-pairs — the same bucketed shape as the LSH detectors."""
    fps = winnowing_fingerprint_set(documents, k=k, guarantee=guarantee)
    a = fps.withColumnRenamed("doc_id", "doc_a")
    b = fps.withColumnRenamed("doc_id", "doc_b")
    return (
        a.join(b, "fingerprint")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )
