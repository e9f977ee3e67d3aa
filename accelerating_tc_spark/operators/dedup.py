"""Deduplication operators over the `documents` table.

Four families, smallest-to-largest recall/cost (training-data pipeline):
- exact: hash-groupBy on the normalized-text fingerprint (one shuffle).
- n-gram Jaccard: word-shingle self-join with exact similarity — the
  SQL-expressible oracle family (the same plan runs in DuckDB).
- MinHash + LSH: signature -> bands -> bucket join; candidates verified by
  exact Jaccard. The 100 TB path (no all-pairs join; cost ~ bucket sizes).
- SimHash: 64-bit signature + Hamming banding (4x16-bit chunks).

All signature math is JVM-side (xxhash64 + array functions) — no Python in
the hot path; only the simhash bit-fold uses a vectorized pandas kernel.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import TOKEN_SPLIT, tokens_col

# ---------------------------------------------------------------- exact

def exact_duplicate_groups(documents: DataFrame) -> DataFrame:
    """(doc_id, group_id) for docs whose normalized text appears >1 time;
    group_id = smallest doc_id in the group."""
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    fp = documents.select("doc_id", F.md5(norm).alias("fingerprint"))
    w = Window.partitionBy("fingerprint")
    return (
        fp.withColumn("group_id", F.min("doc_id").over(w))
        .withColumn("group_size", F.count(F.lit(1)).over(w))
        .where(F.col("group_size") > 1)
        .select("doc_id", "group_id")
    )


# ----------------------------------------------------- n-gram Jaccard

def word_shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct word n-grams, built ARRAY-SIDE:
    transform(sequence(...)) over the token array — zero shuffles (the old
    posexplode + Window(doc_id, pos) plan sorted every token through an
    exchange; this mirrors the DuckDB oracle's list_transform construction).
    Docs with fewer than n tokens yield no rows (explode of null)."""
    base = documents.select("doc_id", tokens_col().alias("toks"))
    t = F.col("toks")
    arr = F.when(
        F.size(t) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (n - 1)),
                lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(n)]),
            )
        ),
    )
    return base.select("doc_id", F.explode(arr).alias("shingle"))


def ngram_jaccard_pairs(
    documents: DataFrame, n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """All pairs (doc_a < doc_b) with shingle-Jaccard >= threshold.

    Exact (no hashing): shingle self-join -> per-pair intersection counts ->
    jaccard = inter / (|A| + |B| - inter). Quadratic in the worst case —
    the oracle/verifier; MinHash-LSH below is the scale path.
    """
    sh = word_shingles(documents, n=n).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.withColumnRenamed("doc_id", "doc_a")
    b = sh.withColumnRenamed("doc_id", "doc_b")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a")
    sb = sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------- MinHash LSH

# Mersenne prime 2^31-1: (h mod M) * a + b stays < 2^62, no int64 overflow.
_MERSENNE = (1 << 31) - 1


def minhash_signatures(documents: DataFrame, k: int = 64, n: int = 3, seed: int = 42) -> DataFrame:
    """(doc_id, sig array<long>) — k permutation mins over shingle hashes.

    Shingle -> int64 via xxhash64; permutation i applies
    (a_i * h + b_i) mod (2^31 - 1) with coefficients derived
    deterministically from `seed`. The k mins are k plain min() aggregate
    columns folded into an array: a single shuffle, k JVM expressions, no
    Python anywhere.
    """
    rng = np.random.default_rng(seed)
    coef_a = rng.integers(1, _MERSENNE, size=k, dtype=np.int64)
    coef_b = rng.integers(0, _MERSENNE, size=k, dtype=np.int64)
    sh = word_shingles(documents, n=n)
    hashed = sh.select("doc_id", (F.abs(F.xxhash64("shingle")) % F.lit(_MERSENNE)).alias("h"))
    mins = [
        F.min(
            (F.col("h") * F.lit(int(coef_a[i])) + F.lit(int(coef_b[i]))) % F.lit(_MERSENNE)
        ).alias(f"m{i}")
        for i in range(k)
    ]
    agg = hashed.groupBy("doc_id").agg(*mins)
    return agg.select("doc_id", F.array(*[f"m{i}" for i in range(k)]).alias("sig"))


def suggest_minhash_params(
    n_docs: int, threshold: float = 0.8, target_recall: float = 0.999
) -> tuple[int, int]:
    """(bands, rows_per_band) scaled to corpus size.

    rows_per_band grows ~log10(n): the band-collision probability for a
    sub-threshold pair is j^r, so r is the lever that keeps near-miss
    candidate mass bounded as the corpus grows. bands is then the smallest
    count meeting the recall target 1-(1-t^r)^b >= target_recall at
    j = threshold. Signature length k = bands * rows_per_band.
    """
    import math

    r = max(2, min(8, round(math.log10(max(n_docs, 10)))))
    miss_one_band = 1.0 - threshold**r
    b = max(4, math.ceil(math.log(1.0 - target_recall) / math.log(miss_one_band)))
    return b, r


def _band_rows(signatures: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """(doc_id, band, bucket): one xxhash64 bucket per signature band."""
    assert bands * rows_per_band >= 1
    return signatures.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.slice("sig", b * rows_per_band + 1, rows_per_band), F.lit(7)
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """(doc_a, doc_b) candidates sharing >= 1 LSH band bucket.

    Band hash = xxhash64 over the band's signature slice; bucket join is a
    plain shuffle join on (band, band_hash) — linear in bucket sizes, never
    all-pairs.
    """
    rows = _band_rows(signatures, bands, rows_per_band)
    a = rows.withColumnRenamed("doc_id", "doc_a")
    b = rows.withColumnRenamed("doc_id", "doc_b")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_dedup_pairs(
    documents: DataFrame,
    threshold: float = 0.8,
    k: int = 64,
    n: int = 3,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """LSH candidates verified by exact shingle Jaccard >= threshold.

    Two-stage plan: candidate generation is linear (band buckets); exact
    verification joins shingles only for candidate pairs (semi-join
    pushdown), so the quadratic blow-up of ngram_jaccard_pairs never
    happens. This is the at-scale near-dup detector.
    """
    rows_per_band = max(k // bands, 1)
    sigs = minhash_signatures(documents, k=k, n=n, seed=seed)
    cands = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=rows_per_band)
    sh = word_shingles(documents, n=n)
    # restrict shingles to candidate docs before the verification join
    cand_docs = cands.select(F.col("doc_a").alias("doc_id")).union(
        cands.select(F.col("doc_b").alias("doc_id"))
    ).distinct()
    sh_c = sh.join(cand_docs, "doc_id", "left_semi").cache()
    sizes = sh_c.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh_c.withColumnRenamed("doc_id", "doc_a")
    b = sh_c.withColumnRenamed("doc_id", "doc_b")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
        .join(cands, ["doc_a", "doc_b"], "left_semi")
    )
    sa = sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a")
    sb = sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )


def near_dup_groups(
    spark,
    documents: DataFrame,
    threshold: float = 0.8,
    k: int = 64,
    n: int = 3,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """(doc_id, group_id): connected components over the verified near-dup
    pair graph — the step that turns pairwise matches into dedup DECISIONS
    (keep one doc per group). group_id = smallest doc_id reachable through
    near-dup pairs; docs with no near-dup partner are absent (singletons
    need no decision)."""
    from . import components

    pairs = minhash_dedup_pairs(
        documents, threshold=threshold, k=k, n=n, bands=bands, seed=seed
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    comp = components.connected_components(spark, pairs)
    return comp.select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("group_id")
    )


def minhash_dedup_stats(
    documents: DataFrame,
    threshold: float = 0.8,
    k: int = 64,
    n: int = 3,
    bands: int = 16,
    seed: int = 42,
) -> dict:
    """Volume diagnostics for the MinHash+LSH plan: candidate-pair count,
    bucket-size distribution (max / p50 / p99 of non-singleton buckets),
    and verified-pair count. The bucket distribution is THE scale health
    metric — a runaway bucket means rows_per_band is too small for the
    corpus (see suggest_minhash_params)."""
    rows_per_band = max(k // bands, 1)
    sigs = minhash_signatures(documents, k=k, n=n, seed=seed).cache()
    rows = _band_rows(sigs, bands, rows_per_band)
    bucket_sizes = (
        rows.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("sz"))
        .where(F.col("sz") > 1)
    )
    bstats = bucket_sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("sz").alias("max_bucket"),
        F.expr("percentile(sz, 0.5)").alias("p50_bucket"),
        F.expr("percentile(sz, 0.99)").alias("p99_bucket"),
    ).first()
    n_cands = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=rows_per_band).count()
    n_verified = minhash_dedup_pairs(
        documents, threshold=threshold, k=k, n=n, bands=bands, seed=seed
    ).count()
    sigs.unpersist()
    return {
        "candidates": n_cands,
        "verified_pairs": n_verified,
        "collision_buckets": int(bstats["n_buckets"] or 0),
        "max_bucket": int(bstats["max_bucket"] or 0),
        "p50_bucket": float(bstats["p50_bucket"] or 0),
        "p99_bucket": float(bstats["p99_bucket"] or 0),
    }


def synthetic_near_dup_corpus(
    spark, n_docs: int, words_per_doc: int = 120, vocab: int = 5000
) -> DataFrame:
    """Deterministic distributed corpus with PLANTED near-dup clusters:
    in every stride of 10 doc ids, docs base+1 and base+2 are one-word
    mutations of doc base (shingle Jaccard ~0.95 for 3-shingles at 120
    words — comfortably past the 0.8 near-dup threshold), the other 7 are
    independent. Built entirely with JVM expressions (spark.range + hash
    words), so a 100k+-doc bench corpus never touches the driver."""
    i = F.col("id")
    off = F.pmod(i, F.lit(10))
    is_var = off.isin(1, 2)
    base = F.when(is_var, i - off).otherwise(i)
    mut_pos = F.pmod(i * 13, F.lit(words_per_doc - 6)) + 3  # interior position

    def word(owner: F.Column, j: F.Column) -> F.Column:
        # purely ALPHABETIC pseudo-words (the tokenizer drops digits):
        # hash -> 3 lowercase letters, vocab capped at 26^3
        h = F.pmod(
            F.xxhash64(F.concat_ws("-", owner.cast("string"), j.cast("string"))),
            F.lit(min(vocab, 26**3)),
        )
        return F.concat(
            F.char(F.lit(97) + F.pmod(h, F.lit(26))),
            F.char(F.lit(97) + F.pmod(F.floor(h / 26), F.lit(26))),
            F.char(F.lit(97) + F.pmod(F.floor(h / 676), F.lit(26))),
        )

    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
            lambda j: F.when(is_var & (j == mut_pos), word(i, j)).otherwise(
                word(base, j)
            ),
        ),
    )
    return spark.range(0, n_docs).select(i.alias("doc_id"), text.alias("text"))


# -------------------------------------------------------------- SimHash

_SIMHASH_SCHEMA = "doc_id long, simhash long"


def simhash_signatures(documents: DataFrame) -> DataFrame:
    """64-bit SimHash per doc: sign of the weighted sum of token-hash bits.

    Token hashing stays JVM-side (xxhash64); only the bit-fold runs in a
    vectorized numpy kernel over Arrow batches of (doc_id, token_hashes).
    """
    toks = documents.select("doc_id", tokens_col().alias("toks"))
    hashed = toks.select(
        "doc_id", F.transform("toks", lambda t: F.xxhash64(t)).alias("hs")
    )

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit_idx = np.arange(64, dtype=np.uint64)
        # chunk by cumulative token count so the (tokens x 64) bit matrix
        # stays bounded (~128 MB) regardless of batch shape
        max_chunk_tokens = 250_000

        def fold_rows(arrs: list[np.ndarray]) -> np.ndarray:
            lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=len(arrs))
            out = np.zeros(len(arrs), dtype=np.int64)
            ne = np.nonzero(lens > 0)[0]
            if ne.size == 0:
                return out
            flat = np.concatenate([arrs[i] for i in ne]).astype(np.uint64)
            bits = ((flat[:, None] >> bit_idx) & np.uint64(1)).astype(np.int64)
            starts = np.concatenate(([0], np.cumsum(lens[ne])[:-1]))
            sums = np.add.reduceat(bits, starts, axis=0)  # (n_nonempty, 64)
            votes = 2 * sums - lens[ne][:, None]
            sig_bits = (votes >= 0).astype(np.uint64)
            out[ne] = ((sig_bits << bit_idx).sum(axis=1, dtype=np.uint64)).astype(np.int64)
            return out

        for pdf in batches:
            arrs = [
                np.asarray(h, dtype=np.int64) if h is not None else np.empty(0, np.int64)
                for h in pdf["hs"]
            ]
            outs = []
            i = 0
            while i < len(arrs):
                j, tok = i, 0
                while j < len(arrs) and (tok == 0 or tok + len(arrs[j]) <= max_chunk_tokens):
                    tok += len(arrs[j])
                    j += 1
                outs.append(fold_rows(arrs[i:j]))
                i = j
            out = np.concatenate(outs) if outs else np.zeros(0, dtype=np.int64)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})

    return hashed.mapInPandas(fold, schema=_SIMHASH_SCHEMA)


def simhash_near_dup_pairs(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(doc_a, doc_b, hamming) with Hamming distance <= max_hamming."""
    return simhash_pairs_from_signatures(
        simhash_signatures(documents), max_hamming=max_hamming
    )


def simhash_pairs_from_signatures(sig: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Banding + verification over a (doc_id, simhash) table.

    Banding: 4 chunks of 16 bits — any pair within Hamming<=3 shares at
    least one exact chunk (pigeonhole), so candidates come from 4 cheap
    equality joins; verification is a popcount expression (JVM-side).
    Split from simhash_near_dup_pairs so the signature table can round-trip
    through a parquet fixture the DuckDB oracle reads — the banding and
    Hamming stages ARE SQL-expressible and get exact oracle coverage even
    though xxhash64 itself has no DuckDB equivalent.
    """
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned("simhash", c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("v"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select("doc_id", "simhash", "cc.chunk", "cc.v")
    a = chunks.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"), "chunk", "v"
    )
    b = chunks.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"), "chunk", "v"
    )
    cand = (
        a.join(b, ["chunk", "v"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.select("doc_a", "doc_b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )
