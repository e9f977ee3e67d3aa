"""Text analysis + dedup operators vs pure-python oracles on synthetic docs."""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import pytest

from accelerating_tc_spark.operators import dedup, text


def make_docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy cat", "en"),  # near-dup of 0
        (2, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup of 0
        (3, "der hund und die katze sind nicht ein team", "de"),
        (4, "le chat et le chien sont avec la maison", "fr"),
        (5, "el perro y el gato no son un equipo", "es"),
        (6, "completely unrelated text about spark engines and shuffles", "en"),
        (7, "THE QUICK  brown fox jumps over the lazy dog", "en"),  # dup after norm
        (8, "", "en"),
        (9, "zzz qqq xxx", "und"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def py_tokens(t: str) -> list[str]:
    return [x for x in re.split(r"[^a-z]+", t.lower()) if x]


def py_shingles(t: str, n=3) -> set[str]:
    toks = py_tokens(t)
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def py_jaccard(a: set, b: set) -> float:
    return len(a & b) / len(a | b) if a | b else 0.0


def test_doc_stats_matches_python(spark):
    docs = make_docs(spark)
    got = {r["doc_id"]: r for r in text.doc_stats(docs).collect()}
    for doc_id, t, _ in make_docs(spark).collect():
        toks = py_tokens(t)
        assert got[doc_id]["n_tokens"] == len(toks)
        assert got[doc_id]["n_chars"] == len(t)
        punct = sum(1 for c in t if c in ".,;:!?")
        assert abs(got[doc_id]["punct_ratio"] - round(punct / max(len(t), 1), 6)) < 1e-9


def test_lang_id(spark):
    docs = make_docs(spark)
    got = {r["doc_id"]: r["pred_lang"] for r in text.lang_id(docs).collect()}
    assert got[0] == "en"
    assert got[3] == "de"
    assert got[4] == "fr"
    assert got[5] == "es"
    assert got[9] == "und"


def test_token_counts(spark):
    docs = make_docs(spark)
    got = [(r["token"], r["cnt"]) for r in text.token_counts(docs, top_n=3).collect()]
    from collections import Counter

    c = Counter()
    for _, t, _ in make_docs(spark).collect():
        c.update(py_tokens(t))
    expected = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert got == expected


def test_doc_top_terms(spark):
    docs = make_docs(spark)
    k, stop_n = 2, 3
    got = [
        (r["doc_id"], r["rank"], r["token"], r["tf"])
        for r in text.doc_top_terms(docs, k=k, stoplist_n=stop_n)
        .orderBy("doc_id", "rank")
        .collect()
    ]
    from collections import Counter

    corpus = Counter()
    rows = make_docs(spark).collect()
    for _, t, _ in rows:
        corpus.update(py_tokens(t))
    stop = {t for t, _ in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:stop_n]}
    expected = []
    for did, t, _ in sorted(rows):
        tf = Counter(tok for tok in py_tokens(t) if tok not in stop)
        for rank, (tok, n) in enumerate(
            sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:k], start=1
        ):
            expected.append((did, rank, tok, n))
    assert got == expected
    # empty doc (8) contributes no rows; ranks are 1..k contiguous per doc
    assert all(r[0] != 8 for r in got)


def test_fingerprint_and_exact_dedup(spark):
    docs = make_docs(spark)
    fp = {r["doc_id"]: r["fingerprint"] for r in text.doc_fingerprint(docs).collect()}
    assert fp[0] == fp[2] == fp[7]  # whitespace/case-normalized dup
    assert fp[0] != fp[1]
    groups = {r["doc_id"]: r["group_id"] for r in dedup.exact_duplicate_groups(docs).collect()}
    assert groups == {0: 0, 2: 0, 7: 0}


def test_rolling_fingerprints_deterministic(spark):
    docs = make_docs(spark)
    a = {r["doc_id"]: r["minhash_fp"] for r in text.rolling_fingerprints(docs).collect()}
    b = {r["doc_id"]: r["minhash_fp"] for r in text.rolling_fingerprints(docs).collect()}
    assert a == b
    assert a[0] == a[2]  # same text -> same fingerprint
    assert a[0] != a[6]


def test_ngram_jaccard_pairs_matches_python(spark):
    docs = make_docs(spark)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    expected = {}
    ids = sorted(texts)
    for i in ids:
        for j in ids:
            if i < j:
                ja = py_jaccard(py_shingles(texts[i]), py_shingles(texts[j]))
                if ja >= 0.5:
                    expected[(i, j)] = round(ja, 6)
    assert set(got) == set(expected)
    for k in expected:
        assert abs(got[k] - expected[k]) < 1e-6


def test_minhash_lsh_finds_near_dups(spark):
    docs = make_docs(spark)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_dedup_pairs(docs, threshold=0.5, k=64, bands=16).collect()
    }
    # exact dups and the one-word-changed near-dup must be found
    assert (0, 2) in pairs
    assert (0, 7) in pairs
    assert (2, 7) in pairs
    assert (0, 1) in pairs
    # verification stage: no false positives below the threshold
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for a, b in pairs:
        assert py_jaccard(py_shingles(texts[a]), py_shingles(texts[b])) >= 0.5


def test_simhash_near_dups(spark):
    docs = make_docs(spark)
    sig = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(docs).collect()}
    assert sig[0] == sig[2] == sig[7]  # token-identical docs -> same simhash
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_near_dup_pairs(docs, max_hamming=8).collect()
    }
    assert pairs[(0, 2)] == 0
    assert (0, 1) in pairs  # near-dup within a few bits


def test_near_dup_groups_transitive(spark):
    """A~B and B~C near-dups must land in one group even if A~C misses the
    threshold (transitive closure via CC)."""
    from accelerating_tc_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog " * 20
    rows = [
        (1, base),
        (2, base + " extra tail words here"),
        (3, base + " extra tail words here and even more drift appended"),
        (4, "completely different text about spark engines " * 20),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    groups = {
        r["doc_id"]: r["group_id"]
        for r in dedup.near_dup_groups(spark, docs, threshold=0.5).collect()
    }
    assert groups.get(1) == 1 and groups.get(2) == 1 and groups.get(3) == 1
    assert 4 not in groups  # no near-dup partner -> no decision needed


def test_clean_corpus_gates(spark):
    from accelerating_tc_spark.operators import text as T

    en = "the quick brown fox and the lazy dog that is for with a " * 10
    rows = [
        (1, en),                          # passes
        (2, en),                          # exact dup of 1 -> dropped
        (3, "der die das und ist nicht ein mit " * 12),  # German -> dropped
        (4, "short text"),                # too short -> dropped
        (5, en + " unique suffix tokens"),  # passes (not an exact dup)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(
        r["doc_id"]
        for r in T.clean_corpus(docs, min_tokens=50, min_quality=0.0).collect()
    )
    assert kept == [1, 5]


def test_synthetic_near_dup_corpus_planted_clusters(spark):
    """The distributed bench corpus must contain exactly the planted
    near-dup pairs (3 per 10-doc stride), and the LSH plan with
    suggest_minhash_params must recover them all (verified == exact)."""
    from accelerating_tc_spark.operators import dedup

    n = 100
    docs = dedup.synthetic_near_dup_corpus(spark, n).cache()
    assert docs.count() == n
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    expected = set()
    for base in range(0, n, 10):
        expected |= {(base, base + 1), (base, base + 2), (base + 1, base + 2)}
    assert exact == expected
    bands, rpb = dedup.suggest_minhash_params(n, threshold=0.8)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_dedup_pairs(
            docs, threshold=0.8, k=bands * rpb, bands=bands
        ).collect()
    }
    assert got == exact
    stats = dedup.minhash_dedup_stats(docs, threshold=0.8, k=bands * rpb, bands=bands)
    assert stats["verified_pairs"] == len(exact)
    assert stats["candidates"] >= len(exact)
    assert stats["max_bucket"] >= 2


def test_suggest_minhash_params_scaling():
    from accelerating_tc_spark.operators import dedup

    b_small, r_small = dedup.suggest_minhash_params(500, threshold=0.8)
    b_big, r_big = dedup.suggest_minhash_params(100_000, threshold=0.8)
    assert r_big > r_small  # selectivity grows with corpus size
    # recall target holds at the threshold for both
    for b, r in ((b_small, r_small), (b_big, r_big)):
        recall = 1 - (1 - 0.8**r) ** b
        assert recall >= 0.999


def test_rolling_fingerprints_vectorized_equivalence(spark):
    """The batched prefix-hash winnowing must equal the per-doc
    sliding-window reference computation bit-for-bit (uint64 wraparound,
    unsigned min), including short docs, empty docs, and None."""
    import numpy as np
    import pandas as pd

    from accelerating_tc_spark.operators import text as T

    rng = np.random.default_rng(11)
    docs = []
    for i in range(40):
        n = int(rng.integers(0, 120))
        docs.append("".join(chr(int(c)) for c in rng.integers(97, 123, n)))
    docs += ["", None, "exactly16bytes!!", "short"]
    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    df = spark.createDataFrame(pdf, schema="doc_id long, text string")
    got = {
        r["doc_id"]: r["minhash_fp"]
        for r in T.rolling_fingerprints(df, window=16).collect()
    }

    B = np.uint64(1099511628211)
    for i, txt in enumerate(docs):
        b = np.frombuffer((txt or "").lower().encode(), dtype=np.uint8).astype(np.uint64)
        if len(b) < 16:
            h = np.uint64(0)
            for x in b:
                h = h * B + x
            expected = np.int64(h)
        else:
            powers = B ** np.arange(15, -1, -1, dtype=np.uint64)
            win = np.lib.stride_tricks.sliding_window_view(b, 16)
            expected = np.int64((win * powers).sum(axis=1).min())
        assert got[i] == expected, f"doc {i}"


def py_winnow(text: str, k: int, g: int) -> set:
    """Reference winnowing: k-gram rolling hashes, min per g-window."""
    import numpy as np

    B = np.uint64(1099511628211)
    b = np.frombuffer((text or "").lower().encode(), dtype=np.uint8).astype(np.uint64)
    if len(b) == 0:
        return {0}
    if len(b) < k:
        h = np.uint64(0)
        for x in b:
            h = h * B + x
        return {int(np.int64(h))}
    powers = B ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    wh = np.lib.stride_tricks.sliding_window_view(b, k)
    wh = (wh * powers).sum(axis=1)
    if len(wh) < g:
        return {int(np.int64(wh.min()))}
    mins = np.lib.stride_tricks.sliding_window_view(wh, g).min(axis=1)
    return {int(x) for x in np.unique(mins).astype(np.int64)}


def test_winnowing_fingerprint_set_matches_reference(spark):
    import numpy as np
    import pandas as pd

    from accelerating_tc_spark.operators import text as T

    rng = np.random.default_rng(5)
    docs = [
        "".join(chr(int(c)) for c in rng.integers(97, 123, int(rng.integers(0, 200))))
        for _ in range(30)
    ] + ["", None, "tiny"]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(docs)), "text": docs}),
        schema="doc_id long, text string",
    )
    got: dict = {}
    for r in T.winnowing_fingerprint_set(df, k=16, guarantee=8).collect():
        got.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    for i, txt in enumerate(docs):
        assert got[i] == py_winnow(txt or "", 16, 8), f"doc {i}"


def test_containment_candidates_finds_quote(spark):
    """A long quote embedded in an otherwise unrelated document must share
    winnowed fingerprints (containment), while whole-doc Jaccard stays
    tiny — the case MinHash-style near-dup detection misses by design."""
    import numpy as np
    import pandas as pd

    from accelerating_tc_spark.operators import dedup, text as T

    rng = np.random.default_rng(9)

    def words(n, seed_off):
        r = np.random.default_rng(seed_off)
        return " ".join(
            "".join(chr(int(c)) for c in r.integers(97, 123, 5)) for _ in range(n)
        )

    quote = words(30, 1)
    doc_a = words(200, 2) + " " + quote  # source
    doc_b = words(250, 3) + " " + quote + " " + words(50, 4)  # quoting doc
    doc_c = words(220, 5)  # unrelated
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2], "text": [doc_a, doc_b, doc_c]}),
        schema="doc_id long, text string",
    )
    cands = {
        (r["doc_a"], r["doc_b"]): r["shared_fps"]
        for r in T.containment_candidates(df, k=16, guarantee=8, min_shared=2).collect()
    }
    assert (0, 1) in cands and cands[(0, 1)] >= 2
    assert (0, 2) not in cands and (1, 2) not in cands
    # the same pair is invisible to whole-document near-dup similarity
    jac = dedup.ngram_jaccard_pairs(df, n=3, threshold=0.5).collect()
    assert jac == []
