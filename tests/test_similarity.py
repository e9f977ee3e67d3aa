"""ANN / similarity search vs numpy brute-force oracle."""

from __future__ import annotations

import numpy as np
import pytest

from accelerating_tc_spark.operators import multimodal, similarity

DIM = 16
N = 120


def make_embeddings(spark, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((10, DIM))
    rows = []
    for i in range(N):
        v = base[i % 10] + 0.15 * rng.standard_normal(DIM)
        rows.append((i, [float(x) for x in v], i % 10))
    # a pair of exact near-dups
    rows.append((N, rows[0][1], 0))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def numpy_topk(vecs: dict[int, np.ndarray], query_ids, k):
    ids = sorted(vecs)
    mat = np.stack([vecs[i] / np.linalg.norm(vecs[i]) for i in ids])
    out = {}
    for q in query_ids:
        sims = mat @ (vecs[q] / np.linalg.norm(vecs[q]))
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != q),
            key=lambda i: (-round(sims[i], 6), ids[i]),
        )
        out[q] = [(ids[i], round(float(sims[i]), 6)) for i in order[:k]]
    return out


def test_bruteforce_topk_matches_numpy(spark):
    emb = make_embeddings(spark)
    # float32 storage: oracle must read the same float32 values back
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    queries = emb.where("vec_id < 5")
    got_rows = similarity.cosine_topk_bruteforce(emb, queries, k=5).collect()
    got = {}
    for r in got_rows:
        got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["cos_sim"]))
    expected = numpy_topk(vecs, range(5), 5)
    for q in range(5):
        ours = [(n, s) for _, n, s in sorted(got[q])]
        for (n1, s1), (n2, s2) in zip(ours, expected[q]):
            assert abs(s1 - s2) < 2e-6
            # ids may differ only on float ties
            if abs(s1 - s2) < 1e-9 and n1 != n2:
                continue


def test_lsh_ann_recall(spark):
    emb = make_embeddings(spark)
    queries = emb.where("vec_id < 10")
    exact = similarity.cosine_topk_bruteforce(emb, queries, k=5).collect()
    approx = similarity.ann_topk_lsh(emb, queries, dim=DIM, k=5, n_planes=8).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q]) for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.6  # multi-probe LSH recall floor


def test_embedding_near_dups_finds_clone(spark):
    emb = make_embeddings(spark)
    pairs = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in similarity.embedding_near_dup_pairs(emb, dim=DIM, threshold=0.999).collect()
    }
    assert (0, N) in pairs
    assert pairs[(0, N)] >= 0.999999 - 1e-6


def test_multimodal_plumbing(spark):
    media = multimodal.generate_media(spark, n_rows=30)
    feats = multimodal.extract_image_features(media.where("kind = 'image'")).collect()
    assert len(feats) == 10
    assert all(len(r["feature"]) == multimodal.FEATURE_DIM for r in feats)
    # deterministic across runs
    feats2 = multimodal.extract_image_features(media.where("kind = 'image'")).collect()
    assert {r["media_id"]: list(r["feature"]) for r in feats} == {
        r["media_id"]: list(r["feature"]) for r in feats2
    }
    frames = multimodal.frame_sample(media.where("kind = 'video'"), every_ms=1000).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    durations = {r["media_id"]: r["duration_ms"] for r in media.where("kind='video'").collect()}
    for mid, idxs in by_media.items():
        assert sorted(idxs) == list(range(durations[mid] // 1000))


def test_decode_stub_raises():
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        multimodal.decode_image(b"abc", fake=False)


def test_ivf_ann_recall_and_determinism(spark):
    """IVF path: k-means training is deterministic (seed-free init from
    smallest ids), inverted-list probing with exact rerank must clear a
    recall floor vs brute force on the same fixture LSH is tested on."""
    emb = make_embeddings(spark)
    queries = emb.where("vec_id < 10")
    c1 = similarity.ivf_train_centroids(emb, dim=DIM, n_centroids=8, n_iters=3)
    c2 = similarity.ivf_train_centroids(emb, dim=DIM, n_centroids=8, n_iters=3)
    assert c1 == c2  # same data -> same centroids
    exact = similarity.cosine_topk_bruteforce(emb, queries, k=5).collect()
    approx = similarity.ann_topk_ivf(
        emb, queries, dim=DIM, k=5, n_probe=5, centroids=c1
    ).collect()
    exact_sets: dict = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets: dict = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.8


def test_suggest_lsh_params_recall_math(spark):
    """The chosen (b, L) must satisfy the recall bound at the threshold,
    and higher thresholds (easier pairs) must allow more selective b."""
    import math

    for threshold in (0.45, 0.8, 0.95):
        b, L = similarity.suggest_lsh_params(threshold, target_recall=0.999)
        p = math.acos(threshold) / math.pi
        q = (1 - p) ** b + b * p * (1 - p) ** (b - 1)
        assert 1 - (1 - q) ** L >= 0.999, (threshold, b, L)
        assert 1 <= L <= 64 and 1 <= b <= 12
    b_hard, _ = similarity.suggest_lsh_params(0.45)
    b_easy, _ = similarity.suggest_lsh_params(0.95)
    assert b_easy >= b_hard
    # the params recover the contract's planted pairs end-to-end
    emb = make_embeddings(spark)
    b, L = similarity.suggest_lsh_params(0.999, target_recall=0.999)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_near_dup_pairs(
            emb, dim=DIM, threshold=0.999, n_planes=b, n_tables=L
        ).collect()
    }
    assert (0, N) in pairs


def test_ivf_small_corpus_clamps_centroids(spark):
    """Corpus smaller than n_centroids must clamp (not IndexError on the
    empty-cluster carry-over) and still answer queries; an empty corpus
    raises a clear error."""
    emb = make_embeddings(spark).limit(5)
    cents = similarity.ivf_train_centroids(emb, dim=DIM, n_centroids=16, n_iters=2)
    assert 0 < len(cents) <= 5
    out = similarity.ann_topk_ivf(
        emb, emb.limit(2), dim=DIM, k=3, centroids=cents, n_probe=8
    )
    assert out.count() > 0
    with pytest.raises(ValueError, match="empty corpus"):
        similarity.ivf_train_centroids(emb.limit(0), dim=DIM, n_centroids=4)


def test_ivf_recall_on_cluster_sorted_ids(spark):
    """Adversarial id layout for centroid seeding: vec_ids sorted BY
    CLUSTER (the common real-corpus case — crawl/shard order correlates
    with content). The old first-N-by-id init drew every seed from
    cluster 0 and k-means quality collapsed silently; the xxhash64-spread
    init must keep recall vs brute force at the floor the contract row
    enforces."""
    rng = np.random.default_rng(11)
    base = rng.standard_normal((8, DIM)) * 3.0
    rows = []
    vid = 0
    for c in range(8):  # ids 0..14 are ALL cluster 0, 15..29 cluster 1, ...
        for _ in range(15):
            v = base[c] + 0.1 * rng.standard_normal(DIM)
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    queries = emb.where("vec_id % 15 = 7")  # one query per cluster
    cents = similarity.ivf_train_centroids(emb, dim=DIM, n_centroids=8, n_iters=4)
    # hash-spread seeding must reach >1 content region even though the
    # first 8 ids all live in cluster 0
    import numpy as _np

    cmat = _np.asarray(cents)
    bnorm = base / _np.linalg.norm(base, axis=1, keepdims=True)
    nearest_cluster = {int(_np.argmax(bnorm @ c)) for c in cmat}
    assert len(nearest_cluster) >= 4, "seeds collapsed into few content regions"
    exact = similarity.cosine_topk_bruteforce(emb, queries, k=5).collect()
    approx = similarity.ann_topk_ivf(
        emb, queries, dim=DIM, k=5, n_probe=3, centroids=cents
    ).collect()
    exact_sets: dict = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets: dict = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.9


def test_ppm_decode_hand_built_and_roundtrip():
    # hand-built 2x2 P6 with a header comment: known pixel values
    raw = b"P6\n# test comment\n2 2\n255\n" + bytes(
        [255, 0, 0,  0, 255, 0,
         0, 0, 255,  10, 20, 30]
    )
    img = multimodal.decode_ppm(raw)
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[1, 1].tolist() == [10, 20, 30]
    # encoder/decoder inverse on an uneven-size image
    rng = np.random.default_rng(5)
    src = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    assert np.array_equal(multimodal.decode_ppm(multimodal.encode_ppm(src)), src)
    # magic-byte dispatch: decode_image real-decodes without fake=True
    assert np.array_equal(multimodal.decode_image(multimodal.encode_ppm(src)), src)


def test_bmp_decode_hand_built_and_roundtrip():
    # 3-wide rows need 1 padding byte (stride 12 -> 9+3); bottom-up BGR
    rng = np.random.default_rng(6)
    src = rng.integers(0, 256, size=(4, 3, 3), dtype=np.uint8)
    raw = multimodal.encode_bmp(src)
    assert raw[:2] == b"BM"
    assert int.from_bytes(raw[28:30], "little") == 24
    img = multimodal.decode_bmp(raw)
    assert np.array_equal(img, src)
    assert np.array_equal(multimodal.decode_image(raw), src)
    with pytest.raises(ValueError):
        multimodal.decode_bmp(b"BM" + b"\0" * 60)  # bpp 0: unsupported


def test_png_roundtrip_and_dispatch():
    rng = np.random.default_rng(8)
    src = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    raw = multimodal.encode_png(src)
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    assert np.array_equal(multimodal.decode_png(raw), src)
    # magic-byte dispatch: decode_image real-decodes without fake=True
    assert np.array_equal(multimodal.decode_image(raw), src)


def test_png_all_filter_types_match_reference():
    """Hand-filter scanlines with every PNG filter type (0,1,2,3,4) and
    assert decode_png reconstructs the original pixels — the scalar spec
    (RFC 2083 §6) is applied per byte here as the oracle."""
    import zlib

    rng = np.random.default_rng(9)
    w, h, ch = 5, 5, 3
    src = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    flat = src.reshape(h, w * ch).astype(np.int64)
    body = bytearray()
    for y, f in enumerate([0, 1, 2, 3, 4]):
        prev = flat[y - 1] if y else np.zeros(w * ch, dtype=np.int64)
        body.append(f)
        for x in range(w * ch):
            a = int(flat[y][x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            body.append((int(flat[y][x]) - pred) & 0xFF)

    def chunk(ctype, data):
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    raw = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(body)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(multimodal.decode_png(raw), src)


def test_png_rgba_drops_alpha_and_unsupported_raise():
    import zlib

    rng = np.random.default_rng(10)
    w, h = 4, 3
    rgba = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    body = bytearray()
    for y in range(h):
        body.append(0)
        body.extend(rgba[y].reshape(-1).tobytes())

    def chunk(ctype, data):
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 6, 0, 0, 0])
    raw = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(body)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(multimodal.decode_png(raw), rgba[:, :, :3])
    # 16-bit depth unsupported
    bad = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([16, 2, 0, 0, 0])
    ) + chunk(b"IDAT", zlib.compress(b"\0" * 10)) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="8-bit RGB"):
        multimodal.decode_png(bad)
    with pytest.raises(ValueError, match="PNG"):
        multimodal.decode_png(b"nope")


def test_real_decode_feature_extraction(spark):
    """End-to-end over the media table's REAL payloads (mixed PPM/BMP/PNG):
    features from the actual decoded pixels (fake=False), deterministic,
    correct dim."""
    media = multimodal.generate_media(spark, n_rows=12)
    imgs = media.where("kind = 'image'")
    feats = multimodal.extract_image_features(imgs, fake=False).collect()
    assert len(feats) == 4
    assert all(len(r["feature"]) == multimodal.FEATURE_DIM for r in feats)
    # channel stats agree with a local numpy recompute of the same payloads
    stats = {r["media_id"]: r for r in multimodal.media_channel_stats(imgs).collect()}
    import math

    def r4(x):  # half-away-from-zero, matching the operator and SQL ROUND
        return math.floor(x * 1e4 + 0.5) / 1e4

    for row in imgs.collect():
        img = multimodal.decode_image(bytes(row["payload"])).astype(np.float64)
        got = stats[row["media_id"]]
        assert got["n_pixels"] == img.shape[0] * img.shape[1]
        assert abs(got["mean_r"] - r4(float(img[:, :, 0].mean()))) < 1e-9
        assert abs(got["std_luma"] - r4(float(img.mean(axis=2).std()))) < 1e-9
