"""Edge-extraction front end: URL normalization, link extraction,
byte-identical text invariant, dense-ID edge table (input_hint)."""

from __future__ import annotations

import hashlib

import pandas as pd

from accelerating_tc_spark.sources import pages as P


def test_normalize_url(spark):
    cases = {
        "HTTP://Example.COM/Path#frag": "http://example.com/Path",
        "https://example.com:443/a/": "https://example.com/a",
        "http://example.com:80": "http://example.com/",
        "http://example.com": "http://example.com/",
        "http://example.com/a/b/": "http://example.com/a/b",
    }
    df = spark.createDataFrame([(k,) for k in cases], "u string")
    got = {r["u"]: r["n"] for r in df.select("u", P.normalize_url("u").alias("n")).collect()}
    for raw, want in cases.items():
        assert got[raw] == want, (raw, got[raw], want)


def test_resolve_relative():
    base = "http://site0.example/a/b"
    assert P._resolve(base, "/p0") == "http://site0.example/p0"
    assert P._resolve(base, "c") == "http://site0.example/a/c"
    assert P._resolve(base, "../x") == "http://site0.example/x"
    assert P._resolve(base, "//other.example/y") == "http://other.example/y"
    assert P._resolve(base, "#frag") is None
    assert P._resolve(base, "mailto:a@b") is None
    assert P._resolve(base, "https://abs.example/z") == "https://abs.example/z"


def test_extract_text_golden():
    html = pd.Series(
        [
            b"<html><head><script>var x=1;</script></head>"
            b"<body><h1>Hi</h1><p>A &amp; B</p></body></html>",
            b"<p>  spaced   out  </p>",
            None,
        ]
    )
    got = P.extract_text_series(html).tolist()
    assert got == ["Hi A & B", "spaced out", ""]
    # byte-identical invariant: pin the sha256 of the first extraction
    assert hashlib.sha256(got[0].encode()).hexdigest() == (
        "21317be1e72a03f56de43aca29ea5e29916a1373319a8091456efb5a6c951798"
    )


def test_corpus_text_matches_extractor(spark):
    pages = P.generate_pages(spark, n_sites=3, pages_per_site=3)
    ext = P.extract_text(pages).withColumnRenamed("text", "text2")
    joined = pages.select("url", "text").join(ext, "url")
    mismatches = joined.where(joined["text"] != joined["text2"]).count()
    assert mismatches == 0


def test_known_link_structure(spark):
    pages = P.generate_pages(spark, n_sites=2, pages_per_site=2, seed=1)
    links = P.extract_links(pages)
    got = {(r["src_url"], r["dst_url"]) for r in links.collect()}
    # p0 -> p1 (next), p1 -> p0 (next wraps + root), cross-site p0 links
    assert ("http://site0.example/p0", "http://site0.example/p1") in got
    assert ("http://site0.example/p1", "http://site0.example/p0") in got
    assert ("http://site0.example/p0", "http://site1.example/p0") in got
    assert ("http://site1.example/p0", "http://site0.example/p0") in got
    # no self links, no fragment links
    assert all(s != d for s, d in got)


def test_pages_to_edges_dense_ids(spark):
    pages = P.generate_pages(spark, n_sites=3, pages_per_site=4, seed=2)
    edges, mapping = P.pages_to_edges(pages)
    n_urls = mapping.count()
    ids = sorted(r["vertex_id"] for r in mapping.collect())
    assert ids == list(range(n_urls))
    rows = edges.collect()
    assert all(r["src"] < r["dst"] for r in rows)
    assert len(rows) == len({(r["src"], r["dst"]) for r in rows})
    # the extracted graph feeds the engine end-to-end
    from accelerating_tc_spark.operators import triangles

    tri = triangles.count_triangles(edges, strategy="kernel").collect()[0]["triangles"]
    assert tri >= 0


def test_resolve_series_differential():
    """The vectorized resolver must agree byte-for-byte with per-row
    _resolve over every case class (absolute, protocol-relative,
    root-relative, bare-relative, ../ squashing, skips, broken bases)."""
    import pandas as pd

    bases = [
        "http://a.example/x/y/page.html",
        "https://b.example:8443/deep/dir/",
        "HTTP://Mixed.Case/path",
        "ftp://files.example/pub/idx",
        "not-a-url",
        "http://c.example",
    ]
    hrefs = [
        "http://abs.example/z", "HTTPS://ABS2/q?a=1", "//cdn.example/lib.js",
        "/rooted/path", "/", "sibling.html", "./same/dir", "../up/one",
        "../../up/two", "..", ".", "", "  spaced  ", "#frag",
        "javascript:void(0)", "mailto:x@y", "data:text/plain,hi",
        "a/b/../c", "//x", "?query-only",
    ]
    pairs = [(b, h) for b in bases for h in hrefs]
    src = pd.Series([b for b, _ in pairs], dtype=object)
    href = pd.Series([h for _, h in pairs], dtype=object)
    got = P._resolve_series(src, href)
    for i, (b, h) in enumerate(pairs):
        expected = P._resolve(b, h)
        g = got.iloc[i]
        g = None if pd.isna(g) else g
        assert g == expected, f"base={b!r} href={h!r}: {g!r} != {expected!r}"


def test_generate_pages_distributed_matches_driver_side(spark):
    """The distributed corpus must yield the same structural links as the
    driver-side generator on the deterministic (non-random) link classes."""
    dist = P.generate_pages_distributed(spark, n_sites=2, pages_per_site=2)
    links = {
        (r["src_url"], r["dst_url"]) for r in P.extract_links(dist).collect()
    }
    assert ("http://site0.example/p0", "http://site0.example/p1") in links
    assert ("http://site0.example/p0", "http://site1.example/p0") in links
    assert all(s != d for s, d in links)


def test_unquoted_hrefs_and_base_override(spark):
    """Real-crawl HTML forms: unquoted attribute values and <base href>
    overrides (first base wins; relative base resolves against the page
    URL; the edge SOURCE stays the page URL; absolute links unaffected)."""
    rows = [
        # unquoted hrefs, no base
        ("http://u.example/p", b'<html><a href=/rooted>r</a><a href=sib.html>s</a>'
                              b'<a href=http://abs.example/z>a</a></html>'),
        # absolute base: root-relative, bare-relative, ../ all re-rooted
        ("http://b.example/x/page", b'<html><head><base href="http://cdn.example/dir/sub/"></head>'
                                    b'<a href="/top">t</a><a href="leaf.html">l</a>'
                                    b'<a href="../up.html">u</a>'
                                    b'<a href="http://abs.example/z">a</a></html>'),
        # relative base: resolves against the page URL first
        ("http://r.example/a/b/page", b'<html><base href="../other/"><a href="leaf">l</a></html>'),
        # two base tags: only the FIRST counts
        ("http://f.example/p", b'<html><base href="http://one.example/d/">'
                               b'<base href="http://two.example/"><a href="x">x</a></html>'),
        # unquoted base href
        ("http://q.example/p", b'<html><base href=http://unq.example/d/><a href="y">y</a></html>'),
    ]
    pdf = pd.DataFrame(
        {
            "url": [r[0] for r in rows],
            "warc_ts": pd.Timestamp("2026-01-01"),
            "html": [r[1] for r in rows],
            "text": "",
            "lang": "en",
        }
    )
    pages = spark.createDataFrame(
        pdf, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    )
    got = {(r["src_url"], r["dst_url"]) for r in P.extract_links(pages).collect()}
    expected = {
        ("http://u.example/p", "http://u.example/rooted"),
        ("http://u.example/p", "http://u.example/sib.html"),
        ("http://u.example/p", "http://abs.example/z"),
        ("http://b.example/x/page", "http://cdn.example/top"),
        ("http://b.example/x/page", "http://cdn.example/dir/sub/leaf.html"),
        ("http://b.example/x/page", "http://cdn.example/dir/up.html"),
        ("http://b.example/x/page", "http://abs.example/z"),
        ("http://r.example/a/b/page", "http://r.example/a/other/leaf"),
        ("http://f.example/p", "http://one.example/d/x"),
        ("http://q.example/p", "http://unq.example/d/y"),
    }
    assert got == expected


def test_extract_anchors_inner_text_and_host_rollup(spark):
    """Anchor text extraction: nested markup stripped, whitespace
    collapsed, empty anchors kept as '', unclosed anchors skipped,
    self-links dropped; anchor_texts aggregates refs + distinct sources."""
    rows = [
        ("http://a.example/p1",
         b'<html><a href="/p2">  go <b>HERE</b>\n now </a>'
         b'<a href="/p2"></a>'
         b'<a href="/p1">self</a>'
         b'<a href="/p3">unclosed</html>'),
        ("http://a.example/p2", b'<html><a href="/p2#x">frag-self</a>'
                                b'<a href="http://b.example/q">cross site</a></html>'),
        ("http://a.example/p3", b'<html><a href=/p2>go here now</a></html>'),
    ]
    pdf = pd.DataFrame(
        {
            "url": [r[0] for r in rows],
            "warc_ts": pd.Timestamp("2026-01-01"),
            "html": [r[1] for r in rows],
            "text": "",
            "lang": "en",
        }
    )
    pages = spark.createDataFrame(
        pdf, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    )
    anchors = P.extract_anchors(pages)
    got = {(r["src_url"], r["dst_url"], r["anchor"]) for r in anchors.collect()}
    assert got == {
        ("http://a.example/p1", "http://a.example/p2", "go HERE now"),
        ("http://a.example/p1", "http://a.example/p2", ""),
        ("http://a.example/p2", "http://b.example/q", "cross site"),
        ("http://a.example/p3", "http://a.example/p2", "go here now"),
    }
    agg = {
        (r["dst_url"], r["anchor"]): (r["n_refs"], r["n_src_pages"])
        for r in P.anchor_texts(anchors).collect()
    }
    assert agg[("http://a.example/p2", "")] == (1, 1)
    assert agg[("http://a.example/p2", "go HERE now")] == (1, 1)
    assert agg[("http://a.example/p2", "go here now")] == (1, 1)
    assert agg[("http://b.example/q", "cross site")] == (1, 1)
