"""Edge extraction from Common-Crawl-style web pages (input_hint front end).

Input: table (url: string, warc_ts: timestamp, html: binary, text: string,
lang: string). Output: a dense-ID edge table (the reference's universal
input) plus the url <-> id mapping — the Spark analog of the reference's
text-edge-list ingestion + ID compaction tools (tools/adjust2tc.cpp:14-36,
tools/list2bin.cpp:8-24).

All parsing is vectorized: link extraction runs pandas `.str` /
`re`-on-Series operations inside `mapInPandas` (Arrow batches, no per-row
Python UDF), URL normalization is a pure Spark column expression so
Catalyst keeps it JVM-side where possible.

Text extraction is deterministic (tag strip + whitespace collapse) so the
per-row invariant holds: the same url always yields byte-identical text
(golden sha256 values pinned in tests/test_pages.py).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.ranking import dense_rank_ids

# ---------------------------------------------------------------- URLs

def normalize_url(col: Column | str) -> Column:
    """Canonical URL form, as a JVM-side column expression:
    lowercase scheme+host, strip fragment, drop default ports, drop
    trailing slash on non-root paths, default missing path to '/'."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"#.*$", "")  # fragment
    # lowercase scheme://host (group 1), keep the rest as-is
    c = F.concat(
        F.lower(F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)),
        F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$", 1),
    )
    # default ports are scheme-specific: :80 is only default for http,
    # :443 only for https (http://h:443 is a DISTINCT origin from http://h)
    c = F.regexp_replace(c, r"^(http://[^/:]*):80(/|$)", r"$1$2")
    c = F.regexp_replace(c, r"^(https://[^/:]*):443(/|$)", r"$1$2")
    c = F.regexp_replace(c, r"^(https?://[^/]+)$", r"$1/")  # ensure path
    c = F.regexp_replace(c, r"(.)/$", r"$1")  # strip trailing slash (non-root)
    c = F.regexp_replace(c, r"^(https?://[^/]+)$", r"$1/")  # re-add root slash
    return c


# href values: quoted (group 1) OR the HTML5 unquoted-attribute form
# (group 2: no whitespace/quotes/angle-brackets/backtick) — real crawls
# carry both. findall therefore yields (quoted, unquoted) tuples; the
# scanner coalesces.
_HREF_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*(?:["']([^"'<>]+)["']|([^\s"'<>`]+))""",
    re.IGNORECASE,
)
# first <base href> wins (HTML spec: only the first base element counts)
_BASE_RE = re.compile(
    r"""<base\s[^>]*?href\s*=\s*(?:["']([^"'<>]+)["']|([^\s"'<>`]+))""",
    re.IGNORECASE,
)


def _resolve(base: str, href: str) -> str | None:
    """Minimal deterministic relative-URL resolution (no external libs)."""
    href = href.strip()
    if not href or href.startswith(("#", "javascript:", "mailto:", "data:")):
        return None
    if "://" in href[:10]:
        return href
    m = re.match(r"^([a-z][a-z0-9+.-]*://[^/?#]*)([^?#]*)", base, re.IGNORECASE)
    if not m:
        return None
    origin, path = m.group(1), m.group(2) or "/"
    if href.startswith("//"):
        scheme = base.split(":", 1)[0]
        return f"{scheme}:{href}"
    if href.startswith("/"):
        return origin + href
    # relative path: resolve against the base directory, squash ./ and ../
    base_dir = path.rsplit("/", 1)[0] if "/" in path else ""
    segments: list[str] = []
    for seg in (base_dir + "/" + href).split("/"):
        if seg in ("", "."):
            continue
        if seg == "..":
            if segments:
                segments.pop()
            continue
        segments.append(seg)
    # a directory-form href ("x/", "x/.", "x/..", ".", "..") must KEEP its
    # trailing slash: the result may serve as a <base> and the slash is
    # what makes its last segment a directory, not a file
    trailing = href.endswith(("/", "/.", "/..")) or href in (".", "..")
    tail = "/" if trailing and segments else ""
    return origin + "/" + "/".join(segments) + tail


_LINKS_SCHEMA = "src_url string, dst_url string"
_ANCHOR_SCHEMA = "src_url string, dst_url string, anchor string"
# href + the anchor's inner text up to the closing tag (nested markup
# inside <a> is stripped afterwards; unclosed anchors yield no row)
_ANCHOR_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*(?:["']([^"'<>]+)["']|([^\s"'<>`]+))[^>]*>(.*?)</a\s*>""",
    re.IGNORECASE | re.DOTALL,
)


def _resolve_series(src: pd.Series, href: pd.Series) -> pd.Series:
    """Vectorized equivalent of per-row _resolve over aligned Series.

    The cases that dominate real crawls — absolute, protocol-relative, and
    root-relative hrefs — are resolved with pyarrow.compute string kernels
    (C++ batch ops; pandas .str would still loop per element in Python);
    only the bare-relative tail (./ ../ and sibling paths) falls back to
    per-row _resolve. Semantics are pinned byte-identical to _resolve by
    tests/test_pages.py (golden hashes + a differential sweep)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    src_a = pa.array(src, type=pa.string())
    h = pc.utf8_trim_whitespace(pa.array(href, type=pa.string()))
    skip = pc.equal(h, "")
    for pref in ("#", "javascript:", "mailto:", "data:"):
        skip = pc.or_(skip, pc.starts_with(h, pref))
    absolute = pc.and_(
        pc.match_substring(pc.utf8_slice_codeunits(h, 0, 10), "://"), pc.invert(skip)
    )
    not_abs = pc.and_(pc.invert(absolute), pc.invert(skip))
    proto_rel = pc.and_(pc.starts_with(h, "//"), not_abs)
    root_rel = pc.and_(pc.and_(pc.starts_with(h, "/"), pc.invert(proto_rel)), not_abs)
    # _resolve returns None when the base URL has no scheme://host origin
    origin = pc.struct_field(
        pc.extract_regex(src_a, r"(?i)^(?P<o>[a-z][a-z0-9+.-]*://[^/?#]*)"), "o"
    )
    ok = pc.is_valid(origin)
    scheme = pc.struct_field(
        pc.extract_regex(src_a, r"^(?P<s>[a-zA-Z][a-zA-Z0-9+.-]*)://"), "s"
    )

    dst = pc.if_else(absolute, h, pa.nulls(len(h), pa.string()))
    dst = pc.if_else(
        pc.and_(proto_rel, ok), pc.binary_join_element_wise(scheme, ":", h, ""), dst
    )
    dst = pc.if_else(
        pc.and_(root_rel, ok), pc.binary_join_element_wise(origin, h, ""), dst
    )
    out = dst.to_pandas().astype(object).where(dst.to_pandas().notna(), None)

    rest = pc.invert(pc.or_(pc.or_(skip, absolute), pc.or_(proto_rel, root_rel)))
    rest_np = rest.to_numpy(zero_copy_only=False)
    if rest_np.any():
        idx = np.nonzero(rest_np)[0]
        sv, hv = src.to_numpy(), href.to_numpy()
        out.iloc[idx] = [_resolve(sv[i], hv[i]) for i in idx]
    out.index = href.index
    return out


def _effective_bases(urls: pd.Series, html: pd.Series) -> pd.Series:
    """Per-page resolution base: first <base href> (itself resolved against
    the page URL when relative), else the page URL."""
    bx = html.str.extract(_BASE_RE)
    base_href = bx[0].where(bx[0].notna(), bx[1])
    base_href = base_href.where(base_href.notna() & (base_href != ""), None)
    eff_base = urls.copy()
    has_base = base_href.notna()
    if has_base.any():
        rb = _resolve_series(urls[has_base], base_href[has_base].astype(object))
        eff_base.loc[has_base] = rb.where(rb.notna(), urls[has_base])
    return eff_base


def extract_links(pages: DataFrame) -> DataFrame:
    """(src_url, dst_url) per hyperlink — vectorized href scan (quoted AND
    unquoted attribute forms) + vectorized URL resolution over Arrow
    batches. A page's first `<base href>` overrides the resolution base
    for every relative link on that page (the base itself resolving
    against the page URL when relative); the edge SOURCE stays the page
    URL. Self-links dropped after normalization; duplicates kept (the
    edge builder dedups, mirroring the reference's cleaning stages)."""

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.reset_index(drop=True)
            html = pdf["html"].apply(
                lambda b: b.decode("utf-8", "replace") if b is not None else ""
            )
            urls = pdf["url"].astype(object)
            eff_base = _effective_bases(urls, html)
            ex = pd.DataFrame(
                {
                    "src_url": urls.to_numpy(),
                    "base_url": eff_base.to_numpy(),
                    "href": html.str.findall(_HREF_RE),
                }
            ).explode("href")
            ex = ex[ex["href"].notna()]
            if len(ex):
                ex = ex.reset_index(drop=True)
                # findall yields (quoted, unquoted) tuples: coalesce
                ex["href"] = ex["href"].map(lambda t: t[0] if t[0] else t[1])
                ex["dst_url"] = _resolve_series(ex["base_url"], ex["href"])
            else:
                ex["dst_url"] = pd.Series([], dtype=object)
            yield ex[ex["dst_url"].notna()][["src_url", "dst_url"]]

    links = pages.select("url", "html").mapInPandas(scan, schema=_LINKS_SCHEMA)
    return links.select(
        normalize_url("src_url").alias("src_url"), normalize_url("dst_url").alias("dst_url")
    ).where(F.col("src_url") != F.col("dst_url"))


def extract_anchors(pages: DataFrame) -> DataFrame:
    """(src_url, dst_url, anchor) per CLOSED hyperlink — the anchor text is
    the tag's inner markup with nested tags stripped and whitespace
    collapsed. Anchor text is the classic link-graph relevance signal for
    training-data pipelines: what OTHER pages call a document. Same
    vectorized Arrow-batch shape and <base href> semantics as
    `extract_links`; self-links drop after normalization, empty anchors
    become ''.

    NOT lossless vs `extract_links`: an <a> nested inside another <a>
    (invalid but common HTML) is swallowed into the OUTER anchor's inner
    text by the non-greedy body match, so the inner link yields no row
    here while extract_links' raw href scan still finds it. Downstream
    joins between the two extractors must treat this table as a subset of
    the link set, not an annotated equal."""

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.reset_index(drop=True)
            html = pdf["html"].apply(
                lambda b: b.decode("utf-8", "replace") if b is not None else ""
            )
            urls = pdf["url"].astype(object)
            eff_base = _effective_bases(urls, html)
            ex = pd.DataFrame(
                {
                    "src_url": urls.to_numpy(),
                    "base_url": eff_base.to_numpy(),
                    "hit": html.str.findall(_ANCHOR_RE),
                }
            ).explode("hit")
            ex = ex[ex["hit"].notna()]
            if len(ex):
                ex = ex.reset_index(drop=True)
                ex["href"] = ex["hit"].map(lambda t: t[0] if t[0] else t[1])
                anchor = ex["hit"].map(lambda t: t[2]).astype(str)
                anchor = anchor.str.replace(_TAG_RE, " ", regex=True)
                anchor = anchor.str.replace(_WS_RE, " ", regex=True).str.strip()
                ex["anchor"] = anchor
                ex["dst_url"] = _resolve_series(ex["base_url"], ex["href"])
            else:
                ex["dst_url"] = pd.Series([], dtype=object)
                ex["anchor"] = pd.Series([], dtype=object)
            yield ex[ex["dst_url"].notna()][["src_url", "dst_url", "anchor"]]

    anchors = pages.select("url", "html").mapInPandas(scan, schema=_ANCHOR_SCHEMA)
    return anchors.select(
        normalize_url("src_url").alias("src_url"),
        normalize_url("dst_url").alias("dst_url"),
        "anchor",
    ).where(F.col("src_url") != F.col("dst_url"))


def anchor_texts(anchors: DataFrame) -> DataFrame:
    """Aggregate anchors per TARGET page: (dst_url, anchor, n_refs,
    n_src_pages) — how often each distinct anchor string points at the
    page and from how many distinct source pages. One groupBy shuffle with
    map-side partial aggregation; distinct-source counting rides the same
    shuffle via count_distinct. At corpus scale this is the standard
    anchor-text table joined onto documents as a quality/relevance
    feature."""
    return anchors.groupBy("dst_url", "anchor").agg(
        F.count(F.lit(1)).alias("n_refs"),
        F.count_distinct("src_url").alias("n_src_pages"),
    )


# ---------------------------------------------------------------- text

_TEXT_SCHEMA = "url string, text string"
_SCRIPT_RE = re.compile(r"<(script|style)\b.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text_series(html: pd.Series) -> pd.Series:
    """Deterministic text extraction: drop script/style, strip tags, unescape
    the five XML entities, collapse whitespace. Pure function of the bytes —
    the byte-identical-per-url invariant (input_hint)."""
    s = html.apply(lambda b: b.decode("utf-8", "replace") if b is not None else "")
    s = s.str.replace(_SCRIPT_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")):
        s = s.str.replace(ent, ch, regex=False)
    return s.str.replace(_WS_RE, " ", regex=True).str.strip()


def extract_text(pages: DataFrame) -> DataFrame:
    """(url, text) — the extraction the `text` column must equal."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({"url": pdf["url"], "text": extract_text_series(pdf["html"])})

    return pages.select("url", "html").mapInPandas(run, schema=_TEXT_SCHEMA)


# ---------------------------------------------------------------- edges

def url_id_mapping(links: DataFrame) -> DataFrame:
    """Dense ids for every url seen on either side (gap-squeezing compaction,
    tools/serialize.cpp analog): (url, vertex_id) ordered by url. ID
    assignment is fully distributed (functions/ranking.py) — every URL of the
    crawl does NOT funnel through one task."""
    urls = links.select(F.col("src_url").alias("url")).union(
        links.select(F.col("dst_url").alias("url"))
    ).distinct()
    return dense_rank_ids(urls, ["url"], id_col="vertex_id")


def pages_to_edges(pages: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Full front end: pages -> (canonical dense-ID edge table, url mapping).

    The extracted links are materialized once (localCheckpoint): the ID
    mapping scans them twice and the final join once more — without the
    pin, every scan would re-parse all the HTML (4x the extraction cost)."""
    links = extract_links(pages).localCheckpoint(eager=True)
    mapping = url_id_mapping(links)
    src_map = mapping.withColumnRenamed("url", "src_url").withColumnRenamed("vertex_id", "src")
    dst_map = mapping.withColumnRenamed("url", "dst_url").withColumnRenamed("vertex_id", "dst")
    edges = (
        links.join(src_map, "src_url")
        .join(dst_map, "dst_url")
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return edges, mapping


def host_of(col: Column | str) -> Column:
    """Host part of a normalized URL, as a JVM expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1)


def host_graph(links: DataFrame) -> DataFrame:
    """Host-level link graph: (src_host, dst_host, n_links) where n_links
    counts DISTINCT page-level directed links between the two hosts
    (intra-host rows included — a downstream site-graph consumer filters
    them if it wants the cross-host view).

    Scale shape: one shuffle for the page-pair distinct (unavoidable —
    dedup is the semantics), then the host groupBy collapses ~pages² keys
    to ~hosts² with map-side partial aggregation. No driver funnels."""
    pairs = (
        links.select("src_url", "dst_url")
        .where(F.col("src_url") != F.col("dst_url"))
        .distinct()
    )
    return pairs.select(
        host_of("src_url").alias("src_host"),
        host_of("dst_url").alias("dst_host"),
    ).groupBy("src_host", "dst_host").agg(F.count(F.lit(1)).alias("n_links"))


# ------------------------------------------------- synthetic corpus

def generate_pages(spark, n_sites: int = 10, pages_per_site: int = 10, seed: int = 42) -> DataFrame:
    """Deterministic tiny web corpus (FIXTURES.md §5): every page links to
    the next page on its site (a ring), to its site root, to page 0 of the
    next site, and repeats one link; roots carry a self link, a fragment
    link, and a relative '../' link. Known structure, fixed seed."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    for s in range(n_sites):
        for p in range(pages_per_site):
            url = f"http://site{s}.example/p{p}"
            nxt = f"/p{(p + 1) % pages_per_site}"
            cross = f"http://site{(s + 1) % n_sites}.example/p0"
            links = [
                f'<a href="{nxt}">next</a>',
                f'<a href="{nxt}">next again</a>',  # duplicate on purpose
                '<a href="/p0">root</a>',
                f'<a href="{cross}">cross</a>',
                f'<a href="#frag">frag</a>',  # dropped
                f'<a href="p{p}">self</a>',  # self link, dropped
            ]
            if rng.random() < 0.3:
                links.append(f'<a href="../p{int(rng.integers(0, pages_per_site))}">rand</a>')
            body = (
                f"<html><head><title>Site {s} page {p}</title>"
                f"<script>var x = {p};</script></head>"
                f"<body><h1>Page {p} of site {s}</h1>{''.join(links)}"
                f"<p>Lorem ipsum &amp; dolor {s}-{p}.</p></body></html>"
            )
            rows.append(
                {
                    "url": url,
                    "warc_ts": pd.Timestamp("2026-01-01") + pd.Timedelta(hours=s * 100 + p),
                    "html": body.encode(),
                    "text": None,  # filled below so it matches the extractor
                    "lang": "en",
                }
            )
    pdf = pd.DataFrame(rows)
    pdf["text"] = extract_text_series(pdf["html"])
    return spark.createDataFrame(
        pdf, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    )


def generate_pages_distributed(
    spark, n_sites: int, pages_per_site: int = 10
) -> DataFrame:
    """Web-scale variant of generate_pages: the corpus is built INSIDE Spark
    (spark.range + JVM string expressions), so a 100k+-page bench corpus
    never funnels through the driver. Same link structure as generate_pages
    (ring next-link ×2, site root, cross-site, fragment, bare-relative self,
    and a deterministic '../' link on ~30% of pages — randomness replaced by
    a mod-10 rule so the corpus is seed-free deterministic). `text` is NULL:
    this corpus feeds link-extraction benchmarks, not the text invariant."""
    total = n_sites * pages_per_site
    s = (F.col("id") / pages_per_site).cast("long")
    p = F.pmod(F.col("id"), F.lit(pages_per_site))
    nxt = F.pmod(p + 1, F.lit(pages_per_site))
    cross_site = F.pmod(s + 1, F.lit(n_sites))
    rel_target = F.pmod(s * 7 + p * 3, F.lit(pages_per_site))
    has_rel = F.pmod(s * 31 + p, F.lit(10)) < 3
    html = F.concat(
        F.format_string("<html><head><title>Site %d page %d</title>", s, p),
        F.format_string("<script>var x = %d;</script></head><body>", p),
        F.format_string("<h1>Page %d of site %d</h1>", p, s),
        F.format_string('<a href="/p%d">next</a>', nxt),
        F.format_string('<a href="/p%d">next again</a>', nxt),
        F.lit('<a href="/p0">root</a>'),
        F.format_string('<a href="http://site%d.example/p0">cross</a>', cross_site),
        F.lit('<a href="#frag">frag</a>'),
        F.format_string('<a href="p%d">self</a>', p),
        F.when(
            has_rel, F.format_string('<a href="../p%d">rand</a>', rel_target)
        ).otherwise(F.lit("")),
        F.format_string("<p>Lorem ipsum &amp; dolor %d-%d.</p></body></html>", s, p),
    )
    return spark.range(0, total).select(
        F.format_string("http://site%d.example/p%d", s, p).alias("url"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp")).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit("en").alias("lang"),
    )
