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


_HREF_RE = re.compile(r"""<a\s[^>]*?href\s*=\s*["']([^"'<>]+)["']""", re.IGNORECASE)


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
    return origin + "/" + "/".join(segments)


_LINKS_SCHEMA = "src_url string, dst_url string"


def extract_links(pages: DataFrame) -> DataFrame:
    """(src_url, dst_url) per hyperlink — vectorized href scan over Arrow
    batches; self-links dropped after normalization; duplicates kept (the
    edge builder dedups, mirroring the reference's cleaning stages)."""

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            html = pdf["html"].apply(
                lambda b: b.decode("utf-8", "replace") if b is not None else ""
            )
            hrefs = html.str.findall(_HREF_RE)
            n_links = hrefs.str.len().to_numpy()
            srcs = pdf["url"].to_numpy().repeat(n_links)
            flat = [(s, h) for s, hs in zip(pdf["url"], hrefs) for h in hs]
            resolved = [(_resolve(s, h)) for s, h in flat]
            out = pd.DataFrame({"src_url": srcs, "dst_url": resolved})
            yield out[out["dst_url"].notna()]

    links = pages.select("url", "html").mapInPandas(scan, schema=_LINKS_SCHEMA)
    return links.select(
        normalize_url("src_url").alias("src_url"), normalize_url("dst_url").alias("dst_url")
    ).where(F.col("src_url") != F.col("dst_url"))


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
    """Full front end: pages -> (canonical dense-ID edge table, url mapping)."""
    links = extract_links(pages)
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
