"""Structured web-page metadata extraction — JSON-LD, OpenGraph and
the link/anchor graph (r15 capability wave).

The reference pipeline's crawl plane (reference scripts/: fetch →
route → extract) stops at visible text; a training-data pipeline
additionally mines each page's STRUCTURED planes — schema.org
JSON-LD records (provenance/type/date for filtering and
attribution), OpenGraph properties (the de-facto social-card title/
description/image), and the out-link graph (anchor text is retrieval
training signal, the href set feeds the frontier and PageRank).

Everything here is WHOLE-STAGE CODEGEN: regexp extraction +
``get_json_object`` + array ``transform``/``zip`` — no Python in the
row path, so a 100 TB HTML scan keeps its one-pass shape (the same
posture as :mod:`.text`'s ``html_extract`` chain). Parsers are
extraction-grade, not conformance-grade: attribute order is
handled for both ``property=… content=…`` spellings, JSON-LD uses
Spark's JsonPath (a malformed block yields NULLs, never a stage
failure), and relative-URL resolution collapses a bounded number of
``../`` segments (documented below).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LD_RE = (
    r'(?is)<script[^>]*type=["\']application/ld\+json["\'][^>]*>'
    r"(.*?)</script>"
)
_A_RE = r"(?is)<a\s([^>]*)>(.*?)</a>"
_TAG_RE = r"(?s)<[^>]+>"


def _meta_content(html: Column, prop: str) -> Column:
    """content of ``<meta property="{prop}" content="...">`` in
    either attribute order; NULL when absent or empty."""
    a = F.regexp_extract(
        html,
        rf'(?is)<meta[^>]*property=["\']{prop}["\'][^>]*'
        rf'content=["\']([^"\']*)["\']',
        1,
    )
    b = F.regexp_extract(
        html,
        rf'(?is)<meta[^>]*content=["\']([^"\']*)["\'][^>]*'
        rf'property=["\']{prop}["\']',
        1,
    )
    return F.coalesce(F.nullif(a, F.lit("")), F.nullif(b, F.lit("")))


def opengraph_properties(
    html: Column,
    props: tuple[str, ...] = (
        "og:title", "og:description", "og:image", "og:type", "og:url",
    ),
) -> Column:
    """Struct of OpenGraph properties (field names strip the ``og:``
    prefix). One codegen expression per property over the raw HTML —
    no parse tree, the ``html_extract`` posture."""
    return F.struct(
        *[
            _meta_content(html, p).alias(p.split(":", 1)[1])
            for p in props
        ]
    )


def jsonld_records(
    df: DataFrame,
    html_col: str,
    id_col: str,
    fields: dict[str, str] | None = None,
) -> DataFrame:
    """Explode every ``application/ld+json`` block into one row:
    (id, ld_pos, ld_type, + one column per requested field).

    ``fields`` maps output column → JsonPath (default: the
    schema.org provenance set — name, headline, datePublished,
    author.name). Malformed JSON yields NULL fields for that block
    (``get_json_object`` is null-tolerant), and a page without
    JSON-LD emits no rows — filter-side semantics, callers LEFT
    JOIN if they need every page."""
    if fields is None:
        fields = {
            "name": "$.name",
            "headline": "$.headline",
            "date_published": "$.datePublished",
            "author_name": "$.author.name",
        }
    blocks = F.regexp_extract_all(F.col(html_col), F.lit(_LD_RE), 1)
    exploded = df.select(
        F.col(id_col),
        F.posexplode(blocks).alias("ld_pos", "__block"),
    )
    return exploded.select(
        id_col,
        "ld_pos",
        F.get_json_object(F.col("__block"), "$['@type']").alias(
            "ld_type"
        ),
        *[
            F.get_json_object(F.col("__block"), path).alias(name)
            for name, path in fields.items()
        ],
    )


def _strip_tags(col: Column) -> Column:
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(col, _TAG_RE, " "), r"\s+", " "
        )
    )


def resolve_url(base: Column, href: Column) -> Column:
    """RFC 3986-style reference resolution as ONE codegen CASE:
    absolute refs pass through, ``//host/...`` adopts the base
    scheme, ``/path`` adopts the base origin, anything else joins
    the base directory, then up to 4 ``../`` segments collapse (a
    fixed-point regexp chain — deeper towers are vanishingly rare in
    real anchors and resolve partially rather than wrongly: each
    pass removes one ``seg/../``). Fragments are dropped; query
    strings survive (canonicalize_url owns tracking-param policy)."""
    scheme = F.regexp_extract(base, r"^([a-z][a-z0-9+.-]*):", 1)
    origin = F.regexp_extract(base, r"^([a-z][a-z0-9+.-]*://[^/?#]+)", 1)
    base_dir = F.regexp_extract(base, r"^(.*/)[^/?#]*$", 1)
    href_nofrag = F.regexp_replace(href, r"#.*$", "")
    joined = (
        F.when(href_nofrag == "", base)
        .when(
            href_nofrag.rlike(r"^[a-z][a-z0-9+.-]*:"), href_nofrag
        )
        .when(
            href_nofrag.startswith("//"),
            F.concat(scheme, F.lit(":"), href_nofrag),
        )
        .when(
            href_nofrag.startswith("/"),
            F.concat(origin, href_nofrag),
        )
        # RFC 3986 §5.3: a query-only reference ("?x=1") keeps the
        # base PATH and replaces only its query — the base-directory
        # join below would wrongly strip the last path segment
        # (base https://h/a/index.html + "?x=1" must resolve to
        # https://h/a/index.html?x=1, not https://h/a/?x=1).
        # ADVICE r15 #4.
        .when(
            href_nofrag.startswith("?"),
            F.concat(
                F.regexp_replace(base, r"[?#].*$", ""), href_nofrag
            ),
        )
        .otherwise(F.concat(base_dir, href_nofrag))
    )
    # collapse /./ then a bounded ../ tower
    out = F.regexp_replace(joined, r"/\.(?=/)", "")
    for _ in range(4):
        out = F.regexp_replace(
            out, r"/(?!\.\./)[^/?#]+/\.\./", "/"
        )
    return out


def extract_links(
    df: DataFrame,
    html_col: str,
    id_col: str,
    base_url_col: str | None = None,
) -> DataFrame:
    """Explode every ``<a …>…</a>`` into one row: (id, link_pos,
    href, anchor_text, nofollow[, resolved]) — the out-link plane a
    frontier, an anchor-text index and a link graph all consume.

    One regexp drives two aligned ``regexp_extract_all`` passes
    (attribute blob + anchor body; same pattern → same match count,
    so ``arrays_zip`` is positionally exact), the per-link href/rel
    come from element-level ``regexp_extract`` inside ``transform``,
    and anchor text is tag-stripped — all codegen. Links without an
    href attribute are dropped; with ``base_url_col`` a ``resolved``
    column applies :func:`resolve_url`."""
    attrs = F.regexp_extract_all(F.col(html_col), F.lit(_A_RE), 1)
    bodies = F.regexp_extract_all(F.col(html_col), F.lit(_A_RE), 2)
    base_cols = [F.col(base_url_col)] if base_url_col else []
    exploded = df.select(
        F.col(id_col),
        *base_cols,
        F.posexplode(F.arrays_zip(attrs, bodies)).alias(
            "link_pos", "__link"
        ),
    )
    href = F.nullif(
        F.regexp_extract(
            F.col("__link")["0"],
            r'(?i)href\s*=\s*["\']([^"\']*)["\']',
            1,
        ),
        F.lit(""),
    )
    nofollow = F.col("__link")["0"].rlike(
        r'(?i)rel\s*=\s*["\'][^"\']*nofollow'
    )
    out = exploded.select(
        id_col,
        "link_pos",
        href.alias("href"),
        _strip_tags(F.col("__link")["1"]).alias("anchor_text"),
        nofollow.alias("nofollow"),
        *(
            [
                resolve_url(F.col(base_url_col), href).alias("resolved")
            ]
            if base_url_col
            else []
        ),
    )
    return out.where(F.col("href").isNotNull())


def _meta_named(html: Column, name: str) -> Column:
    """content of ``<meta name="{name}" content="...">`` in either
    attribute order; NULL when absent or empty (the name= twin of
    :func:`_meta_content`'s property= extraction)."""
    a = F.regexp_extract(
        html,
        rf'(?is)<meta[^>]*name=["\']{name}["\'][^>]*'
        rf'content=["\']([^"\']*)["\']',
        1,
    )
    b = F.regexp_extract(
        html,
        rf'(?is)<meta[^>]*content=["\']([^"\']*)["\'][^>]*'
        rf'name=["\']{name}["\']',
        1,
    )
    return F.coalesce(F.nullif(a, F.lit("")), F.nullif(b, F.lit("")))


def page_directives(
    df: DataFrame,
    html_col: str,
    id_col: str,
    base_url_col: str | None = None,
    header_col: str | None = None,
) -> DataFrame:
    """Per-page indexing directives + canonical URL (r16: the two
    page-level curation signals a crawl corpus must honor before
    training — ``noindex`` pages were published with an explicit
    do-not-index instruction, and ``rel=canonical`` names the
    dedup-cluster representative the way no fingerprint can):
    (id, noindex, nofollow, canonical[, canonical_resolved]).

    ``noindex``/``nofollow`` combine the robots ``<meta>`` tag
    (either attribute order, token list split on commas, ``none`` =
    both per Google's documented semantics) with an optional
    ``X-Robots-Tag`` response-header column; ``canonical`` reads
    ``<link rel="canonical" href>`` in either attribute order, and
    with ``base_url_col`` resolves it through :func:`resolve_url`.
    Whole-stage codegen throughout — one scan projection, no
    shuffle."""
    html = F.col(html_col)
    robots = F.lower(
        F.coalesce(_meta_named(html, "robots"), F.lit(""))
    )
    if header_col is not None:
        robots = F.concat(
            robots, F.lit(","),
            F.lower(F.coalesce(F.col(header_col), F.lit(""))),
        )
    toks = F.transform(
        F.split(robots, ","), lambda t: F.trim(t)
    )
    noindex = F.arrays_overlap(
        toks, F.array(F.lit("noindex"), F.lit("none"))
    )
    nofollow = F.arrays_overlap(
        toks, F.array(F.lit("nofollow"), F.lit("none"))
    )
    canon_a = F.regexp_extract(
        html,
        r'(?is)<link[^>]*rel=["\']canonical["\'][^>]*'
        r'href=["\']([^"\']*)["\']',
        1,
    )
    canon_b = F.regexp_extract(
        html,
        r'(?is)<link[^>]*href=["\']([^"\']*)["\'][^>]*'
        r'rel=["\']canonical["\']',
        1,
    )
    canonical = F.coalesce(
        F.nullif(canon_a, F.lit("")), F.nullif(canon_b, F.lit(""))
    )
    cols = [
        F.col(id_col),
        noindex.alias("noindex"),
        nofollow.alias("nofollow"),
        canonical.alias("canonical"),
    ]
    if base_url_col is not None:
        cols.append(
            F.when(
                canonical.isNotNull(),
                resolve_url(F.col(base_url_col), canonical),
            ).alias("canonical_resolved")
        )
    return df.select(*cols)


_DATA_URI_RE = (
    r'(?i)["\'(]data:(image/[a-z.+-]+);base64,'
    r"([A-Za-z0-9+/=]+)"
)


def extract_inline_images(
    df: DataFrame, html_col: str, id_col: str
) -> DataFrame:
    """Explode every base64 ``data:image/...`` URI into one row:
    (id, img_pos, declared_mime, content BINARY) — the inline-image
    plane (r16: pages embed small images as data URIs routinely —
    icons, tracking pixels, above-the-fold art — and a multimodal
    corpus must surface them like any fetched image; the decoded
    bytes land in a binary column so the EXISTING image plane —
    sniff, extract_features, pHash, dedup — consumes them
    unchanged).

    Codegen end to end: one regexp drives two aligned
    ``regexp_extract_all`` passes (mime + payload), ``unbase64``
    decodes JVM-side. The DECLARED mime is reported as-is — the
    downstream sniffer judges the actual bytes, so a mislabeled
    data URI is caught exactly like a mislabeled Content-Type."""
    mimes = F.regexp_extract_all(
        F.col(html_col), F.lit(_DATA_URI_RE), 1
    )
    payloads = F.regexp_extract_all(
        F.col(html_col), F.lit(_DATA_URI_RE), 2
    )
    exploded = df.select(
        F.col(id_col),
        F.posexplode(F.arrays_zip(mimes, payloads)).alias(
            "img_pos", "__m"
        ),
    )
    return exploded.select(
        id_col,
        "img_pos",
        F.lower(F.col("__m")["0"]).alias("declared_mime"),
        F.unbase64(F.col("__m")["1"]).alias("content"),
    )
