"""Crawl-frontier scheduling: politeness-interleaved fetch order.

The last step of the crawl front door (URL canonicalization → dedup →
SCHEDULE): a crawler must spread consecutive fetches across hosts so
no single host sees a burst. :func:`frontier_schedule` assigns every
URL a global ``fetch_slot`` with the politeness invariant built into
the arithmetic — ``slot = pos_within_host · n_hosts + host_rank`` —
so between two fetches of the SAME host there are always ≥
``n_hosts − 1`` other slots, hosts with more URLs naturally extend
further down the schedule, and the whole assignment is deterministic
(MD5 order within a host, lexicographic host ranks): re-running the
scheduler on the same frontier reproduces the same slots, which is
what lets a crashed crawl resume mid-schedule.

Scale shape: one window over ``host`` for within-host positions (one
exchange on host — politeness grouping is inherently host-keyed), and
host ranks from a DISTINCT-host table (host-count-sized, dense_rank
in one tiny window, broadcast back). Skewed hosts cost schedule
LENGTH, not shuffle skew — the window moves each host's URLs to one
partition exactly once; a host too large for one partition is a
politeness problem before it is a Spark problem (you would shard it
by path prefix upstream).

URL-ledger note (cross-batch seen-URL dedup): hash the CANONICAL
URL verbatim — ``F.md5(canon_url)`` — never through
`text.fingerprint`, which lowercases and collapses whitespace and
would merge distinct case-sensitive paths (``/Page`` vs ``/page``)
into one ledger entry. :func:`url_ledger_gate` (r9) IS that
composition: the exact-dedup index machinery reused unchanged with
the verbatim-URL MD5 as the key.

Reference parity note: no crawl plane exists in the reference; this
extends the engine's LLM-data-acquisition tier beside
`text.canonicalize_url`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.operators.text import url_host


def frontier_schedule(
    urls: DataFrame, url_col: str, id_col: str,
    max_per_host: int | None = None,
    crawl_delays: DataFrame | None = None,
    default_delay_sec: float = 1.0,
    priority_col: str | None = None,
) -> DataFrame:
    """(id, host, host_rank, pos_in_host, fetch_slot[, not_before_sec])
    — a total, deterministic, politeness-interleaved fetch order over
    the frontier. Rows whose URL has no parseable host are dropped
    (they are not fetchable). ``fetch_slot`` values are unique but not
    dense: a slot is skipped whenever its host has run out of URLs —
    the crawler processes slots in order, which preserves the
    politeness spacing without a compaction pass. ``max_per_host``
    caps each host's URLs this scheduling round (the crawl-budget
    knob): the MD5 order decides deterministically which URLs wait
    for the next round.

    ``crawl_delays`` (r9, (host, crawl_delay_sec) — the
    :func:`parse_crawl_delays` output) adds the TIME half of
    politeness beside the slot-spacing half: ``not_before_sec`` =
    ``pos_in_host × max(declared delay, default_delay_sec)`` is the
    earliest offset (from crawl start) at which a fetch may run —
    the crawler takes slots in order but defers any fetch whose
    ``not_before_sec`` lies in the future. One extra broadcast join;
    the slot invariant is untouched.

    ``priority_col`` (r12, the :func:`recrawl_candidates` hook):
    within each host, lower values schedule FIRST (ties broken by
    the MD5 shuffle as before) — new/changed pages fetch before
    fresh ones while every politeness invariant (slot spacing,
    per-host budget, delay offsets) binds unchanged, because
    priority only permutes the order INSIDE a host's own positions.
    With ``max_per_host``, budget-evicted URLs are now the host's
    LOWEST-priority ones rather than an arbitrary MD5 tail."""
    prio = (
        [F.col(priority_col).alias("__prio")]
        if priority_col is not None
        else []
    )
    with_host = urls.select(
        F.col(id_col), url_host(F.col(url_col)).alias("host"),
        F.md5(F.col(url_col).cast("string")).alias("__h"),
        *prio,
    ).where(F.col("host").isNotNull())
    # three consumers (window, host-rank dim, n_hosts scalar) — the
    # try_parse_url projection never canonicalizes equal across
    # subplans, so materialize it once instead of scanning the
    # frontier three times (the dedup-index lazy-checkpoint move)
    with_host = with_host.localCheckpoint(eager=False)
    hosts = with_host.select("host").distinct()
    # dense host ranks via the two-phase range-partition pattern
    # (ids.assign_global_ids): a web-scale frontier has ~1e8 distinct
    # hosts, and the old dense_rank over Window.orderBy("host") ran
    # them through ONE partition (VERDICT r9 #7). Ranks are identical
    # (hosts are distinct, so row-number == dense-rank).
    from openaq_data_pipeline_spark.operators.ids import assign_global_ids

    ranked = assign_global_ids(hosts, "host", id_name="host_rank")
    n_hosts = ranked.agg(F.count(F.lit(1)).alias("__n"))
    order = (
        [F.col("__prio").asc_nulls_last()] if priority_col is not None else []
    ) + [F.col("__h"), F.col(id_col)]
    pos = (
        F.row_number().over(Window.partitionBy("host").orderBy(*order))
        - 1
    ).cast("long")
    scheduled = with_host.withColumn("pos_in_host", pos)
    if max_per_host is not None:
        scheduled = scheduled.where(F.col("pos_in_host") < max_per_host)
    out_cols = [
        F.col(id_col),
        F.col("host"),
        F.col("host_rank"),
        F.col("pos_in_host"),
        (F.col("pos_in_host") * F.col("__n") + F.col("host_rank")).alias(
            "fetch_slot"
        ),
    ]
    # size-aware host-dim join: no hand-placed broadcast hint — AQE
    # measures the ranked dim's actual shuffle size at runtime and
    # converts to broadcast when it fits (the fixture-scale plan pin
    # checks it does); a 1e8-host frontier falls back to a shuffle
    # join instead of OOMing the driver (VERDICT r9 #7). The 1-row
    # n_hosts scalar is always broadcast.
    joined = (
        scheduled.join(ranked, "host")
        .crossJoin(F.broadcast(n_hosts))
    )
    if crawl_delays is not None:
        # one row per host, MOST conservative delay — a delays table
        # accumulated over several robots fetch rounds may carry
        # duplicates, and a bare left join would duplicate scheduled
        # rows and break slot uniqueness (r9 review finding)
        per_host = crawl_delays.groupBy("host").agg(
            F.max("crawl_delay_sec").alias("crawl_delay_sec")
        )
        # same size-awareness as the ranked dim: delays accumulate
        # per host, so the table scales with host cardinality
        joined = joined.join(per_host, "host", "left")
        out_cols.append(
            (
                F.col("pos_in_host").cast("double")
                * F.greatest(
                    F.coalesce(
                        F.col("crawl_delay_sec"),
                        F.lit(float(default_delay_sec)),
                    ),
                    F.lit(float(default_delay_sec)),
                )
            ).alias("not_before_sec")
        )
    return joined.select(*out_cols)


# --- robots.txt fetch policy --------------------------------------------
#
# The other half of crawl politeness: hosts PUBLISH fetch rules
# (robots.txt, RFC 9309), and a frontier must filter against them
# before scheduling. Full rule evaluation (r9, closing the r8
# "supported=false" gap): user-agent group selection, Allow/Disallow
# rules INCLUDING '*' wildcards and the '$' end anchor (RFC 9309
# §2.2.3), matched against path PLUS query (a ``Disallow: /search?q=``
# rule must be able to fire), most-octets-match precedence with Allow
# winning ties (§2.2.2), and the RFC's percent-encoding
# normalization: %XX octets in the unreserved RFC 3986 range are
# decoded on BOTH sides before comparison, reserved / non-ASCII
# octets stay encoded, and %2A / %24 in a RULE denote a literal
# '*' / '$' (the RFC's escape for matching those octets verbatim).

_ROBOTS_SCHEMA = (
    "host string, rule_path string, allow boolean, "
    "rule_regex string, rule_len long"
)

_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_HEX = frozenset("0123456789abcdefABCDEF")


def _pct_normalize_py(s: str, extra: str = "") -> str:
    """RFC 9309 §2.2.2 canonical 'path to match' form: decode %XX
    where the octet is RFC 3986 unreserved (or in ``extra``); keep
    reserved / non-ASCII escapes encoded with UPPERCASE hex; encode
    raw non-ASCII characters (the RFC's raw-UTF-8-in-robots.txt
    example) to their UTF-8 percent form."""
    out, i, n = [], 0, len(s)
    while i < n:
        c = s[i]
        if (
            c == "%"
            and i + 3 <= n
            and all(h in _HEX for h in s[i + 1 : i + 3])
        ):
            hx = s[i + 1 : i + 3]
            ch = chr(int(hx, 16))
            out.append(ch if ch in _UNRESERVED or ch in extra else "%" + hx.upper())
            i += 3
            continue
        if ord(c) > 0x7E:
            out.append("".join(f"%{b:02X}" for b in c.encode("utf-8")))
        else:
            out.append(c)
        i += 1
    return "".join(out)


def _rule_to_regex(path: str) -> tuple[str, int]:
    """(anchored Java regex, precedence length) for one robots rule.
    Un-encoded '*' is a wildcard, a trailing un-encoded '$' anchors
    the end; literal segments are percent-normalized with %2A / %24
    additionally decoded (the RFC escape for literal '*' / '$') and
    regex-escaped. Precedence length counts the normalized octets
    (wildcards and the anchor count 1 each — the most-octets rule of
    RFC 9309 §2.2.2, pattern-length tiebreak as in Google's public
    matcher)."""
    import re

    anchored = path.endswith("$")
    body = path[:-1] if anchored else path
    parts = [_pct_normalize_py(p, extra="*$") for p in body.split("*")]
    regex = "^" + ".*".join(re.escape(p) for p in parts)
    if anchored:
        regex += "$"
    rule_len = sum(len(p) for p in parts) + (len(parts) - 1) + int(anchored)
    return regex, rule_len


def _pct_normalize_col(col):
    """The URL-side twin of :func:`_pct_normalize_py` as a pure
    codegen expression (split on '%', decode each candidate octet via
    conv/char, rejoin): unreserved %XX decoded, %2A/%24 decoded to
    literal '*'/'$' so rule escapes match either spelling, kept
    escapes uppercased, everything else verbatim. Raw non-ASCII in
    the URL column is NOT re-encoded — a URL is expected to arrive
    transport-encoded (RFC 3986 requires it); the rule side handles
    the raw-UTF-8 case because robots.txt files do carry raw text."""
    parts = F.split(col, "%")
    first = F.element_at(parts, 1)
    rest = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))

    def dec(p):
        hexs = F.upper(F.substring(p, 1, 2))
        code = F.conv(hexs, 16, 10).cast("int")
        decodable = hexs.rlike("^[0-9A-F]{2}$") & (
            ((code >= 48) & (code <= 57))       # 0-9
            | ((code >= 65) & (code <= 90))     # A-Z
            | ((code >= 97) & (code <= 122))    # a-z
            | code.isin(45, 46, 95, 126, 42, 36)  # - . _ ~ * $
        )
        tail = F.substring(p, 3, 1 << 30)
        return F.when(decodable, F.concat(F.char(code), tail)).otherwise(
            F.when(
                hexs.rlike("^[0-9A-F]{2}$"),
                # kept escape: uppercase the hex (canonical spelling)
                F.concat(F.lit("%"), hexs, tail),
            ).otherwise(F.concat(F.lit("%"), p))
        )

    return F.when(F.size(parts) <= 1, col).otherwise(
        F.concat(first, F.array_join(F.transform(rest, dec), ""))
    )


def parse_robots(
    robots: DataFrame,
    host_col: str,
    content_col: str,
    user_agent: str = "*",
) -> DataFrame:
    """(host, rule_path, allow, rule_regex, rule_len) — the rule rows
    governing ``user_agent`` from each host's robots.txt bytes/text,
    each precompiled to an anchored regex (wildcards and '$' handled
    per RFC 9309 §2.2.3) plus its precedence length. ``rule_path``
    keeps the raw spelling for observability. Group selection per RFC
    9309: the groups whose ``User-agent`` line matches the agent
    (falling back to ``*`` groups when no specific match exists
    anywhere in the file). Empty ``Disallow:`` lines
    (allow-everything idiom) contribute no rule. Runs as one Arrow
    ``mapInPandas`` pass — robots files are tiny and per-host."""

    def parse(batches):
        import pandas as pd

        agent = user_agent.lower()
        for pdf in batches:
            out = {
                "host": [], "rule_path": [], "allow": [],
                "rule_regex": [], "rule_len": [],
            }
            for host, content in zip(pdf[host_col], pdf[content_col]):
                for grules in _chosen_groups(content, agent):
                    for key, val in grules:
                        if key not in ("allow", "disallow"):
                            continue
                        regex, rule_len = _rule_to_regex(val)
                        out["host"].append(host)
                        out["rule_path"].append(val)
                        out["allow"].append(key == "allow")
                        out["rule_regex"].append(regex)
                        out["rule_len"].append(rule_len)
            yield pd.DataFrame(out)

    return robots.select(host_col, content_col).mapInPandas(
        parse, schema=_ROBOTS_SCHEMA
    )


def _chosen_groups(content, agent: str) -> list[list[tuple[str, str]]]:
    """The directive lists of the robots.txt groups governing
    ``agent`` (RFC 9309 group selection: specific-agent groups win;
    ``*`` groups are the fallback). Each group is [(key, value), …]
    with keys lowercased — shared by the rule parser and the
    Crawl-delay reader so group selection cannot drift between
    them."""
    if content is None:
        return []
    text = (
        content.decode("utf-8", "replace")
        if isinstance(content, (bytes, bytearray))
        else str(content)
    )
    groups: list[tuple[list[str], list[tuple[str, str]]]] = []
    agents: list[str] = []
    directives: list[tuple[str, str]] = []
    in_rules = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if in_rules:
                groups.append((agents, directives))
                agents, directives, in_rules = [], [], False
            agents.append(val.lower())
        elif key in ("allow", "disallow", "crawl-delay"):
            # only recognized body keys end an agent cluster — an
            # interleaved Sitemap: line must not split a group
            in_rules = True
            if val:
                directives.append((key, val))
    groups.append((agents, directives))
    specific = [
        g for g in groups if any(a != "*" and a in agent for a in g[0])
    ]
    chosen = specific or [g for g in groups if "*" in g[0]]
    return [g[1] for g in chosen]


def parse_crawl_delays(
    robots: DataFrame,
    host_col: str,
    content_col: str,
    user_agent: str = "*",
) -> DataFrame:
    """(host, crawl_delay_sec) — the ``Crawl-delay`` of the group
    governing ``user_agent``, for hosts that declare one (the
    directive is de-facto standard — Bing/Yandex honor it — though
    absent from RFC 9309; group selection is shared with
    :func:`parse_robots` so the two readers can never disagree about
    which group applies). Multiple parseable values take the MOST
    conservative (largest). Hosts without one emit no row — the
    scheduler's ``default_delay_sec`` covers them."""

    def parse(batches):
        import pandas as pd

        agent = user_agent.lower()
        for pdf in batches:
            out = {"host": [], "crawl_delay_sec": []}
            for host, content in zip(pdf[host_col], pdf[content_col]):
                best = None
                for grules in _chosen_groups(content, agent):
                    for key, val in grules:
                        if key != "crawl-delay":
                            continue
                        try:
                            d = float(val)
                        except ValueError:
                            continue
                        if d >= 0 and (best is None or d > best):
                            best = d
                if best is not None:
                    out["host"].append(host)
                    out["crawl_delay_sec"].append(best)
            yield pd.DataFrame(out)

    return robots.select(host_col, content_col).mapInPandas(
        parse, schema="host string, crawl_delay_sec double"
    )


def parse_robots_sitemaps(
    robots: DataFrame, host_col: str, content_col: str
) -> DataFrame:
    """(host, sitemap_url) — every ``Sitemap:`` directive of each
    robots.txt (r14: the STANDARD sitemap-discovery channel — RFC
    9309 §2.3 allows other records, and sitemaps.org specifies this
    one; the line sits OUTSIDE any user-agent group, may repeat, and
    may point cross-host). The group parser already tolerates
    interleaved Sitemap lines without splitting agent clusters; this
    is the reader that finally EXTRACTS them, closing the loop into
    :func:`parse_sitemaps` → :func:`recrawl_candidates`: robots (one
    fetch per host, already required for the rules gate) → sitemap
    URLs → frontier seeds, no crawling blind.

    Pure codegen: one case-insensitive ``regexp_extract_all`` over
    the robots text + one explode — no Python, no shuffle. Relative
    or schemeless values are kept verbatim (the fetcher resolves
    against the robots URL; emitting them beats silently dropping a
    misconfigured-but-fetchable directive). Hosts without the
    directive emit no row."""
    urls = F.expr(
        f"regexp_extract_all({content_col}, "
        "'(?im)^\\\\s*sitemap\\\\s*:\\\\s*(\\\\S+)', 1)"
    )
    return (
        robots.select(F.col(host_col).alias("host"), urls.alias("__u"))
        .select("host", F.explode("__u").alias("sitemap_url"))
        .where(F.col("sitemap_url") != "")
    )


def apply_robots(
    urls: DataFrame, url_col: str, id_col: str, rules: DataFrame
) -> DataFrame:
    """(id, host, allowed) — every URL judged against its host's
    parsed rules over the percent-normalized PATH + '?' + QUERY
    target (robots rules conventionally constrain the query too —
    ``Disallow: /search?q=`` must fire; r8 review finding). The
    most-octets matching rule decides, Allow wins ties (RFC 9309
    §2.2.2 precedence), no matching rule — or no rules for the host
    at all — means allowed. Plan: one broadcast join on host (the
    rules side is per-host tiny), per-pair regex match (pattern is a
    column, precompiled once at parse time) + one max aggregate per
    URL."""
    from openaq_data_pipeline_spark.operators.text import url_host

    path = F.try_parse_url(F.col(url_col), F.lit("PATH"))
    query = F.try_parse_url(F.col(url_col), F.lit("QUERY"))
    target = F.concat(
        F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(path),
        F.when(
            query.isNotNull() & (query != ""), F.concat(F.lit("?"), query)
        ).otherwise(F.lit("")),
    )
    u = urls.select(
        F.col(id_col),
        url_host(F.col(url_col)).alias("host"),
        _pct_normalize_col(target).alias("__target"),
    ).where(F.col("host").isNotNull())
    joined = u.join(F.broadcast(rules), "host", "left").withColumn(
        "__m",
        F.when(
            F.col("rule_regex").isNotNull()
            & F.rlike(F.col("__target"), F.col("rule_regex")),
            # precedence key: most octets win; allow wins ties
            F.struct(
                F.col("rule_len").alias("l"),
                F.col("allow").cast("int").alias("a"),
                F.col("allow").alias("verdict"),
            ),
        ),
    )
    return (
        joined.groupBy(id_col, "host")
        .agg(F.max("__m").alias("__best"))
        .select(
            id_col,
            "host",
            F.coalesce(F.col("__best.verdict"), F.lit(True)).alias("allowed"),
        )
    )


# --- sitemap seed discovery ---------------------------------------------


def parse_sitemaps(
    sitemaps: DataFrame, content_col: str, source_col: str
) -> DataFrame:
    """(source, url, from_index, lastmod) — every ``<loc>`` entry of
    each sitemap document (public sitemaps.org protocol) with its
    sibling ``<lastmod>`` when present (W3C datetime string, NULL
    otherwise — the recrawl-scheduling signal: compare against the
    ledger's last-crawl time to prioritize changed pages): regular
    sitemaps yield page URLs (``from_index = false``); sitemap INDEX
    files yield child-sitemap URLs (``from_index = true``) for the
    caller to fetch and feed back through this same function —
    recursion is a driver-side loop over fetch rounds, not a plan
    construct. Pure codegen: one regexp_extract_all over the per-
    entry blocks (<url>/<sitemap> elements), per-entry loc/lastmod
    extracts, one explode; entity-decoded (& is the one entity the
    protocol requires escaping in URLs)."""
    entries = F.regexp_extract_all(
        F.col(content_col),
        F.lit(r"(?is)<(?:url|sitemap)\b[^>]*>(.*?)</(?:url|sitemap)\s*>"),
        1,
    )
    # generator output sometimes carries bare <loc> lines without the
    # <url>/<sitemap> wrappers the protocol specifies — merge them in
    # PER ROW as loc-only pseudo-entries (lastmod NULL) rather than
    # silently losing those hosts from seed discovery; array_except
    # removes the locs already covered by wrapped entries, so a
    # partially-malformed document keeps BOTH kinds (r9 review
    # finding: an all-or-nothing fallback lost orphan locs whenever
    # one wrapped entry existed). All references share one projection
    # → codegen subexpression elimination evaluates each
    # regexp_extract_all once.
    bare_locs = F.regexp_extract_all(
        F.col(content_col), F.lit(r"(?is)<loc>\s*(.*?)\s*</loc>"), 1
    )
    wrapped_locs = F.transform(
        entries,
        lambda e: F.regexp_extract(e, r"(?is)<loc>\s*(.*?)\s*</loc>", 1),
    )
    orphans = F.array_except(bare_locs, wrapped_locs)
    entries = F.concat(
        entries,
        F.transform(
            orphans, lambda x: F.concat(F.lit("<loc>"), x, F.lit("</loc>"))
        ),
    )
    is_index = F.col(content_col).rlike(r"(?is)<\s*sitemapindex[\s>]")
    out = sitemaps.select(
        F.col(source_col).alias("source"),
        F.explode(entries).alias("__e"),
        is_index.alias("from_index"),
    )
    raw = F.regexp_extract(F.col("__e"), r"(?is)<loc>\s*(.*?)\s*</loc>", 1)
    lastmod = F.regexp_extract(
        F.col("__e"), r"(?is)<lastmod>\s*(.*?)\s*</lastmod>", 1
    )
    url = raw
    for ent, rep in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                     ("&apos;", "'"), ("&amp;", "&")):
        url = F.replace(url, F.lit(ent), F.lit(rep))
    return out.where(raw != "").select(
        "source",
        url.alias("url"),
        "from_index",
        F.when(lastmod != "", lastmod).alias("lastmod"),
    )


# --- RSS/Atom feeds: discovery + item extraction (r15) --------------------
#
# The third seed-discovery channel beside sitemaps and robots
# `Sitemap:` lines: pages advertise their feeds via
# `<link rel="alternate" type="application/rss+xml|atom+xml">`, and
# the feeds themselves carry per-item URLs + publication times — the
# same recrawl-priority signal as sitemap <lastmod>, but fresher on
# news/blog hosts. Extraction-grade codegen regexp over the XML (the
# parse_sitemaps posture: one extract_all + per-entry extracts, no
# Python in the row path); CDATA unwraps, the protocol's five XML
# entities decode.


def _xml_entities(col):
    """The five XML entities, &amp; last so double-escapes stay
    literal (the html_extract ordering)."""
    for ent, rep in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                     ("&apos;", "'"), ("&amp;", "&")):
        col = F.replace(col, F.lit(ent), F.lit(rep))
    return col


def _xml_text(entry, tag: str):
    """Text of the first <tag>…</tag> in an entry blob: CDATA
    unwrapped, entities decoded, NULL when absent/empty."""
    raw = F.regexp_extract(
        entry, rf"(?is)<{tag}(?:\s[^>]*)?>\s*(.*?)\s*</{tag}\s*>", 1
    )
    raw = _xml_entities(
        F.regexp_replace(raw, r"(?s)^<!\[CDATA\[(.*)\]\]>$", "$1")
    )
    return F.when(raw != "", raw)


def discover_feeds(
    df: DataFrame,
    html_col: str,
    id_col: str,
    base_url_col: str | None = None,
) -> DataFrame:
    """(id, feed_pos, feed_url, feed_format[, resolved]) — every
    ``<link rel="alternate" type="application/rss+xml|atom+xml">``
    advertisement in each page, both attribute orders, href
    optionally resolved against ``base_url_col`` (the seed channel a
    frontier merges with sitemap discovery)."""
    from openaq_data_pipeline_spark.operators.webmeta import resolve_url

    tags = F.regexp_extract_all(
        F.col(html_col), F.lit(r"(?is)<link\s([^>]*)>"), 1
    )
    feed_tags = F.filter(
        tags,
        lambda t: t.rlike(
            r'(?i)type\s*=\s*["\']application/(rss|atom)\+xml["\']'
        )
        & t.rlike(r'(?i)rel\s*=\s*["\']alternate["\']'),
    )
    base_cols = [F.col(base_url_col)] if base_url_col else []
    exploded = df.select(
        F.col(id_col),
        *base_cols,
        F.posexplode(feed_tags).alias("feed_pos", "__tag"),
    )
    href = F.nullif(
        F.regexp_extract(
            F.col("__tag"), r'(?i)href\s*=\s*["\']([^"\']*)["\']', 1
        ),
        F.lit(""),
    )
    fmt = F.when(
        F.col("__tag").rlike(r"(?i)application/rss\+xml"), "rss"
    ).otherwise("atom")
    out = exploded.select(
        id_col,
        "feed_pos",
        href.alias("feed_url"),
        fmt.alias("feed_format"),
        *(
            [resolve_url(F.col(base_url_col), href).alias("resolved")]
            if base_url_col
            else []
        ),
    )
    return out.where(F.col("feed_url").isNotNull())


def parse_feed_items(
    feeds: DataFrame, content_col: str, source_col: str
) -> DataFrame:
    """(source, item_pos, feed_format, title, url, item_id,
    published) — every ``<item>`` (RSS 2.0) or ``<entry>`` (Atom) of
    each feed document. RSS: title/link/guid/pubDate; Atom:
    title/<link href=>/id/updated (falling back to <published>).
    The two formats normalize into ONE plane so the frontier join
    is format-blind."""
    is_atom = F.col(content_col).rlike(r"(?is)<\s*feed[\s>]")
    entries = F.regexp_extract_all(
        F.col(content_col),
        F.lit(
            r"(?is)<(?:item|entry)(?:\s[^>]*)?>(.*?)</(?:item|entry)\s*>"
        ),
        1,
    )
    out = feeds.select(
        F.col(source_col).alias("source"),
        is_atom.alias("__atom"),
        F.posexplode(entries).alias("item_pos", "__e"),
    )
    e = F.col("__e")
    atom_link = F.nullif(
        _xml_entities(
            F.regexp_extract(
                e,
                r'(?is)<link\s[^>]*href\s*=\s*["\']([^"\']*)["\']',
                1,
            )
        ),
        F.lit(""),
    )
    url = F.when(F.col("__atom"), atom_link).otherwise(
        _xml_text(e, "link")
    )
    item_id = F.when(F.col("__atom"), _xml_text(e, "id")).otherwise(
        _xml_text(e, "guid")
    )
    published = F.when(
        F.col("__atom"),
        F.coalesce(_xml_text(e, "updated"), _xml_text(e, "published")),
    ).otherwise(_xml_text(e, "pubDate"))
    return out.select(
        "source",
        "item_pos",
        F.when(F.col("__atom"), "atom").otherwise("rss").alias(
            "feed_format"
        ),
        _xml_text(e, "title").alias("title"),
        url.alias("url"),
        item_id.alias("item_id"),
        published.alias("published"),
    )


# --- URL ledger: cross-batch seen-URL dedup (r9) --------------------------


def url_ledger_gate(
    urls: DataFrame,
    url_col: str,
    id_col: str,
    index,
    update_index: bool = True,
    self_match_is_kept: bool = True,
) -> DataFrame:
    """(id, canon_url, kept, dup_of) — disposition of every
    fetch-candidate URL against a persisted seen-URL ledger (an
    ``ExactIndex``): spelling variants of one resource collapse via
    :func:`~openaq_data_pipeline_spark.operators.text.canonicalize_url`,
    already-crawled resources drop with ``dup_of`` = the id that
    first fetched them, fresh resources keep and (with
    ``update_index``) enter the ledger so the NEXT batch dedups
    against them. Rows whose URL has no parseable scheme+host are
    excluded — they are not fetchable (the frontier_schedule
    contract).

    Key discipline (module docstring): the ledger key is
    ``md5(canonical_url)`` computed VERBATIM — paths stay
    case-sensitive — and only then flows through the exact-index
    machinery (whose own normalize-and-hash is applied to the hex
    key, where lowercasing is a no-op). Plan shape is therefore
    exactly `incremental_exact_dedup`'s: one hash-aggregate over the
    batch, one bucket-local index join, history never re-read."""
    from openaq_data_pipeline_spark.operators.incremental_dedup import (
        build_exact_index,
        incremental_exact_dedup,
    )
    from openaq_data_pipeline_spark.operators.text import canonicalize_url

    keyed = (
        urls.select(
            F.col(id_col),
            canonicalize_url(F.col(url_col)).alias("canon_url"),
        )
        .where(F.col("canon_url").isNotNull())
        .withColumn("__ukey", F.md5(F.col("canon_url")))
        # two consumers (the disposition, the canon_url join-back) —
        # canonicalize once, not per subplan
        .localCheckpoint(eager=False)
    )
    spark = urls.sparkSession
    if not spark.catalog.tableExists(index.hashes_table):
        # first batch bootstraps an EMPTY ledger; the batch itself
        # flows through the incremental disposition like every later
        # one (one code path, one semantics)
        build_exact_index(keyed.limit(0), "__ukey", id_col, index)
    disp = incremental_exact_dedup(
        keyed, "__ukey", id_col, index, update_index=update_index
    )
    if self_match_is_kept:
        # replay-stable disposition (r9 review finding): on a rerun
        # the ledger already holds this batch's keys with THESE ids
        # as survivors — dup_of == own id can only be the replayed
        # row itself (ids globally unique), so it stays kept. The
        # default suits idempotent batch reruns; the streaming gate
        # passes False on FIRST attempts so a source re-delivering an
        # old id in a later batch still drops
        # (`streaming.ingest._is_retry`).
        from openaq_data_pipeline_spark.operators.incremental_dedup import (
            replay_self_match,
        )

        self_match = replay_self_match(id_col)
        disp = disp.select(
            F.col(id_col),
            (F.col("kept") | self_match).alias("kept"),
            F.when(~self_match, F.col("dup_of")).alias("dup_of"),
        )
    return keyed.select(F.col(id_col), "canon_url").join(disp, id_col)


# --- recrawl prioritization (r12) ----------------------------------------


def recrawl_candidates(
    entries: DataFrame,
    crawled: DataFrame,
    url_col: str = "url",
    lastmod_col: str = "lastmod",
    crawl_ts_col: str = "last_crawl_ts",
    hint_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Close the sitemap→frontier loop: judge every discovered URL
    against the crawl history and emit a sortable recrawl priority —
    the comparison :func:`parse_sitemaps`' ``lastmod`` exists to
    feed. ``entries`` carries discovered URLs (+ any provenance
    columns, preserved); ``crawled`` carries one row per previously
    crawled URL with its last-crawl timestamp.

    Output = entries' columns + ``lastmod_ts`` (the W3C datetime
    parsed: full ISO-8601 with offset via the native cast, date-only
    via the explicit pattern — an unparseable string degrades to
    NULL/'unknown', never a failure) + ``last_crawl_ts`` + ``status``
    + ``priority``:

    - ``new`` (0): never crawled — fetch first;
    - ``changed`` (1): crawled, and ``lastmod`` is STRICTLY after
      the last crawl — the sitemap says the page moved;
    - ``unknown`` (2): crawled but no usable ``lastmod`` — the
      caller's recrawl-by-age policy owns these;
    - ``fresh`` (3): crawled at/after ``lastmod`` — deprioritize.

    Both sides join on the CANONICAL URL spelling
    (:func:`~openaq_data_pipeline_spark.operators.text
    .canonicalize_url` — the ledger-wide one-spelling contract), a
    plain equi-join: broadcast when the history side is dimension-
    small, shuffled-hash under AQE otherwise; no window, no skew
    construct needed (URL keys are near-unique). Feed the result
    straight into :func:`frontier_schedule` ordered by
    (priority, lastmod_ts desc).

    ``hint_cols`` (r14, VERDICT r13 next #6): names of CONDITIONAL-
    FETCH columns on ``crawled`` (``etag``, ``last_modified`` — the
    response validators the ledger recorded) carried through from
    the MOST RECENT crawl row via ``max_by`` in the same
    pre-aggregation, NULL for never-crawled URLs — so the scheduled
    rows ship ready-made If-None-Match / If-Modified-Since hints
    and the fetcher (ops plane) can turn a 'fresh'/'unknown' recrawl
    into a cheap 304."""
    from openaq_data_pipeline_spark.operators.text import canonicalize_url

    lm = F.col(lastmod_col)
    lastmod_ts = F.coalesce(
        F.try_to_timestamp(lm),
        F.try_to_timestamp(lm, F.lit("yyyy-MM-dd")),
    )
    left = entries.withColumn(
        "__canon", canonicalize_url(F.col(url_col))
    ).withColumn("__lm_ts", lastmod_ts)
    # one row per canonical spelling, MOST RECENT crawl — a ledger
    # accumulated over rounds (or holding spelling variants) would
    # otherwise fan each entry into contradictory status rows that
    # schedule the same URL twice (the crawl_delays r9 finding, same
    # file, same fix)
    right = (
        crawled.select(
            canonicalize_url(F.col(url_col)).alias("__canon"),
            F.col(crawl_ts_col).alias("__crawl_ts"),
            *[F.col(h) for h in hint_cols],
        )
        .groupBy("__canon")
        .agg(
            F.max("__crawl_ts").alias("__crawl_ts"),
            # validators travel with the crawl they came from: the
            # hint of any OLDER crawl row would mismatch the copy
            # the fetcher actually holds
            *[
                F.max_by(F.col(h), F.col("__crawl_ts")).alias(h)
                for h in hint_cols
            ],
        )
    )
    joined = left.join(right, "__canon", "left")
    status = (
        F.when(F.col("__crawl_ts").isNull(), F.lit("new"))
        .when(
            F.col("__lm_ts").isNotNull()
            & (F.col("__lm_ts") > F.col("__crawl_ts")),
            F.lit("changed"),
        )
        .when(F.col("__lm_ts").isNull(), F.lit("unknown"))
        .otherwise(F.lit("fresh"))
    )
    priority = (
        F.when(status == "new", 0)
        .when(status == "changed", 1)
        .when(status == "unknown", 2)
        .otherwise(3)
    )
    return joined.select(
        *[c for c in entries.columns],
        F.col("__lm_ts").alias("lastmod_ts"),
        F.col("__crawl_ts").alias(crawl_ts_col),
        status.alias("status"),
        priority.cast("int").alias("priority"),
        *[F.col(h) for h in hint_cols],
    )


def parse_hls_playlist(
    df: DataFrame, content_col: str, id_col: str
) -> DataFrame:
    """HLS/M3U8 playlist explode (r16 capability wave: streaming
    video dominates crawl bandwidth, and both the frontier — which
    must enqueue segment/variant URIs — and a video-metadata plane
    read the same playlist; public spec: RFC 8216).

    One row per URI entry: (id, entry_idx, kind, duration_ms,
    bandwidth, resolution, uri). ``kind`` is ``segment`` when the
    governing tag is ``#EXTINF`` (media playlist) and ``variant``
    for ``#EXT-X-STREAM-INF`` (master playlist); each URI line
    binds to the NEAREST preceding tag line (RFC 8216 §4.1: the
    tag applies to the following URI), carried by a per-document
    ``last(ignorenulls)`` running window — whole-stage codegen plus
    one doc-local window, the subtitle plane's exchange shape.
    Non-#EXTM3U inputs yield no rows (callers gate on the header)."""
    norm = F.regexp_replace(F.col(content_col), "\r\n?", "\n")
    lines = df.where(norm.startswith("#EXTM3U")).select(
        F.col(id_col),
        F.posexplode(F.split(norm, "\n")).alias("__pos", "__line"),
    )
    line = F.trim(F.col("__line"))
    tag = F.when(
        line.startswith("#EXTINF")
        | line.startswith("#EXT-X-STREAM-INF"),
        line,
    )
    w = Window.partitionBy(id_col).orderBy("__pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tagged = lines.select(
        F.col(id_col),
        F.col("__pos"),
        line.alias("__l"),
        F.last(tag, ignorenulls=True).over(w).alias("__tag"),
    )
    uri_rows = tagged.where(
        (F.col("__l") != "")
        & ~F.col("__l").startswith("#")
        & F.col("__tag").isNotNull()
    )
    kind = F.when(
        F.col("__tag").startswith("#EXTINF"), F.lit("segment")
    ).otherwise(F.lit("variant"))
    secs = F.regexp_extract(F.col("__tag"), r"#EXTINF:([0-9.]+)", 1)
    duration_ms = F.when(
        secs != "", F.round(secs.cast("double") * 1000).cast("long")
    )
    bandwidth = F.nullif(
        F.regexp_extract(F.col("__tag"), r"BANDWIDTH=(\d+)", 1),
        F.lit(""),
    ).cast("long")
    resolution = F.nullif(
        F.regexp_extract(
            F.col("__tag"), r"RESOLUTION=(\d+x\d+)", 1
        ),
        F.lit(""),
    )
    w2 = Window.partitionBy(id_col).orderBy("__pos")
    return uri_rows.select(
        F.col(id_col),
        (F.row_number().over(w2) - 1).cast("long").alias("entry_idx"),
        kind.alias("kind"),
        duration_ms.alias("duration_ms"),
        bandwidth.alias("bandwidth"),
        resolution.alias("resolution"),
        F.col("__l").alias("uri"),
    )


_CSS_URL_RE = (
    r"(?i)(?:@import\s+(?:url\()?|url\()\s*"
    r"[\"']?([^\"')\s]+)[\"']?\s*\)?"
)


def extract_css_refs(
    df: DataFrame, css_col: str, id_col: str
) -> DataFrame:
    """Explode a stylesheet's asset references into rows: (id,
    ref_pos, kind, uri) — r16: CSS is the asset-dependency plane a
    frontier must walk (fonts, background images, @import chains)
    and the crawl plane already routes ``text/css`` payloads; one
    codegen regexp covers ``url(...)`` in all three quote spellings
    and ``@import`` with or without the url() wrapper. ``kind`` is
    ``import`` for @import references (they fetch as stylesheets
    and recurse) and ``asset`` otherwise; ``data:`` URIs drop (the
    inline-image plane owns them — nothing to fetch)."""
    comments_stripped = F.regexp_replace(
        F.col(css_col), r"(?s)/\*.*?\*/", " "
    )
    full = F.regexp_extract_all(
        comments_stripped, F.lit(_CSS_URL_RE), 0
    )
    uris = F.regexp_extract_all(
        comments_stripped, F.lit(_CSS_URL_RE), 1
    )
    exploded = df.select(
        F.col(id_col),
        F.posexplode(F.arrays_zip(full, uris)).alias(
            "ref_pos", "__r"
        ),
    )
    kind = F.when(
        F.lower(F.col("__r")["0"]).startswith("@import"),
        F.lit("import"),
    ).otherwise(F.lit("asset"))
    uri = F.col("__r")["1"]
    kept = exploded.select(
        F.col(id_col),
        F.col("ref_pos").alias("__p"),
        kind.alias("kind"),
        uri.alias("uri"),
    ).where(~F.lower(F.col("uri")).startswith("data:"))
    w = Window.partitionBy(id_col).orderBy("__p")
    return kept.select(
        F.col(id_col),
        (F.row_number().over(w) - 1).cast("long").alias("ref_pos"),
        "kind",
        "uri",
    )
