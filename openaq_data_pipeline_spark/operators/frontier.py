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
into one ledger entry. The exact-dedup index machinery composes
unchanged once the key is right.

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
) -> DataFrame:
    """(id, host, host_rank, pos_in_host, fetch_slot) — a total,
    deterministic, politeness-interleaved fetch order over the
    frontier. Rows whose URL has no parseable host are dropped (they
    are not fetchable). ``fetch_slot`` values are unique but not
    dense: a slot is skipped whenever its host has run out of URLs —
    the crawler processes slots in order, which preserves the
    politeness spacing without a compaction pass. ``max_per_host``
    caps each host's URLs this scheduling round (the crawl-budget
    knob): the MD5 order decides deterministically which URLs wait
    for the next round."""
    with_host = urls.select(
        F.col(id_col), url_host(F.col(url_col)).alias("host"),
        F.md5(F.col(url_col).cast("string")).alias("__h"),
    ).where(F.col("host").isNotNull())
    hosts = with_host.select("host").distinct()
    ranked = hosts.select(
        "host",
        (F.dense_rank().over(Window.orderBy("host")) - 1)
        .cast("long")
        .alias("host_rank"),
    )
    n_hosts = ranked.agg(F.count(F.lit(1)).alias("__n"))
    pos = (
        F.row_number().over(
            Window.partitionBy("host").orderBy("__h", F.col(id_col))
        )
        - 1
    ).cast("long")
    scheduled = with_host.withColumn("pos_in_host", pos)
    if max_per_host is not None:
        scheduled = scheduled.where(F.col("pos_in_host") < max_per_host)
    return (
        scheduled
        .join(F.broadcast(ranked), "host")
        .crossJoin(F.broadcast(n_hosts))
        .select(
            id_col,
            "host",
            "host_rank",
            "pos_in_host",
            (F.col("pos_in_host") * F.col("__n") + F.col("host_rank")).alias(
                "fetch_slot"
            ),
        )
    )


# --- robots.txt fetch policy --------------------------------------------
#
# The other half of crawl politeness: hosts PUBLISH fetch rules
# (robots.txt, RFC 9309), and a frontier must filter against them
# before scheduling. Scope, stated honestly: the prefix-rule core of
# the spec — user-agent group selection, Allow/Disallow path prefixes,
# longest-match precedence with Allow winning length ties (the RFC
# 9309 rule). Wildcard ('*' mid-path) and anchor ('$') extensions are
# NOT evaluated; such rules are surfaced with ``supported = false``
# so a caller sees exactly what was skipped instead of silently
# mis-filtering.

_ROBOTS_SCHEMA = "host string, rule_path string, allow boolean, supported boolean"


def parse_robots(
    robots: DataFrame,
    host_col: str,
    content_col: str,
    user_agent: str = "*",
) -> DataFrame:
    """(host, rule_path, allow, supported) — the rule rows governing
    ``user_agent`` from each host's robots.txt bytes/text. Group
    selection per RFC 9309: the groups whose ``User-agent`` line
    matches the agent (falling back to ``*`` groups when no specific
    match exists anywhere in the file). Empty ``Disallow:`` lines
    (allow-everything idiom) contribute no rule. Runs as one Arrow
    ``mapInPandas`` pass — robots files are tiny and per-host."""

    def parse(batches):
        import pandas as pd

        agent = user_agent.lower()
        for pdf in batches:
            out = {"host": [], "rule_path": [], "allow": [], "supported": []}
            for host, content in zip(pdf[host_col], pdf[content_col]):
                if content is None:
                    continue
                text = (
                    content.decode("utf-8", "replace")
                    if isinstance(content, (bytes, bytearray))
                    else str(content)
                )
                groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
                agents: list[str] = []
                rules: list[tuple[str, bool]] = []
                in_rules = False
                for raw in text.splitlines():
                    line = raw.split("#", 1)[0].strip()
                    if not line or ":" not in line:
                        continue
                    key, _, val = line.partition(":")
                    key, val = key.strip().lower(), val.strip()
                    if key == "user-agent":
                        if in_rules:
                            groups.append((agents, rules))
                            agents, rules, in_rules = [], [], False
                        agents.append(val.lower())
                    elif key in ("allow", "disallow"):
                        in_rules = True
                        if val:
                            rules.append((val, key == "allow"))
                groups.append((agents, rules))
                specific = [
                    g for g in groups
                    if any(a != "*" and a in agent for a in g[0])
                ]
                chosen = specific or [
                    g for g in groups if "*" in g[0]
                ]
                for _, grules in chosen:
                    for path, allow in grules:
                        out["host"].append(host)
                        out["rule_path"].append(path)
                        out["allow"].append(allow)
                        out["supported"].append(
                            "*" not in path and not path.endswith("$")
                        )
            yield pd.DataFrame(out)

    return robots.select(host_col, content_col).mapInPandas(
        parse, schema=_ROBOTS_SCHEMA
    )


def apply_robots(
    urls: DataFrame, url_col: str, id_col: str, rules: DataFrame
) -> DataFrame:
    """(id, host, allowed) — every URL judged against its host's
    parsed rules: the longest matching SUPPORTED rule decides, Allow
    wins length ties (RFC 9309 precedence), no matching rule — or no
    rules for the host at all — means allowed. Plan: one broadcast
    join on host (the rules side is per-host tiny), prefix match +
    one max_by aggregate per URL."""
    from openaq_data_pipeline_spark.operators.text import url_host

    u = urls.select(
        F.col(id_col),
        url_host(F.col(url_col)).alias("host"),
        F.when(
            F.try_parse_url(F.col(url_col), F.lit("PATH")).isNull()
            | (F.try_parse_url(F.col(url_col), F.lit("PATH")) == ""),
            F.lit("/"),
        )
        .otherwise(F.try_parse_url(F.col(url_col), F.lit("PATH")))
        .alias("__path"),
    ).where(F.col("host").isNotNull())
    r = rules.where(F.col("supported"))
    joined = u.join(F.broadcast(r), "host", "left").withColumn(
        "__m",
        F.when(
            F.col("rule_path").isNotNull()
            & F.col("__path").startswith(F.col("rule_path")),
            # precedence key: longer rule wins; allow wins ties
            F.struct(
                F.length("rule_path").alias("l"),
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
    """(source, url, from_index) — every ``<loc>`` entry of each
    sitemap document (public sitemaps.org protocol): regular sitemaps
    yield page URLs (``from_index = false``); sitemap INDEX files
    yield child-sitemap URLs (``from_index = true``) for the caller
    to fetch and feed back through this same function — recursion is
    a driver-side loop over fetch rounds, not a plan construct. Pure
    codegen: one regexp_extract_all for the locs, one root-element
    probe for the index flag, one explode; entity-decoded (& is the
    one entity the protocol requires escaping in URLs)."""
    locs = F.regexp_extract_all(
        F.col(content_col), F.lit(r"(?is)<loc>\s*(.*?)\s*</loc>"), 1
    )
    is_index = F.col(content_col).rlike(r"(?is)<\s*sitemapindex[\s>]")
    out = sitemaps.select(
        F.col(source_col).alias("source"),
        F.explode(locs).alias("__raw"),
        is_index.alias("from_index"),
    )
    url = F.col("__raw")
    for ent, rep in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                     ("&apos;", "'"), ("&amp;", "&")):
        url = F.replace(url, F.lit(ent), F.lit(rep))
    return out.select("source", url.alias("url"), "from_index")
