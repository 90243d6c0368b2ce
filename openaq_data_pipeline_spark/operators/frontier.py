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

Reference parity note: no crawl plane exists in the reference; this
extends the engine's LLM-data-acquisition tier beside
`text.canonicalize_url`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.operators.text import url_host


def frontier_schedule(
    urls: DataFrame, url_col: str, id_col: str
) -> DataFrame:
    """(id, host, host_rank, pos_in_host, fetch_slot) — a total,
    deterministic, politeness-interleaved fetch order over the
    frontier. Rows whose URL has no parseable host are dropped (they
    are not fetchable). ``fetch_slot`` values are unique but not
    dense: a slot is skipped whenever its host has run out of URLs —
    the crawler processes slots in order, which preserves the
    politeness spacing without a compaction pass."""
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
    return (
        with_host.withColumn("pos_in_host", pos)
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
