"""Distributed REST extraction plumbing (SURVEY §2.1 S3/S4).

The reference fetches one HTTP GET per location id (linear backoff,
404→null row; ``extract_openaq_locations.py:37-69``) and paginated
time-range measurement fetches (exponential backoff, in-flight dedup
on ``(datetimeFrom.utc, value)``; ``extract_measurements.py:66-147``)
— all single-process. The Spark-native shape distributes the key set
across partitions and runs the fetch inside ``mapInPandas`` with one
HTTP session per partition, so 1000 executors fan out 1000 sessions
while the retry/backoff/dedup *semantics* stay identical per key.

No network egress exists in this environment, so the transport is an
injectable callable (``fetch(url, params) -> (status, json)``); tests
inject a deterministic fake. The default transport tries ``requests``
and raises a clear error if unavailable — the plumbing (partitioning,
batching, retry policy, output schema) is the real, tested surface.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FetchFn = Callable[[str, dict], tuple[int, dict | None]]


def default_transport() -> FetchFn:
    try:
        import requests
    except ImportError as exc:  # pragma: no cover - env without requests
        raise RuntimeError(
            "no HTTP transport available; inject fetch= explicitly"
        ) from exc

    session = requests.Session()

    def fetch(url: str, params: dict) -> tuple[int, dict | None]:
        resp = session.get(url, params=params, timeout=15)
        return resp.status_code, (resp.json() if resp.ok else None)

    return fetch


@dataclass
class RetryPolicy:
    """Reference retry policies: locations = 3 attempts, linear
    ``1s*(n+1)`` (``extract_openaq_locations.py:26,45-69``);
    measurements = 3 attempts, exponential ``2**n``
    (``extract_measurements.py:82,128``)."""

    max_retries: int = 3
    backoff: str = "linear"  # or "exponential"
    base_seconds: float = 1.0
    sleep: Callable[[float], None] = time.sleep

    def wait(self, attempt: int) -> None:
        if self.backoff == "exponential":
            self.sleep(self.base_seconds * (2**attempt))
        else:
            self.sleep(self.base_seconds * (attempt + 1))


def fetch_with_retry(
    fetch: FetchFn, url: str, params: dict, policy: RetryPolicy
) -> dict | None:
    """One keyed GET with the reference's semantics: 404 → None row
    (kept, not dropped); retry exhaustion → raise (fail loud,
    ``extract_openaq_locations.py:62-67``)."""
    last_exc: Exception | None = None
    for attempt in range(policy.max_retries):
        try:
            status, payload = fetch(url, params)
            if status == 404:
                return None
            if status == 200 and payload is not None:
                return payload
            raise RuntimeError(f"HTTP {status} for {url}")
        except Exception as exc:  # noqa: BLE001 - retry any transport error
            last_exc = exc
            if attempt < policy.max_retries - 1:
                policy.wait(attempt)
    raise RuntimeError(f"retries exhausted for {url}") from last_exc


def fetch_per_key(
    keys_df: DataFrame,
    url_template: str,
    out_schema: str,
    row_fn: Callable[[int, dict | None], dict],
    fetch: FetchFn | None = None,
    policy: RetryPolicy | None = None,
    params: dict | None = None,
) -> DataFrame:
    """S3: distributed per-key REST fetch.

    ``keys_df`` must have a ``key`` long column (distinct ids, cf.
    A5). Each partition opens one transport; each key becomes one
    output row via ``row_fn(key, payload)`` (payload None on 404).
    """
    policy = policy or RetryPolicy()
    base_params = params or {}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport = fetch or default_transport()
        for pdf in batches:
            rows = []
            for key in pdf["key"].tolist():
                payload = fetch_with_retry(
                    transport, url_template.format(key=key), base_params, policy
                )
                rows.append(row_fn(int(key), payload))
            yield pd.DataFrame(rows)

    # Spread keys evenly; at cluster scale this is the fan-out knob.
    n = max(1, keys_df.sparkSession.sparkContext.defaultParallelism)
    return keys_df.repartition(n, "key").mapInPandas(run, schema=out_schema)


def paginate_time_range(
    fetch: FetchFn,
    url: str,
    date_from: str,
    date_to: str,
    policy: RetryPolicy | None = None,
    limit: int = 1000,
) -> list[dict]:
    """S4 core loop: ``limit``-sized pages over ``[date_from,
    date_to)``; in-flight dedup on ``(period.datetimeFrom.utc,
    value)``; a short page terminates (``extract_measurements.py:
    66-147``). Runs per key inside the mapInPandas fan-out."""
    policy = policy or RetryPolicy(backoff="exponential")
    seen: set[tuple] = set()
    out: list[dict] = []
    page = 1
    while True:
        params = {
            "limit": limit,
            "page": page,
            "date_from": date_from,
            "date_to": date_to,
        }
        payload = fetch_with_retry(fetch, url, params, policy) or {}
        results = payload.get("results", [])
        for rec in results:
            if not isinstance(rec, dict):  # non-dict guard (P8)
                continue
            period = rec.get("period") or {}
            dt_from = (period.get("datetimeFrom") or {}).get("utc")
            dedup_key = (dt_from, rec.get("value"))
            if dedup_key in seen:
                continue
            seen.add(dedup_key)
            out.append(rec)
        if len(results) < limit:
            return out
        page += 1


def distinct_keys(df: DataFrame, col: str) -> DataFrame:
    """A5: distinct key extraction, engine-side (replaces the
    reference's Python ``set`` accumulation)."""
    return df.select(F.col(col).cast("long").alias("key")).where(
        F.col(col).isNotNull()
    ).distinct()


def fetch_paginated_per_key(
    keys_df: DataFrame,
    url_template: str,
    date_from: str,
    date_to: str,
    fetch: FetchFn | None = None,
    policy: RetryPolicy | None = None,
    limit: int = 1000,
) -> DataFrame:
    """S4: distributed paginated time-range fetch. Each key runs the
    reference's page loop (exponential backoff, in-flight dedup,
    short-page stop) inside its partition and expands to one output
    row per fetched record: ``(key, payload)`` with the record
    re-serialized as a JSON string (parsed downstream with the
    declared payload schema — same drift tolerance as the lake)."""
    import json as _json

    policy = policy or RetryPolicy(backoff="exponential")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport = fetch or default_transport()
        for pdf in batches:
            keys_out: list[int] = []
            payloads: list[str] = []
            for key in pdf["key"].tolist():
                recs = paginate_time_range(
                    transport,
                    url_template.format(key=key),
                    date_from,
                    date_to,
                    policy,
                    limit,
                )
                for rec in recs:
                    keys_out.append(int(key))
                    payloads.append(_json.dumps(rec))
            yield pd.DataFrame({"key": keys_out, "payload": payloads})

    n = max(1, keys_df.sparkSession.sparkContext.defaultParallelism)
    return keys_df.repartition(n, "key").mapInPandas(
        run, schema="key long, payload string"
    )
