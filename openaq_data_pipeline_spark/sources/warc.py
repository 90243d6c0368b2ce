"""WARC (Web ARChive, ISO 28500) scan — the wire format of every
public crawl corpus (Common Crawl ships response archives as
member-gzipped WARC), and therefore the front-most source of a
training-data acquisition pipeline: WARC → response records →
`text.html_extract`/`html_extract_density` → the curation funnel.

Engine shape: `spark.read.format("binaryFile")` parallelizes by FILE
(one task per archive — the standard Spark WARC topology, since
member-gzip is not block-splittable), and one Arrow ``mapInPandas``
pass parses records with stdlib-only code (zlib for the gzip
members). Memory per task is bounded by the largest single archive —
Common Crawl caps WARCs near 1 GB precisely so per-file processors
can make this assumption; shard counts, not file sizes, carry the
scale. Corrupt records and non-HTTP payloads degrade to rows with
NULL derived fields rather than failing the scan (the engine-wide
defensive-row contract, `sources/lake.py`).

Reference parity note: no crawl plane exists in the reference
(extraction is REST, `dags/openaq_dag.py`); this extends the
LLM-data-acquisition tier beside `operators/frontier`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "warc_file string, record_id string, warc_type string, "
    "target_uri string, warc_date string, content_type string, "
    "http_status int, http_content_type string, payload binary"
)

_GZIP_MAGIC = b"\x1f\x8b"


def _gunzip_members(data: bytes) -> bytes:
    """Concatenated decompression of a member-gzipped stream (each
    WARC record its own gzip member — the Common Crawl layout). A
    corrupt member (bad CRC, truncated deflate) loses only ITSELF:
    the walk resyncs at the next gzip magic and keeps decoding —
    members are independently decompressible, so one flipped bit
    must cost one record, not the archive's tail (r9 review
    finding), and never the scan (degrade-don't-fail contract)."""
    import zlib

    out, pos, n = [], 0, len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(data[pos:])
        except zlib.error:
            nxt = data.find(_GZIP_MAGIC + b"\x08", pos + 1)
            if nxt < 0:
                break
            pos = nxt
            continue
        out.append(chunk)
        consumed = n - pos - len(d.unused_data)
        if consumed <= 0:  # trailing garbage — stop, keep what parsed
            break
        pos += consumed
    return b"".join(out)


def parse_warc_bytes(data: bytes) -> list[dict]:
    """All records of one (possibly member-gzipped) WARC archive as
    dicts matching :data:`WARC_SCHEMA` minus ``warc_file``. Pure
    stdlib; malformed tails stop the walk instead of raising (what
    parsed so far is returned)."""
    if data[:2] == _GZIP_MAGIC:
        data = _gunzip_members(data)
    records, pos, n = [], 0, len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2
        head_start = data.find(b"WARC/", pos)
        if head_start < 0:
            break
        head_end = data.find(b"\r\n\r\n", head_start)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[head_start:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().decode("latin-1").lower()] = (
                    v.strip().decode("latin-1")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break  # a record without a parseable length ends the walk
        body_start = head_end + 4
        payload = data[body_start : body_start + length]
        pos = body_start + length
        http_status: int | None = None
        http_ct: str | None = None
        ct = headers.get("content-type", "")
        if ct.startswith("application/http") and payload[:5] in (
            b"HTTP/",
        ):
            # split the HTTP message: status line + headers, then body
            sep = payload.find(b"\r\n\r\n")
            if sep >= 0:
                status_block = payload[:sep]
                lines = status_block.split(b"\r\n")
                parts = lines[0].split(b" ")
                if len(parts) >= 2 and parts[1].isdigit():
                    http_status = int(parts[1])
                for line in lines[1:]:
                    k, _, v = line.partition(b":")
                    if _ and k.strip().lower() == b"content-type":
                        http_ct = v.strip().decode("latin-1")
                payload = payload[sep + 4 :]
        records.append(
            {
                "record_id": headers.get("warc-record-id"),
                "warc_type": headers.get("warc-type"),
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "content_type": ct or None,
                "http_status": http_status,
                "http_content_type": http_ct,
                "payload": payload,
            }
        )
    return records


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Scan a directory/glob of ``.warc`` / ``.warc.gz`` archives into
    one record per row (:data:`WARC_SCHEMA`). File-parallel
    (binaryFile source) + one Arrow parse pass; compose response
    records straight into the crawl front door::

        pages = (read_warc(spark, "s3://crawl/segment/*.warc.gz")
                 .where("warc_type = 'response' AND http_status = 200")
                 .selectExpr("target_uri AS url",
                             "decode(payload, 'utf-8') AS html"))
    """
    bins = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(bytes(content)):
                    rec["warc_file"] = fpath
                    rows.append(rec)
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file", "record_id", "warc_type", "target_uri",
                    "warc_date", "content_type", "http_status",
                    "http_content_type", "payload",
                ],
            )

    return bins.mapInPandas(parse, schema=WARC_SCHEMA)
