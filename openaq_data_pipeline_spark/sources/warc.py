"""WARC (Web ARChive, ISO 28500) scan — the wire format of every
public crawl corpus (Common Crawl ships response archives as
member-gzipped WARC), and therefore the front-most source of a
training-data acquisition pipeline: WARC → response records →
`text.html_extract`/`html_extract_density` → the curation funnel.

Engine shape: `spark.read.format("binaryFile")` parallelizes by FILE
(one task per archive — the standard Spark WARC topology, since
member-gzip is not block-splittable), and one Arrow ``mapInPandas``
pass parses records with stdlib-only code (zlib for the gzip
members). Decoding is STREAMING per gzip member (ADVICE r9: the old
walk materialized the whole decompressed stream, several GB for a
~1 GB archive): peak per-task memory beyond the binaryFile blob
itself is one decompressed member plus one bounded pandas chunk
(``_CHUNK_RECORDS`` rows per emitted frame). Corrupt records and
non-HTTP payloads degrade to rows with NULL derived fields rather
than failing the scan (the engine-wide defensive-row contract,
`sources/lake.py`).

Record addressing (r10, VERDICT r9 #8): :func:`build_warc_cdx`
emits the public CDX-style sidecar — (target_uri, warc_file,
offset, length) per record, where offset/length address the
smallest independently-readable byte span of the archive (a gzip
member in the Common Crawl layout, the record's own span in an
uncompressed archive). :func:`read_warc_records` probes those
spans directly — one ranged read + one member decode per record,
never a full-archive decompression — which is what makes WARC
re-reads (retraction audits, targeted re-extraction) affordable
once archives number in the millions.

Reference parity note: no crawl plane exists in the reference
(extraction is REST, `dags/openaq_dag.py`); this extends the
LLM-data-acquisition tier beside `operators/frontier`.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "warc_file string, record_id string, warc_type string, "
    "target_uri string, warc_date string, content_type string, "
    "http_status int, http_content_type string, "
    "http_content_encoding string, http_etag string, "
    "http_last_modified string, payload binary"
)

CDX_SCHEMA = (
    "target_uri string, warc_file string, offset long, length long, "
    "record_id string, warc_type string, warc_date string, "
    "http_status int"
)

_GZIP_MAGIC = b"\x1f\x8b"

# rows per pandas frame emitted by the scan — bounds the assembly
# copy, not correctness (every frame concatenates to the same scan)
_CHUNK_RECORDS = 256


def _iter_gzip_members(data: bytes) -> Iterator[tuple[int, int, bytes]]:
    """(offset, compressed_length, decompressed_bytes) per gzip
    member of a member-gzipped stream — one member at a time, so the
    caller never holds more than one decompressed member (ADVICE
    r9). A corrupt member (bad CRC, truncated deflate) loses only
    ITSELF: the walk resyncs at the next gzip magic and keeps
    decoding — members are independently decompressible, so one
    flipped bit must cost one record, not the archive's tail (r9
    review finding), and never the scan (degrade-don't-fail)."""
    import zlib

    pos, n = 0, len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(data[pos:])
        except zlib.error:
            nxt = data.find(_GZIP_MAGIC + b"\x08", pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        consumed = n - pos - len(d.unused_data)
        if consumed <= 0:  # trailing garbage — stop, keep what parsed
            return
        yield pos, consumed, chunk
        pos += consumed


def _parse_plain_records(
    data: bytes, base: int = 0
) -> Iterator[tuple[int, int, dict]]:
    """(offset, length, record) per WARC record of one UNCOMPRESSED
    buffer; offset/length span the record's own bytes (header through
    payload) shifted by ``base``. Malformed tails stop the walk
    instead of raising (what parsed so far is yielded)."""
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2
        head_start = data.find(b"WARC/", pos)
        if head_start < 0:
            return
        head_end = data.find(b"\r\n\r\n", head_start)
        if head_end < 0:
            return
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
            return  # a record without a parseable length ends the walk
        body_start = head_end + 4
        payload = data[body_start : body_start + length]
        pos = body_start + length
        http_status: int | None = None
        http_ct: str | None = None
        http_ce: str | None = None
        http_etag: str | None = None
        http_lm: str | None = None
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
                    key = k.strip().lower()
                    if _ and key == b"content-type":
                        http_ct = v.strip().decode("latin-1")
                    elif _ and key == b"content-encoding":
                        # body stays ENCODED here; the routing layer
                        # resolves it (route_crawl_payloads
                        # encoding_col) so the bomb cap and the
                        # one-hop contract live in one place
                        http_ce = v.strip().decode("latin-1").lower()
                    elif _ and key == b"etag":
                        # conditional-fetch validators (r14): ride
                        # into the crawl ledger via
                        # crawl_intake_gate(etag_col=...)
                        http_etag = v.strip().decode("latin-1")
                    elif _ and key == b"last-modified":
                        http_lm = v.strip().decode("latin-1")
                payload = payload[sep + 4 :]
        yield (
            base + head_start,
            pos - head_start,
            {
                "record_id": headers.get("warc-record-id"),
                "warc_type": headers.get("warc-type"),
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "content_type": ct or None,
                "http_status": http_status,
                "http_content_type": http_ct,
                "http_content_encoding": http_ce,
                "http_etag": http_etag,
                "http_last_modified": http_lm,
                "payload": payload,
            },
        )


def _iter_records_with_spans(
    data: bytes,
) -> Iterator[tuple[int, int, dict]]:
    """(offset, length, record) for one archive, compressed or not.
    The span addresses the smallest byte range a later probe can
    read independently: the enclosing gzip member (Common Crawl
    writes one record per member; a multi-record member shares its
    span across its records), or the record's own bytes when the
    archive is uncompressed."""
    if data[:2] == _GZIP_MAGIC:
        for off, clen, plain in _iter_gzip_members(data):
            for _, _, rec in _parse_plain_records(plain):
                yield off, clen, rec
    else:
        yield from _parse_plain_records(data)


def parse_warc_bytes(data: bytes) -> list[dict]:
    """All records of one (possibly member-gzipped) WARC archive as
    dicts matching :data:`WARC_SCHEMA` minus ``warc_file``. Pure
    stdlib; malformed tails stop the walk instead of raising (what
    parsed so far is returned)."""
    return [rec for _, _, rec in _iter_records_with_spans(data)]


_SCAN_COLUMNS = [
    "warc_file", "record_id", "warc_type", "target_uri",
    "warc_date", "content_type", "http_status",
    "http_content_type", "http_content_encoding", "http_etag",
    "http_last_modified", "payload",
]


def _scan_frames(paths, contents, chunk_records: int = _CHUNK_RECORDS):
    """Bounded-size pandas frames over the records of a batch of
    archives — the scan's assembly loop, factored out so the memory
    contract (no frame holds more than ``chunk_records`` records) is
    unit-testable without Spark."""
    import pandas as pd

    rows = []
    for fpath, content in zip(paths, contents):
        for _, _, rec in _iter_records_with_spans(bytes(content)):
            rec["warc_file"] = fpath
            rows.append(rec)
            if len(rows) >= chunk_records:
                yield pd.DataFrame(rows, columns=_SCAN_COLUMNS)
                rows = []
    yield pd.DataFrame(rows, columns=_SCAN_COLUMNS)


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
        for pdf in batches:
            yield from _scan_frames(pdf["path"], pdf["content"])

    return bins.mapInPandas(parse, schema=WARC_SCHEMA)


# --- CDX-style record index + targeted probe (r10) ---------------------


def build_warc_cdx(spark: SparkSession, path: str) -> DataFrame:
    """One :data:`CDX_SCHEMA` row per record of every archive under
    ``path`` — the public Common Crawl CDX pattern: a cheap sidecar
    (headers only, payloads never retained) that later probes join
    against to fetch single records by (warc_file, offset, length).
    Built by the same file-parallel walk as :func:`read_warc`;
    persist it as parquet next to the archives and reuse it across
    every audit/re-extraction pass."""
    bins = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )
    cols = [
        "target_uri", "warc_file", "offset", "length",
        "record_id", "warc_type", "warc_date", "http_status",
    ]

    def index(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for off, length, rec in _iter_records_with_spans(
                    bytes(content)
                ):
                    rows.append(
                        {
                            "target_uri": rec["target_uri"],
                            "warc_file": fpath,
                            "offset": off,
                            "length": length,
                            "record_id": rec["record_id"],
                            "warc_type": rec["warc_type"],
                            "warc_date": rec["warc_date"],
                            "http_status": rec["http_status"],
                        }
                    )
                    if len(rows) >= _CHUNK_RECORDS:
                        yield pd.DataFrame(rows, columns=cols)
                        rows = []
            yield pd.DataFrame(rows, columns=cols)

    return bins.mapInPandas(index, schema=CDX_SCHEMA)


def _open_span(warc_file: str, offset: int, length: int) -> bytes:
    """One ranged read of ``length`` bytes at ``offset`` through
    pyarrow's FileSystem abstraction (handles file:// and object
    stores alike — never a driver-local open)."""
    from pyarrow import fs as pafs

    try:
        filesystem, p = pafs.FileSystem.from_uri(warc_file)
    except Exception:
        # binaryFile paths may surface as bare 'file:/x' or a plain
        # local path — both are the local filesystem
        filesystem = pafs.LocalFileSystem()
        p = warc_file.removeprefix("file:")
    with filesystem.open_input_file(p) as fh:
        return fh.read_at(length, offset)


def read_warc_records(spark: SparkSession, index_df: DataFrame) -> DataFrame:
    """Fetch exactly the records addressed by ``index_df`` (any frame
    carrying ``warc_file``, ``offset``, ``length`` — a filtered
    :func:`build_warc_cdx` output) as :data:`WARC_SCHEMA` rows. Each
    row costs ONE ranged read plus the decode of ONE gzip member —
    the rest of the archive is never touched, which a corruption
    probe proves in ``tests/test_warc.py`` (every other member
    byte-flipped, the probe still returns the addressed record
    exactly). Peak task memory is one member, independent of archive
    size."""
    spans = index_df.select("warc_file", "offset", "length")

    def fetch(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fpath, off, length in zip(
                pdf["warc_file"], pdf["offset"], pdf["length"]
            ):
                blob = _open_span(str(fpath), int(off), int(length))
                for _, _, rec in _iter_records_with_spans(blob):
                    rec["warc_file"] = fpath
                    rows.append(rec)
            yield pd.DataFrame(rows, columns=_SCAN_COLUMNS)

    return spans.mapInPandas(fetch, schema=WARC_SCHEMA)
