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
    "http_last_modified string, warc_profile string, "
    "warc_refers_to string, warc_payload_digest string, "
    "payload binary"
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
                # revisit plumbing (r15): the WARC 1.1 recrawl-dedup
                # mechanism — a revisit record references the
                # original via WARC-Refers-To and carries the
                # payload digest instead of the payload
                "warc_profile": headers.get("warc-profile"),
                "warc_refers_to": headers.get("warc-refers-to"),
                "warc_payload_digest": headers.get(
                    "warc-payload-digest"
                ),
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
    "http_last_modified", "warc_profile", "warc_refers_to",
    "warc_payload_digest", "payload",
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


# --- revisit records: the crawl-dedup contract (r15) --------------------
#
# WARC 1.1 (ISO 28500) lets a recrawl that fetched IDENTICAL content
# write a small `revisit` record instead of duplicating the payload:
# WARC-Profile names the identical-payload-digest mechanism,
# WARC-Refers-To points at the original response record, and
# WARC-Payload-Digest carries the content hash that proved identity.
# This is the storage-side twin of the engine's conditional-fetch
# validators (r14): validators avoid RE-FETCHING unchanged pages,
# revisits avoid RE-STORING unchanged payloads. A corpus reader must
# EXPAND revisits back to their original payloads to see every crawl
# observation — resolve_revisits below is that join.

REVISIT_PROFILE = (
    "http://netpreservation.org/warc/1.1/revisit/"
    "identical-payload-digest"
)


def warc_payload_digest(payload: bytes) -> str:
    """Labelled payload digest for revisit records. The spec leaves
    digest encoding open (base32 is Common Crawl's convention); the
    engine writes labelled hex — self-describing and engine-neutral
    (Spark/DuckDB both spell sha1 hex natively, so oracles can
    recompute it)."""
    import hashlib

    return "sha1:" + hashlib.sha1(payload).hexdigest()


def build_warc_record(
    warc_type: str,
    payload: bytes,
    target_uri: str | None = None,
    warc_date: str = "2026-01-01T00:00:00Z",
    content_type: str = "application/http;msgtype=response",
    record_id: str | None = None,
    extra_headers: dict[str, str] | None = None,
) -> bytes:
    """One well-formed WARC/1.0 record (fixture/export face of the
    reader — byte shape matches what :func:`parse_warc_bytes`
    walks)."""
    rid = record_id or f"<urn:uuid:{warc_type}-{len(payload)}>"
    h = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Record-ID: " + rid.encode(),
        b"WARC-Date: " + warc_date.encode(),
    ]
    if target_uri:
        h.append(b"WARC-Target-URI: " + target_uri.encode())
    for k, v in (extra_headers or {}).items():
        h.append(f"{k}: {v}".encode())
    h.append(b"Content-Type: " + content_type.encode())
    h.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(h) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def build_revisit_record(
    target_uri: str,
    refers_to: str,
    payload_digest: str,
    warc_date: str = "2026-01-02T00:00:00Z",
    record_id: str | None = None,
) -> bytes:
    """A WARC 1.1 identical-payload-digest revisit record — what the
    recrawl loop writes when the conditional fetch came back 200 but
    the content hash matched the ledger (or a 304 was revalidated):
    the observation is archived, the bytes are not duplicated."""
    return build_warc_record(
        "revisit",
        b"",
        target_uri=target_uri,
        warc_date=warc_date,
        content_type="application/http;msgtype=response",
        record_id=record_id,
        extra_headers={
            "WARC-Profile": REVISIT_PROFILE,
            "WARC-Refers-To": refers_to,
            "WARC-Payload-Digest": payload_digest,
        },
    )


def resolve_revisits(records: DataFrame) -> DataFrame:
    """Expand revisit records to full observations: response rows
    pass through (``is_revisit`` false); revisit rows take the
    payload (and the HTTP-derived columns) of the record their
    ``warc_refers_to`` names, keeping their OWN ``warc_date`` /
    ``target_uri`` — the per-crawl observation timeline a freshness
    or dedup analysis needs. A revisit whose referent is absent from
    the frame keeps NULL payload (observable, never silently
    dropped); non-response/non-revisit rows (warcinfo, request, …)
    are not observations and are excluded.

    Scale shape: ONE equi-join on the record id (the original side
    deduplicates to (record_id, payload, http_*) first, so the join
    key is unique); at Common Crawl scale both sides are the same
    scan, and revisits are a small fraction — AQE broadcasts the
    resolved-original side when it fits."""
    from pyspark.sql import functions as F

    resp = records.where(F.col("warc_type") == "response")
    originals = resp.select(
        F.col("record_id").alias("__ref_id"),
        F.col("payload").alias("__orig_payload"),
        F.col("http_status").alias("__orig_status"),
        F.col("http_content_type").alias("__orig_ct"),
        F.col("http_content_encoding").alias("__orig_ce"),
    ).dropDuplicates(["__ref_id"])
    passthrough = resp.select(
        "warc_file", "record_id", "target_uri", "warc_date",
        "http_status", "http_content_type", "http_content_encoding",
        "payload",
        F.lit(False).alias("is_revisit"),
        F.lit(None).cast("string").alias("revisit_of"),
        F.lit(None).cast("string").alias("claimed_digest"),
    )
    revisits = (
        records.where(F.col("warc_type") == "revisit")
        .join(
            originals,
            F.col("warc_refers_to") == F.col("__ref_id"),
            "left",
        )
        .select(
            "warc_file", "record_id", "target_uri", "warc_date",
            F.col("__orig_status").alias("http_status"),
            F.col("__orig_ct").alias("http_content_type"),
            F.col("__orig_ce").alias("http_content_encoding"),
            F.col("__orig_payload").alias("payload"),
            F.lit(True).alias("is_revisit"),
            F.col("warc_refers_to").alias("revisit_of"),
            # the digest that PROVED identity rides along so a
            # downstream audit can re-verify it against the
            # expanded payload
            F.col("warc_payload_digest").alias("claimed_digest"),
        )
    )
    return passthrough.unionByName(revisits)


# --- WARC export sink (r15): the acquisition plane goes both ways --------


def write_warc_shards(
    df: DataFrame,
    path: str,
    url_col: str,
    payload_col: str,
    n_shards: int,
    content_type_col: str | None = None,
    default_content_type: str = "text/html",
    warc_date: str = "2026-01-01T00:00:00Z",
) -> DataFrame:
    """Export page rows as member-gzipped ``.warc.gz`` shards — the
    Common Crawl layout this module's own reader/CDX tier consumes
    (one gzip MEMBER per response record, so :func:`build_warc_cdx`
    addresses each record independently and
    :func:`read_warc_records` probes it with one ranged read). The
    republish face of the acquisition plane: a curated corpus ships
    back out in the wire format every crawl consumer speaks.

    Plan shape is :func:`~openaq_data_pipeline_spark.operators
    .curation.write_webdataset_shards`'s: the deterministic MD5
    shard shuffle, ONE exchange, an ``applyInPandas`` that streams
    each shard straight to its file (no driver collect), a staged
    ``.__tmp`` + rename so readers never see a torn shard, and
    byte-determinism for retry convergence (records lay down in
    shard_pos order; gzip members carry mtime 0; record ids derive
    from the URL+payload MD5). NULL payloads are skipped with the
    count reported in the manifest — observable, never a torn
    record. Returns the manifest (shard_id, n_records, n_skipped,
    n_bytes, warc_path)."""
    import os as _os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ct_cols = [content_type_col] if content_type_col else []
    data = df.select(
        F.col(url_col).alias("__url"),
        F.col(payload_col).alias("__payload"),
        *(
            [F.col(content_type_col).alias("__ct")]
            if content_type_col
            else [F.lit(default_content_type).alias("__ct")]
        ),
    )
    # Shard key = MD5(url || 0x00 || payload) — the same digest that
    # becomes the record id, so the key is unique per RECORD, not per
    # URL. The r15 shape (assign on a url projection, join back on
    # __url) duplicated records k×k when a crawl corpus carried the
    # same URL k times (recrawls do, routinely) and left equal-__h
    # ties unordered; computing the assignment inline on the full row
    # removes the join (one exchange fewer) and makes the ordering
    # total: exact-duplicate rows produce byte-identical records, so
    # any order among them lays down identical shard bytes, and
    # same-(url, payload) rows with different content types break the
    # tie on __ct. NULL payloads hash as empty so the skip stays
    # observable in its deterministic shard. ADVICE r15 #1.
    h = F.md5(
        F.concat(
            F.encode(F.col("__url"), "UTF-8"),
            F.lit(b"\x00"),
            F.coalesce(F.col("__payload"), F.lit(b"")),
        )
    )
    keyed = data.withColumn("__h", h).withColumn(
        "shard_id",
        (F.conv(F.substring(F.col("__h"), 1, 8), 16, 10).cast("long"))
        % n_shards,
    )
    w = Window.partitionBy("shard_id").orderBy(
        F.col("__h"), F.col("__url"), F.col("__ct")
    )
    assigned = keyed.withColumn(
        "shard_pos", F.row_number().over(w).cast("long")
    )

    def write_shard(pdf):
        import gzip as _gzip
        import hashlib as _hashlib
        import io as _io

        import pandas as pd

        shard = int(pdf["shard_id"].iloc[0])
        pdf = pdf.sort_values("shard_pos")
        _os.makedirs(path, exist_ok=True)
        warc_path = _os.path.join(path, f"shard-{shard:05d}.warc.gz")
        tmp = f"{warc_path}.__tmp"
        n = skipped = 0
        with open(tmp, "wb") as fh:
            for _, row in pdf.iterrows():
                if row["__payload"] is None:
                    skipped += 1
                    continue
                payload = bytes(row["__payload"])
                url = str(row["__url"])
                ct = str(row["__ct"] or default_content_type)
                http = (
                    b"HTTP/1.1 200 OK\r\nContent-Type: "
                    + ct.encode("latin-1")
                    + b"\r\n\r\n"
                    + payload
                )
                rid = (
                    "<urn:md5:"
                    + _hashlib.md5(
                        url.encode() + b"\x00" + payload
                    ).hexdigest()
                    + ">"
                )
                rec = build_warc_record(
                    "response", http, target_uri=url,
                    warc_date=warc_date, record_id=rid,
                )
                buf = _io.BytesIO()
                with _gzip.GzipFile(
                    fileobj=buf, mode="wb", mtime=0
                ) as gz:
                    gz.write(rec)
                fh.write(buf.getvalue())
                n += 1
        _os.replace(tmp, warc_path)
        return pd.DataFrame(
            {
                "shard_id": [shard],
                "n_records": [n],
                "n_skipped": [skipped],
                "n_bytes": [_os.path.getsize(warc_path)],
                "warc_path": [warc_path],
            }
        )

    manifest_schema = (
        "shard_id long, n_records long, n_skipped long, "
        "n_bytes long, warc_path string"
    )
    return (
        assigned.repartition(n_shards, F.col("shard_id"))
        .groupBy("shard_id")
        .applyInPandas(write_shard, schema=manifest_schema)
    )
