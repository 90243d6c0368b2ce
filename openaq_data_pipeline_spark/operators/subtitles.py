"""Subtitle/caption cue extraction — SRT and WebVTT (r16 capability
wave: crawl corpora carry caption files alongside video, and they
are the alignment text a multimodal training pipeline pairs with
frames; public formats: SubRip's de-facto layout, WebVTT per the
W3C spec).

Spark-first: the whole plane is WHOLE-STAGE CODEGEN — newline
normalization, blank-line block split, one timestamp-arrow regexp
driving three aligned ``regexp_extract`` passes, integer timestamp
math, and the tag strip — no Python in the row path. The only
exchange is the per-document ``row_number`` that renumbers cues
after non-cue blocks (the WEBVTT header, NOTE/STYLE blocks, stray
indices) are dropped; at 100 TB that is a partitionBy(doc) window
over rows that are already doc-local, not a global sort.

Timestamps: SRT writes ``HH:MM:SS,mmm``, WebVTT ``HH:MM:SS.mmm``
and allows the hours to be omitted (``MM:SS.mmm``); both comma and
dot separators are accepted on either format (the wild disagrees
with both specs routinely), and the optional-hours form is resolved
by component count, not format guess.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_TS = r"(?:\d{1,2}:)?\d{1,2}:\d{2}[.,]\d{3}"
# one pattern, three aligned group extractions (the webmeta idiom):
# start, end, cue text (the rest of the block)
_CUE_RE = (
    r"(?s)(?:^|\n)(" + _TS + r")[ \t]*-->[ \t]*(" + _TS + r")"
    r"[^\n]*\n?(.*)"
)


def detect_subtitle_format(col: Column) -> Column:
    """'vtt' / 'srt' / NULL — header-level detection: WEBVTT magic
    (optional BOM) wins; else a leading numeric-index line followed
    by a timestamp arrow reads as SubRip."""
    norm = F.regexp_replace(col, "^﻿", "")
    return (
        F.when(norm.startswith("WEBVTT"), F.lit("vtt"))
        .when(
            norm.rlike(r"^\s*\d+\s*\n" + _TS + r"[ \t]*-->"),
            F.lit("srt"),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def _ts_ms(ts: Column) -> Column:
    """Timestamp string → milliseconds (BIGINT): component count
    resolves the optional-hours WebVTT form."""
    p = F.split(ts, r"[:.,]")
    full = (
        p.getItem(0).cast("long") * 3600000
        + p.getItem(1).cast("long") * 60000
        + p.getItem(2).cast("long") * 1000
        + p.getItem(3).cast("long")
    )
    short = (
        p.getItem(0).cast("long") * 60000
        + p.getItem(1).cast("long") * 1000
        + p.getItem(2).cast("long")
    )
    return F.when(F.size(p) == 4, full).otherwise(short)


def extract_subtitle_cues(
    df: DataFrame, content_col: str, id_col: str
) -> DataFrame:
    """Explode every cue into one row: (id, cue_idx, start_ms,
    end_ms, text). Blocks split on blank lines; blocks without a
    timestamp arrow (the WEBVTT header line, NOTE/STYLE blocks)
    drop; cue ids/indices ahead of the arrow are ignored; WebVTT
    styling tags (``<b>``, ``<c.class>``, ``<00:00:01.000>``) strip
    from the text; ``cue_idx`` renumbers surviving cues 0..n-1 in
    file order."""
    norm = F.regexp_replace(
        F.regexp_replace(F.col(content_col), "\r\n?", "\n"),
        "^﻿",
        "",
    )
    blocks = df.select(
        F.col(id_col),
        F.posexplode(F.split(norm, r"\n[ \t]*\n+")).alias(
            "__pos", "__block"
        ),
    )
    start = F.regexp_extract(F.col("__block"), _CUE_RE, 1)
    end = F.regexp_extract(F.col("__block"), _CUE_RE, 2)
    body = F.regexp_extract(F.col("__block"), _CUE_RE, 3)
    text = F.trim(
        F.regexp_replace(
            F.regexp_replace(body, r"<[^>]*>", ""), r"\s+", " "
        )
    )
    cues = blocks.select(
        F.col(id_col),
        F.col("__pos"),
        start.alias("__start"),
        end.alias("__end"),
        text.alias("text"),
    ).where(F.col("__start") != "")
    w = Window.partitionBy(id_col).orderBy("__pos")
    return cues.select(
        F.col(id_col),
        (F.row_number().over(w) - 1).cast("long").alias("cue_idx"),
        _ts_ms(F.col("__start")).alias("start_ms"),
        _ts_ms(F.col("__end")).alias("end_ms"),
        "text",
    )
