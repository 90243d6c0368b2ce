"""Mail-archive explode — MBOX and RFC 5322 headers (r16 capability
wave: mailing-list archives are a classic long-form dialogue
training source; the mbox container and the header grammar are
public and decompose with PURE Catalyst — message split on the
``From `` envelope separator, RFC 5322 §2.2.3 folding unfolded with
one regexp, headers by anchored case-insensitive extracts, the body
after the first blank line).

Not in scope (documented): MIME multipart decomposition and
encoded-word (RFC 2047) decoding — the raw header/body split is the
product here; a body-part plane would compose the router's existing
charset/decode machinery the way EPUB composes the zip hop."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _header(unfolded, name: str):
    return F.nullif(
        F.regexp_extract(
            unfolded, r"(?im)^" + name + r":[ \t]*([^\n]*)", 1
        ),
        F.lit(""),
    )


def explode_mbox(
    df: DataFrame, content_col: str, id_col: str
) -> DataFrame:
    """MBOX → one row per message: (id, msg_idx, from_addr,
    subject, date, message_id, body_lines, body_chars). Messages
    split on the ``\\nFrom `` envelope separator (the mboxrd
    convention — ``>From `` quoted lines inside bodies do NOT
    split); headers unfold per RFC 5322 before extraction; the body
    is everything after the first blank line (mbox ``>From``
    quoting is left as stored — the corpus-scrub plane owns content
    rewrites)."""
    norm = F.regexp_replace(F.col(content_col), "\r\n?", "\n")
    msgs = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.concat(F.lit("\n"), norm), r"\nFrom ")
        ).alias("__pos", "__msg"),
    ).where((F.col("__pos") > 0) & (F.col("__msg") != ""))
    m = F.col("__msg")
    # drop the envelope line (sender + asctime), keep the message
    body_all = F.regexp_replace(m, r"^[^\n]*\n", "")
    headers = F.regexp_extract(body_all, r"(?s)^(.*?)\n\n", 1)
    # a headers-only message (no blank line) keeps everything
    headers = F.when(headers == "", body_all).otherwise(headers)
    unfolded = F.regexp_replace(headers, r"\n[ \t]+", " ")
    # trailing newlines strip before counting: the envelope split
    # consumes the last newline of every non-final message, so raw
    # lengths would differ by mbox FRAMING position, not content
    body = F.regexp_replace(
        F.regexp_extract(body_all, r"(?s)\n\n(.*)$", 1),
        r"\n+$",
        "",
    )
    w = Window.partitionBy(id_col).orderBy("__pos")
    return msgs.withColumn("__body", body).select(
        F.col(id_col),
        (F.row_number().over(w) - 1).cast("long").alias("msg_idx"),
        _header(unfolded, "From").alias("from_addr"),
        _header(unfolded, "Subject").alias("subject"),
        _header(unfolded, "Date").alias("date"),
        _header(unfolded, "Message-ID").alias("message_id"),
        F.when(
            F.col("__body") == "", F.lit(0)
        ).otherwise(
            F.size(F.split(F.col("__body"), "\n"))
        ).cast("int").alias("body_lines"),
        F.length(F.col("__body")).cast("long").alias("body_chars"),
    )
