"""EPUB manifest extraction (r16 capability wave: ebooks are a
long-document training source — EPUB is a ZIP with an OCF
``META-INF/container.xml`` pointing at an OPF package document
carrying Dublin Core metadata + the manifest/spine; public specs:
EPUB 3 / OCF).

Deliberate COMPOSITION, not a new parser: the archive explodes
through the router's existing container plane
(``route_container_members`` — capped member reads, one-hop
contract), and this module is two codegen projections plus two
id-equi-joins over the exploded member rows: container.xml →
rootfile path, (id, rootfile) → the OPF member → title / language /
creator / manifest / spine counts. XML fields extract with the
webmeta regexp idiom over an ISO-8859-1 decode (ASCII markup is
byte-transparent; a full XML parser is not needed for these
attribute/element shapes)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def epub_manifest(
    members: DataFrame,
    id_col: str,
    name_col: str = "member_name",
    payload_col: str = "payload",
) -> DataFrame:
    """Exploded EPUB member rows → one manifest row per book:
    (id, rootfile, title, language, creator, n_manifest_items,
    n_spine_items). Books whose container.xml is missing or names
    no rootfile yield no row; a named-but-absent OPF keeps the
    rootfile with NULL metadata (observable)."""
    txt = F.decode(F.col(payload_col), "ISO-8859-1")
    rootfiles = (
        members.where(F.col(name_col) == "META-INF/container.xml")
        .select(
            F.col(id_col),
            F.nullif(
                F.regexp_extract(
                    txt, r'full-path\s*=\s*"([^"]+)"', 1
                ),
                F.lit(""),
            ).alias("rootfile"),
        )
        .where(F.col("rootfile").isNotNull())
        # a hostile zip may carry DUPLICATE container.xml members —
        # collapse to one deterministic rootfile per book instead of
        # fanning the join out (min = lexicographic tiebreak)
        .groupBy(id_col)
        .agg(F.min("rootfile").alias("rootfile"))
    )
    opf = members.select(
        F.col(id_col),
        F.col(name_col).alias("__name"),
        F.nullif(
            F.regexp_extract(
                txt, r"(?is)<dc:title[^>]*>(.*?)</dc:title>", 1
            ),
            F.lit(""),
        ).alias("title"),
        F.nullif(
            F.regexp_extract(
                txt, r"(?is)<dc:language[^>]*>(.*?)</dc:language>", 1
            ),
            F.lit(""),
        ).alias("language"),
        F.nullif(
            F.regexp_extract(
                txt, r"(?is)<dc:creator[^>]*>(.*?)</dc:creator>", 1
            ),
            F.lit(""),
        ).alias("creator"),
        F.size(
            F.regexp_extract_all(txt, F.lit(r"(?i)<item\s"), 0)
        ).cast("int").alias("n_manifest_items"),
        F.size(
            F.regexp_extract_all(txt, F.lit(r"(?i)<itemref\s"), 0)
        ).cast("int").alias("n_spine_items"),
    )
    return rootfiles.join(
        opf,
        (rootfiles[id_col] == opf[id_col])
        & (F.col("rootfile") == F.col("__name")),
        "left",
    ).select(
        rootfiles[id_col],
        "rootfile", "title", "language", "creator",
        "n_manifest_items", "n_spine_items",
    )
