"""Document retraction: takedown propagation across persisted indexes.

A production training-data pipeline must be able to REMOVE documents
after the fact — copyright takedowns, user opt-outs, PII discoveries
(the right-to-be-forgotten shape). Dropping the rows from the corpus
lake is the easy half; the hard half is that the document's traces
live on in every persisted index this engine maintains between
batches: exact-dedup fingerprints (`incremental_dedup.ExactIndex`),
survivor shingle postings (`DedupIndex`), MinHash band lists
(`incremental_fuzzy.FuzzyIndex`), SimHash member lists
(`SimHashIndex`), BM25 postings + corpus stats
(`retrieval.Bm25Index`) and IVF ANN cells (`similarity.IvfIndex`).
A retraction that misses one index keeps matching, scoring or
retrieving against content the operator promised to delete.

:func:`retract_documents` removes a set of doc ids from EVERY table
of an index handle in one call, schema-driven:

- a top-level id column (the caller's ``id_col``, or the ANN tier's
  ``neighbor_id``) drops the whole row;
- an id-array column (``doc_ids`` — the posting/band-list layout)
  drops the ids from the array, and the row when the array empties;
- an array of member STRUCTS carrying an ``id`` field (the SimHash
  layout, where members hold full fingerprints) filters the members,
  and drops the row when no member survives.

Each bucketed table is rewritten IN PLACE through
:func:`~openaq_data_pipeline_spark.sources.maintenance.rewrite_bucketed_table`
— the compaction pass's crash-safe staged-swap engine — so the exact
bucket spec survives and every probe stays bucket-local and
exchange-free after a retraction, and a crash mid-rewrite never
leaves the index without a durable copy. Tables without a match are
left byte-identical (gated by one scan, no rewrite).

BM25 is the one index whose correctness depends on more than row
presence: ``{name}_stats`` holds additive (n_docs, s_tokens) rows
that readers SUM across batches. Retraction therefore appends a
NEGATIVE correction row computed from the retracted postings before
they are rewritten away, so N and avgdl — and with them every
surviving document's score — match an index that never contained the
retracted documents. (A retracted document with no postings — empty
after normalization — leaves no trace to count, so its +1 on N is
not reversed; the residual is one zero-length row in the avgdl
denominator, and exactness holds for any corpus without empty docs.
DECISION, r9 — the residual STAYS: the index records nothing for a
postings-free doc, so the only way to reverse its +1 would be to
charge N for every retracted id regardless of evidence, and takedown
lists routinely carry ids that were never indexed at all — that
"fix" would corrupt N by one per unseen id, strictly worse than one
zero-length row in a denominator. Callers who must keep N exact
should drop empty-after-normalization docs at ingest, which the
streaming gates already make natural. Pinned by
tests/test_retraction.py::TestRetractionEdgeContracts.)

Semantics note: retraction FORGETS, it does not BLOCK. Removing a
fingerprint from the exact index means a future re-submission of the
same bytes is treated as new content; if the goal is to keep the
content out forever, that is a denylist (keep the fingerprints in a
separate blocklist table and filter ingest against it), not a
retraction.

Scale: :func:`retract_documents` ships the ids as a literal array
inside the filter expressions — no join, no shuffle — which is right
for takedown-sized lists (human-scale, thousands at most) and wrong
past that: the literal blows up the PLAN, not the data.
:func:`retract_documents_df` is the same scrub as joins against an
ids DataFrame (millions of ids, streaming crash-scrubs — anything
where the list is data-sized or already distributed). Either way,
each table rewrite is one pass over that table through the
bucketed-write path: retraction cost is proportional to index size,
not corpus size, and batches of takedowns amortize to one rewrite
per table per call.

Reference parity note: the reference pipeline has no deletion story
(append-only loads, ``dags/`` carry no GDPR path) — this is part of
the engine's LLM-training-data extension tier, alongside the
incremental indexes it maintains.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, StructType

# array columns holding bare doc ids (the posting/band-list layout
# shared by DedupIndex, FuzzyIndex and the BM25-adjacent tiers)
ID_ARRAY_COLS = frozenset({"doc_ids"})
# struct field naming the member id inside array<struct> member lists
MEMBER_ID_FIELD = "id"


def _lit_ids(ids: list, elem_type: DataType):
    """The retraction set as a literal array of the column's exact
    element type — takedown-sized, so it folds into the expression
    (broadcast-free, join-free)."""
    return F.array([F.lit(i).cast(elem_type) for i in ids])


def _plan(schema: StructType, ids: list, id_names: frozenset):
    """(projections, row-keep predicates, match predicates) for one
    table, derived from its schema. Projections rewrite member
    arrays; keep predicates drop retracted / emptied rows; match
    predicates gate whether the table needs a rewrite at all."""
    projs, keeps, matches = [], [], []
    for f in schema.fields:
        col = F.col(f.name)
        dt = f.dataType
        if isinstance(dt, ArrayType):
            et = dt.elementType
            if isinstance(et, StructType) and MEMBER_ID_FIELD in et.fieldNames():
                lit = _lit_ids(ids, et[MEMBER_ID_FIELD].dataType)
                kept = F.filter(
                    col, lambda m: ~F.array_contains(lit, m[MEMBER_ID_FIELD])
                )
                projs.append(kept.alias(f.name))
                # NULL-safe: size(NULL) is NULL and a bare where(NULL)
                # would silently delete NULL-member rows (review finding)
                keeps.append(F.coalesce(F.size(kept) > 0, F.lit(True)))
                matches.append(
                    F.exists(col, lambda m: F.array_contains(lit, m[MEMBER_ID_FIELD]))
                )
                continue
            if f.name in ID_ARRAY_COLS:
                lit = _lit_ids(ids, et)
                kept = F.array_except(col, lit)
                projs.append(kept.alias(f.name))
                keeps.append(F.coalesce(F.size(kept) > 0, F.lit(True)))
                matches.append(F.arrays_overlap(col, lit))
                continue
        elif f.name in id_names and not isinstance(dt, StructType):
            lit = _lit_ids(ids, dt)
            projs.append(col)
            # NULL-safe keep: array_contains(lit, NULL) is NULL and a
            # bare where(NULL) would drop NULL-id rows (review finding)
            keeps.append(F.coalesce(~F.array_contains(lit, col), F.lit(True)))
            matches.append(F.array_contains(lit, col))
            continue
        projs.append(col)
    return projs, keeps, matches


def retract_from_table(
    spark: SparkSession, table: str, ids: list, id_names: frozenset
) -> bool:
    """Remove ``ids`` from one bucketed index table in place,
    preserving its bucket spec (crash-safe staged swap). Returns
    whether a rewrite happened — a table with no trace of the ids is
    left untouched (one gating scan, zero writes)."""
    from openaq_data_pipeline_spark.sources.maintenance import (
        rewrite_bucketed_table,
    )

    df = spark.table(table)
    _, _, matches = _plan(df.schema, ids, id_names)
    if not matches or not df.where(reduce(or_, matches)).take(1):
        return False

    def transform(src: DataFrame) -> DataFrame:
        projs, keeps, _ = _plan(src.schema, ids, id_names)
        out = src.select(*projs)
        for cond in keeps:
            out = out.where(cond)
        return out

    rewrite_bucketed_table(spark, table, transform)
    return True


def _bm25_stats_correction(
    spark: SparkSession, index, ids: list, id_col: str
):
    """(-n_docs, -s_tokens) over the retracted postings, computed
    BEFORE the tf rewrite destroys the evidence. None when no
    retracted id has postings."""
    tf = spark.table(index.tf_table)
    lit = _lit_ids(ids, tf.schema[id_col].dataType)
    row = (
        tf.where(F.array_contains(lit, F.col(id_col)))
        .agg(
            F.countDistinct(id_col).alias("n"),
            F.coalesce(F.sum("tf"), F.lit(0)).alias("s"),
        )
        .collect()[0]
    )
    return (-int(row["n"]), -int(row["s"])) if row["n"] else None


def retract_documents(
    spark: SparkSession, index, ids, id_col: str = "doc_id"
) -> list[str]:
    """Remove ``ids`` from every table of a persisted-index handle
    (any object exposing ``*_table`` properties — the
    :func:`~openaq_data_pipeline_spark.sources.maintenance.compact_index`
    convention). Returns the table names that were actually
    rewritten/corrected. ``id_col`` is the id column name the index
    was built with (the ANN tier's ``neighbor_id`` is always also
    recognized). Frozen model tables (IVF centroids) hold no
    document rows and are never touched; BM25 batch stats get the
    additive negative correction described in the module docstring.
    """
    ids = sorted(set(ids))
    if not ids:
        return []
    id_names = frozenset({id_col, "neighbor_id"})
    touched: list[str] = []

    # BM25 stats correction derives from postings that are about to
    # be rewritten away — compute it first
    correction = None
    stats_table = getattr(index, "stats_table", None)
    if (
        stats_table is not None
        and getattr(index, "tf_table", None) is not None
        and spark.catalog.tableExists(stats_table)
        and spark.catalog.tableExists(index.tf_table)
    ):
        correction = _bm25_stats_correction(spark, index, ids, id_col)

    from openaq_data_pipeline_spark.sources.maintenance import (
        bucketed_tables_of,
    )

    for _, table in bucketed_tables_of(spark, index):
        if retract_from_table(spark, table, ids, id_names):
            touched.append(table)

    if correction is not None:
        # append through the same writer shape append_bm25_index's
        # stats path uses, matching the table's exact schema
        schema = spark.table(stats_table).schema
        row = spark.createDataFrame([correction], schema)
        w = row.write.mode("append").format("parquet")
        if getattr(index, "location", None):
            w = w.option("path", index._path("stats"))
        w.saveAsTable(stats_table)
        spark.catalog.refreshTable(stats_table)
        touched.append(stats_table)
    return touched


# --- DataFrame-sized retraction: the join-based takedown path ----------
#
# `retract_documents` folds the ids into literal filter expressions —
# right for human-scale takedown lists (thousands), wrong for a
# regulatory list of millions or a streaming crash-scrub whose list is
# batch-sized: the literal array blows up the PLAN long before data
# volume matters, and building it requires the ids on the driver.
# `retract_documents_df` is the same schema-driven scrub expressed as
# JOINS against an ids DataFrame: ids never touch the driver, AQE
# broadcasts the small side at runtime (no hand-placed hint — a
# million-id list must be allowed to shuffle), and the per-table
# rewrite stays one pass through the bucketed staged-swap engine.


def _ids_frame(ids_df: DataFrame, elem_type: DataType) -> DataFrame:
    """The retraction set as a one-column (__rid) distinct frame cast
    to the target column's element type. NULLs are dropped: a NULL in
    the ids frame must never retract NULL-id rows — the literal path's
    documented NULL-safe keep (``coalesce(~array_contains, True)``,
    pinned by test_index_null_id_rows_survive) keeps them
    unconditionally, and the eqNullSafe left_anti in
    :func:`_df_transform` would otherwise match NULL against NULL."""
    col = ids_df.columns[0]
    return (
        ids_df.select(F.col(col).cast(elem_type).alias("__rid"))
        .where(F.col("__rid").isNotNull())
        .distinct()
    )


def _df_targets(schema: StructType, id_names: frozenset):
    """Classify each field of one table: ('id'|'id_array'|'members',
    field) for fields the retraction touches — the join-path analogue
    of :func:`_plan`'s schema walk (same recognition rules, so both
    paths scrub exactly the same columns)."""
    targets = []
    for f in schema.fields:
        dt = f.dataType
        if isinstance(dt, ArrayType):
            et = dt.elementType
            if isinstance(et, StructType) and MEMBER_ID_FIELD in et.fieldNames():
                targets.append(("members", f))
            elif f.name in ID_ARRAY_COLS:
                targets.append(("id_array", f))
        elif f.name in id_names and not isinstance(dt, StructType):
            targets.append(("id", f))
    return targets


def _array_kill_join(src: DataFrame, fname: str, ids: DataFrame, member: bool):
    """Rewrite one array column against the ids frame. The kill set is
    computed per DISTINCT ARRAY VALUE (explode → semi-join → regroup
    keyed on the array itself), then joined back null-safely — no
    row-identity column, no checkpoint, and only arrays that actually
    contain a retracted id appear in the kill frame. Order inside the
    surviving array is preserved (F.filter / array_except keep the
    source order, matching the literal path)."""
    elem = F.col("__e")[MEMBER_ID_FIELD] if member else F.col("__e")
    kills = (
        src.select(F.col(fname).alias("__arr"))
        .where(F.col("__arr").isNotNull())
        .distinct()
        .select("__arr", F.explode("__arr").alias("__e"))
        .select("__arr", elem.alias("__rid"))
        .join(ids, "__rid", "left_semi")
        .groupBy("__arr")
        .agg(F.collect_set("__rid").alias("__kill"))
    )
    out = src.join(kills, src[fname].eqNullSafe(kills["__arr"]), "left")
    if member:
        rewritten = F.filter(
            F.col(fname),
            lambda m: ~F.array_contains(F.col("__kill"), m[MEMBER_ID_FIELD]),
        )
    else:
        rewritten = F.array_except(F.col(fname), F.col("__kill"))
    out = out.withColumn(
        fname,
        F.when(F.col("__kill").isNotNull(), rewritten).otherwise(F.col(fname)),
    ).drop("__arr", "__kill")
    # drop rows whose array emptied; leave NULL arrays alone (the
    # literal path's NULL-safe keep, same contract)
    return out.where(F.coalesce(F.size(F.col(fname)) > 0, F.lit(True)))


def _df_transform(src: DataFrame, ids_df: DataFrame, id_names: frozenset):
    """The join-based per-table rewrite (schema-preserving, handed to
    :func:`~openaq_data_pipeline_spark.sources.maintenance.rewrite_bucketed_table`).
    Exposed for plan tests: the result's plan contains joins against
    the ids frame and NO id literals."""
    cols = src.columns
    out = src
    for kind, f in _df_targets(src.schema, id_names):
        if kind == "id":
            ids = _ids_frame(ids_df, f.dataType)
            # plain equality: NULL id rows survive LOCALLY (NULL = x
            # is never true in an anti-join), instead of depending on
            # _ids_frame's NULL filter upstream
            out = out.join(
                ids, out[f.name] == ids["__rid"], "left_anti"
            )
        elif kind == "id_array":
            ids = _ids_frame(ids_df, f.dataType.elementType)
            out = _array_kill_join(out, f.name, ids, member=False)
        else:  # members
            et = f.dataType.elementType[MEMBER_ID_FIELD].dataType
            out = _array_kill_join(
                out, f.name, _ids_frame(ids_df, et), member=True
            )
    return out.select(*cols)


def _df_table_matches(
    df: DataFrame, ids_df: DataFrame, id_names: frozenset
) -> bool:
    """Gate scan: does this table hold any trace of the ids? One
    union of id streams (top-level + exploded arrays) semi-joined
    against the ids frame, take(1)."""
    probes = []
    for kind, f in _df_targets(df.schema, id_names):
        if kind == "id":
            p = df.select(F.col(f.name).cast("string").alias("__rid"))
        elif kind == "id_array":
            p = df.select(F.explode(f.name).alias("__e")).select(
                F.col("__e").cast("string").alias("__rid")
            )
        else:
            p = df.select(F.explode(f.name).alias("__e")).select(
                F.col("__e")[MEMBER_ID_FIELD].cast("string").alias("__rid")
            )
        probes.append(p)
    if not probes:
        return False
    ids = ids_df.select(
        F.col(ids_df.columns[0]).cast("string").alias("__rid")
    ).distinct()
    return bool(reduce(DataFrame.unionByName, probes).join(
        ids, "__rid", "left_semi"
    ).take(1))


def retract_documents_df(
    spark: SparkSession, index, ids_df: DataFrame, id_col: str = "doc_id"
) -> list[str]:
    """:func:`retract_documents` with the ids as a DataFrame — the
    scale path. Same index-handle walk, same schema recognition,
    same BM25 stats correction and staged-swap rewrites; the ids stay
    distributed end-to-end (used by the streaming crash-scrub, whose
    list is batch-sized and must never collect to the driver)."""
    id_names = frozenset({id_col, "neighbor_id"})
    touched: list[str] = []

    correction = None
    stats_table = getattr(index, "stats_table", None)
    if (
        stats_table is not None
        and getattr(index, "tf_table", None) is not None
        and spark.catalog.tableExists(stats_table)
        and spark.catalog.tableExists(index.tf_table)
    ):
        tf = spark.table(index.tf_table)
        ids = _ids_frame(ids_df, tf.schema[id_col].dataType)
        row = (
            tf.join(ids, tf[id_col].eqNullSafe(ids["__rid"]), "left_semi")
            .agg(
                F.countDistinct(id_col).alias("n"),
                F.coalesce(F.sum("tf"), F.lit(0)).alias("s"),
            )
            .collect()[0]
        )
        correction = (-int(row["n"]), -int(row["s"])) if row["n"] else None

    from openaq_data_pipeline_spark.sources.maintenance import (
        bucketed_tables_of,
        rewrite_bucketed_table,
    )

    for _, table in bucketed_tables_of(spark, index):
        df = spark.table(table)
        if not _df_table_matches(df, ids_df, id_names):
            continue
        rewrite_bucketed_table(
            spark, table, lambda src: _df_transform(src, ids_df, id_names)
        )
        touched.append(table)

    if correction is not None:
        schema = spark.table(stats_table).schema
        row = spark.createDataFrame([correction], schema)
        w = row.write.mode("append").format("parquet")
        if getattr(index, "location", None):
            w = w.option("path", index._path("stats"))
        w.saveAsTable(stats_table)
        spark.catalog.refreshTable(stats_table)
        touched.append(stats_table)
    return touched


# --- lake retraction: the corpus half of the takedown ------------------


def retract_from_lake(
    spark: SparkSession,
    path: str,
    ids: list,
    id_col: str,
    partition_col: str | list[str] | None = None,
) -> list[str]:
    """Remove rows with ``ids`` from a parquet lake directory — the
    corpus half of a takedown (:func:`retract_documents` handles the
    index half). With ``partition_col`` — one column (the
    day-partitioned bronze layout) or a LIST of columns for nested
    partitioning (``["date", "hour"]`` → ``date=*/hour=*`` dirs; r9,
    VERDICT r8 #3) — only leaf partition directories that actually
    CONTAIN a retracted id are rewritten: one column-pruned scan
    finds them (dir paths taken relative to the lake root from the
    hit rows' own file paths), each is staged to a sibling directory
    and swapped in with two FS renames — the crash-safety discipline
    of
    :func:`~openaq_data_pipeline_spark.sources.maintenance.rewrite_bucketed_table`
    (no instant without a durable copy; a crash between the renames
    leaves the partition recoverable beside the table). Untouched
    partitions keep their files byte-identical. Unpartitioned lakes
    stage-and-swap the whole directory. Returns the partition dir
    paths rewritten (``['<root>']`` for unpartitioned), ``[]`` when
    no row matched.

    Scale: cost is one id-column scan plus a rewrite of ONLY the
    affected leaf partitions — a takedown touching 3 hours of a
    10-year hourly lake rewrites 3 directories."""
    import os
    import uuid

    df = spark.read.parquet(path)
    lit = _lit_ids(ids, df.schema[id_col].dataType)
    hit = F.array_contains(lit, F.col(id_col))
    # the KEEP filter must be NULL-safe: array_contains(lit, NULL) is
    # NULL, and where(NULL) would silently delete every NULL-id row
    # from the lake on any retraction (review finding)
    keep = F.coalesce(~hit, F.lit(True))
    if not ids or not df.where(hit).take(1):
        return []
    token = uuid.uuid4().hex[:8]
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())

    def swap(live: str, staged: str) -> None:
        old = f"{live}__old_{token}"
        fs.rename(jvm.org.apache.hadoop.fs.Path(live),
                  jvm.org.apache.hadoop.fs.Path(old))
        fs.rename(jvm.org.apache.hadoop.fs.Path(staged),
                  jvm.org.apache.hadoop.fs.Path(live))
        fs.delete(jvm.org.apache.hadoop.fs.Path(old), True)

    if partition_col is None:
        staged = f"{path}__retract_{token}"
        df.where(keep).write.mode("overwrite").parquet(staged)
        swap(path, staged)
        return [path]

    # which partition DIRECTORIES hold retracted rows — taken from the
    # hit rows' own file paths RELATIVE to the lake root (never by
    # re-spelling inferred partition VALUES: casting 'hour=03'
    # through an inferred int yields '3' and the match silently
    # misses — review finding; file paths also cover
    # __HIVE_DEFAULT_PARTITION__ null partitions, and relative paths
    # cover nested date=/hour= layouts where basename(dirname) saw
    # only the leaf level — r8 review finding)
    pcols = (
        [partition_col] if isinstance(partition_col, str) else list(partition_col)
    )
    root = os.path.normpath(path.removeprefix("file:"))

    def rel_dir(file_uri: str) -> str:
        d = os.path.dirname(os.path.normpath(file_uri.removeprefix("file:")))
        if not (d == root or d.startswith(root + os.sep)):
            raise ValueError(
                f"retract_from_lake: hit file {file_uri!r} outside "
                f"lake root {path!r}"
            )
        return os.path.relpath(d, root)

    affected = {
        rel_dir(r["__f"])
        for r in df.where(hit)
        .select(F.input_file_name().alias("__f"))
        .distinct()
        .collect()
    }
    for d in sorted(affected):
        levels = d.split(os.sep)
        if len(levels) != len(pcols) or any(
            not lv.startswith(f"{pc}=") for lv, pc in zip(levels, pcols)
        ):
            raise ValueError(
                f"retract_from_lake: hit rows live in {d!r}, which does "
                f"not match the declared partitioning {pcols} — wrong "
                "partition_col?"
            )
    rewritten = []
    for name in sorted(affected):
        live = f"{path}/{name}"
        staged = f"{path}__retract_{token}/{name}"
        # partition-dir files carry no partition column; neither does
        # this read, so the staged files keep the exact layout
        part = spark.read.parquet(live)
        plit = _lit_ids(ids, part.schema[id_col].dataType)
        part.where(
            F.coalesce(~F.array_contains(plit, F.col(id_col)), F.lit(True))
        ).write.mode("overwrite").parquet(staged)
        swap(live, staged)
        rewritten.append(name)
    fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}__retract_{token}"), True)
    return sorted(rewritten)


# --- denylist: the BLOCK complement of retraction -----------------------
#
# Retraction FORGETS (module docstring); a takedown that must also
# keep the content out forever needs its fingerprints remembered in a
# separate blocklist and every ingest batch filtered against it. The
# denylist is deliberately NOT the exact-dedup index: the index maps
# fingerprint → surviving doc (and retraction scrubs it); the
# denylist is a bare fingerprint set with no document ids at all —
# storing ids of content you were ordered to delete defeats the
# point.


from dataclasses import dataclass as _dataclass  # noqa: E402
import uuid as _uuid  # noqa: E402


@_dataclass(frozen=True)
class Denylist:
    """Handle for a persisted blocklist — ONE bucketed table
    ``{name}_fps`` (fingerprint string) of MD5s of normalized text
    (`text.fingerprint`, the exact-dedup tier's key), bucketed on the
    fingerprint so the ingest-gate join is bucket-local."""

    name: str
    n_buckets: int = 32
    location: str | None = None

    @property
    def fps_table(self) -> str:
        return f"{self.name}_fps"

    def _path(self) -> str | None:
        return f"{self.location}/fps" if self.location else None

    def drop(self, spark=None) -> None:
        import shutil

        from pyspark.sql import SparkSession

        spark = spark or SparkSession.getActiveSession()
        if spark is not None:
            spark.sql(f"DROP TABLE IF EXISTS {self.fps_table}")
        if self.location:
            shutil.rmtree(self.location, ignore_errors=True)

    def __enter__(self) -> "Denylist":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        self.drop()


def temp_denylist(n_buckets: int = 4) -> Denylist:
    from openaq_data_pipeline_spark.tmproots import session_tmpdir

    return Denylist(
        name=f"denylist_idx_{_uuid.uuid4().hex}",
        n_buckets=n_buckets,
        location=session_tmpdir("denylist_"),
    )


def _fps_of(docs: DataFrame, text_col: str) -> DataFrame:
    from openaq_data_pipeline_spark.operators.text import fingerprint

    return docs.select(
        fingerprint(F.col(text_col)).alias("fingerprint")
    ).distinct()


def add_to_denylist(
    docs: DataFrame, text_col: str, denylist: Denylist
) -> None:
    """Fingerprint ``docs`` and add them to the blocklist (append,
    or bootstrap when the table doesn't exist). Only the MD5s land —
    never ids or text."""
    from openaq_data_pipeline_spark.sources.tables import save_bucketed

    spark = docs.sparkSession
    mode = (
        "append" if spark.catalog.tableExists(denylist.fps_table) else "overwrite"
    )
    save_bucketed(
        _fps_of(docs, text_col),
        denylist.fps_table,
        "fingerprint",
        denylist.n_buckets,
        mode=mode,
        path=denylist._path(),
    )


def denylist_gate(
    batch: DataFrame, text_col: str, id_col: str, denylist: Denylist
) -> DataFrame:
    """(*batch columns, blocked boolean) — every batch row flagged
    against the blocklist. The ingest pipeline filters
    ``~blocked`` BEFORE the dedup gates (a blocked doc must not
    become a survivor). One fingerprint projection + one LEFT join
    whose index side is bucket-local on the MD5 key — the
    incremental-exact-dedup plan shape, batch-sized cost.

    A never-bootstrapped denylist (no :func:`add_to_denylist` yet)
    blocks nothing rather than erroring, so the gate can be wired
    into an ingest stream before the first takedown ever lands; the
    join key rides a reserved temp column, so a batch that already
    carries a ``fingerprint`` column passes through untouched (review
    findings)."""
    from openaq_data_pipeline_spark.operators.text import fingerprint

    spark = batch.sparkSession
    if not spark.catalog.tableExists(denylist.fps_table):
        return batch.withColumn("blocked", F.lit(False))
    fps = (
        spark.table(denylist.fps_table)
        .select(F.col("fingerprint").alias("__dl_fp"))
        .distinct()
        .withColumn("__dl_blocked", F.lit(True))
    )
    return (
        batch.withColumn("__dl_fp", fingerprint(F.col(text_col)))
        .join(fps, "__dl_fp", "left")
        .withColumn("blocked", F.coalesce(F.col("__dl_blocked"), F.lit(False)))
        .drop("__dl_fp", "__dl_blocked")
    )


def retract_from_span_index(
    docs: DataFrame,
    index,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Retract documents from a span-tier window-count index
    (:class:`~openaq_data_pipeline_spark.operators.spans.SpanIndex`).
    The span index stores per-window DISTINCT-DOC COUNTS, not ids, so
    the generic :func:`retract_documents` walk correctly leaves it
    untouched — an id list alone cannot say which windows a document
    contributed. But the counts are SUM-reaggregatable (that is the
    index's own append contract), so retraction with the documents'
    TEXT in hand — which a takedown has, it is what is being taken
    down — appends one batch of NEGATED window counts: probes
    re-aggregate to exactly the counts of an index that never held
    the documents. One shingle pass over the retracted docs, one
    bucketed append; history is never re-read."""
    from openaq_data_pipeline_spark.operators.spans import _window_counts
    from openaq_data_pipeline_spark.sources.tables import save_bucketed

    neg = _window_counts(docs, index.k, id_col, text_col).select(
        "h", (-F.col("n_docs")).alias("n_docs")
    )
    save_bucketed(
        neg,
        index.windows_table,
        "h",
        index.n_buckets,
        mode="append",
        path=(f"{index.location}/windows" if index.location else None),
    )


def retract_from_snapshots(
    spark: SparkSession, root: str, ids: list, id_col: str
) -> list[int]:
    """Remove rows with ``ids`` from EVERY retained snapshot version
    of a versioned publish root
    (:mod:`~openaq_data_pipeline_spark.sources.snapshots`) — the
    time-travel half of a takedown. Immutable snapshots are the
    feature that makes training runs re-runnable against the exact
    corpus they saw, and exactly that property silently retains
    deleted content: retracting only the CURRENT data leaves every
    pinned historical version serving it. A takedown is not scoped to
    the latest version, so this pass rewrites each committed ``v=N``
    directory that holds a retracted row (staged sibling + rename —
    the lake-retraction swap), preserving version NUMBERS and the
    published pointer: pinned readers keep their version ids, minus
    the retracted rows. Untouched versions keep byte-identical files.
    Returns the version numbers rewritten.

    Reproducibility note, stated honestly: a rewritten snapshot is no
    longer bit-identical to what a past training run consumed — that
    is the point of a takedown, and the returned version list is the
    audit trail of exactly which pinned corpora changed."""
    import os
    import uuid

    from openaq_data_pipeline_spark.sources.snapshots import (
        _vdir,
        list_snapshots,
    )

    if not ids:
        return []
    token = uuid.uuid4().hex[:8]
    rewritten = []
    for snap in list_snapshots(root):
        if not snap["committed"]:
            continue  # orphaned crash leftovers — prune's job
        vdir = _vdir(root, snap["version"])
        df = spark.read.parquet(vdir)
        lit = _lit_ids(ids, df.schema[id_col].dataType)
        hit = F.array_contains(lit, F.col(id_col))
        if not df.where(hit).take(1):
            continue
        staged = f"{vdir}__retract_{token}"
        df.where(F.coalesce(~hit, F.lit(True))).write.mode(
            "error"
        ).parquet(staged)
        old = f"{vdir}__old_{token}"
        os.rename(vdir, old)
        os.rename(staged, vdir)
        import shutil

        shutil.rmtree(old, ignore_errors=True)
        rewritten.append(snap["version"])
    return rewritten
