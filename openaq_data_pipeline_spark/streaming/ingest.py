"""Continuous corpus ingestion with a cross-batch dedup gate: every
micro-batch of arriving documents passes the persisted exact-dedup
index BEFORE landing in the curated corpus — the streaming face of
the incremental-index tier (operators/incremental_dedup.py).

This is how a production crawl feed actually runs: documents arrive
continuously, and each micro-batch must dedup against ALL history —
including documents that arrived two micro-batches ago — without
ever re-reading that history. ``foreachBatch`` is the right Spark
construct: the batch-side operator (``incremental_exact_dedup``) is
reused verbatim, so streaming and batch ingestion share one
correctness surface, one index layout, and one plan shape (bucket-
local probe, batch-sized cost; see SCALE.md).

Delivery semantics, stated honestly: ``foreachBatch`` is
at-least-once on failure/retry. Both sinks tolerate a replay —
 - the index append re-inserts (fingerprint, survivor_id) rows the
   probe already re-aggregates with ``min`` (same id wins again:
   within one batch the survivor choice is a pure function of the
   batch + the pre-batch index), and compaction squashes the extra
   file sets;
 - the survivors sink writes under ``batch_id=<n>`` partitions, so a
   replayed micro-batch overwrites its own partition instead of
   duplicating rows (dynamic partition overwrite).
Reference analogue: dags/openaq_ingestion_dag.py's scheduled
batch-append loop, upgraded to event-driven micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from openaq_data_pipeline_spark.operators.incremental_dedup import (
    ExactIndex,
    incremental_exact_dedup,
)


def dedup_gate(
    text_col: str,
    id_col: str,
    index: ExactIndex,
    survivors_path: str,
):
    """The ``foreachBatch`` body: disposition the micro-batch against
    the index (appending new survivors to it), then land the KEPT
    documents — full rows, not just ids — under a per-batch partition
    of the survivors sink."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        disp = incremental_exact_dedup(batch_df, text_col, id_col, index)
        kept = batch_df.join(
            disp.filter("kept").select(id_col), id_col, "inner"
        )
        (
            kept.selectExpr("*", f"{batch_id} as batch_id")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(survivors_path)
        )

    return _process


def stream_corpus_ingest(
    stream_df: DataFrame,
    text_col: str,
    id_col: str,
    index: ExactIndex,
    survivors_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start the gated ingestion stream and return the query handle.
    ``available_now=True`` drains the backlog then stops (the test /
    backfill mode); ``False`` runs continuously. The caller manages
    the index's lifecycle (context-manage ``temp_exact_index`` or
    own a named one)."""
    writer = (
        stream_df.writeStream.foreachBatch(
            dedup_gate(text_col, id_col, index, survivors_path)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
