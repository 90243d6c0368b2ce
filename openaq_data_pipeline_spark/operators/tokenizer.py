"""Distributed tokenizer training: byte-pair-encoding merge learning
over a document corpus — the vocabulary-construction step an LLM data
pipeline runs after curation (cf. the public BPE formulation of
Sennrich et al. 2016 and its use in GPT-2/LLaMA tokenizers).

Each merge round is one distributed aggregation: per-word character
sequences (weighted by corpus word frequency) explode into adjacent
symbol pairs, the globally most frequent pair wins (ties broken by
pair text), and every occurrence merges simultaneously. The learned
merge table IS the tokenizer.

Scale design (100 TB): the working set after round 0 is the DISTINCT
word vocabulary with frequencies — corpus-size-independent (vocab
grows ~log with corpus), so per-round cost is a vocab-sized explode +
a pair-count hash aggregate with map-side partials, then a 1-row
TakeOrdered collect (the same bounded per-round driver action as
connected_components' convergence check). Rounds are sequential by
nature (each merge changes the pair distribution); lineage is
truncated with an eager localCheckpoint per round so round k never
replans rounds 1..k−1.

Determinism contract: merges restricted to left ≠ right pairs makes
simultaneous merging unambiguous (two marked positions can never
overlap, since overlap would force left = right), so the same greedy
result is expressible as pure per-position array logic in any engine
— no sequential fold, no lookbehind regex (RE2-incompatible), no
engine-specific tie behavior. Self-pairs ('l l') are a documented
exclusion, not an oversight.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.operators.text import normalize, tokens

MERGE_SCHEMA = "merge_round long, lhs string, rhs string, merged string, pair_count long"


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n, seq): corpus word frequencies with the word's initial
    character-symbol sequence — BPE's round-0 state."""
    return (
        df.select(F.explode(tokens(normalize(F.col(text_col)))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("seq", F.split(F.col("word"), ""))
    )


def _apply_merge(seq: F.Column, lhs: str, rhs: str) -> F.Column:
    """Merge every (lhs, rhs) adjacency in one pass. Position i emits
    the merged symbol if (i, i+1) matches, nothing if (i−1, i)
    matched (it was consumed), else its own symbol; lhs ≠ rhs
    guarantees marks are never adjacent, so this per-position rule
    IS the simultaneous merge."""
    m = F.size(seq)

    def emit(i):
        # F.get (0-based) is NULL past either array end even under
        # ANSI mode — element_at THROWS there, and position m-1's
        # lookahead reads index m (caught by the BPE property test)
        here = (F.get(seq, i) == lhs) & (F.get(seq, i + 1) == rhs)
        prev = (i > 0) & (F.get(seq, i - 1) == lhs) & (F.get(seq, i) == rhs)
        return (
            F.when(here, F.lit(lhs + rhs))
            .when(prev, F.lit(None))
            .otherwise(F.get(seq, i))
        )

    return F.filter(
        F.transform(F.sequence(F.lit(0), m - 1), emit), lambda x: x.isNotNull()
    )


def bpe_train_merges(
    df: DataFrame, text_col: str, id_col: str, n_merges: int = 6
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges over the corpus.
    Returns (merge_round, lhs, rhs, merged, pair_count) — one row per
    learned merge, ``pair_count`` being the weighted adjacency count
    that won the round. Stops early if no left≠right pair remains."""
    spark = df.sparkSession
    vocab = word_frequencies(df, text_col).localCheckpoint(eager=True)
    s = F.col("seq")
    rows: list[tuple] = []
    for r in range(1, n_merges + 1):
        pair_struct = F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(s) - 2),
                lambda i: F.struct(
                    F.element_at(s, i + 1).alias("lhs"),
                    F.element_at(s, i + 2).alias("rhs"),
                ),
            )
        ).alias("p")
        top = (
            vocab.where(F.size(s) >= 2)
            .select("n", pair_struct)
            .where(F.col("p.lhs") != F.col("p.rhs"))
            .groupBy("p.lhs", "p.rhs")
            .agg(F.sum("n").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not top:
            break
        lhs, rhs, cnt = top[0]["lhs"], top[0]["rhs"], top[0]["pair_count"]
        rows.append((r, lhs, rhs, lhs + rhs, cnt))
        vocab = vocab.withColumn("seq", _apply_merge(s, lhs, rhs)).localCheckpoint(
            eager=True
        )
    return spark.createDataFrame(rows, MERGE_SCHEMA)
