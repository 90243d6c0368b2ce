"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine — the near-duplicate toolkit for 100 TB
training corpora (BASELINE.json north star).

Scale design:
- **exact**: one hash-aggregate on an MD5 fingerprint. The only
  shuffle is on the 128-bit key — uniform, skew-free.
- **MinHash+LSH**: signatures are k conditional MIN aggregates over
  shingle hashes (map-side partial agg → one shuffle per doc, not per
  shingle); banding turns O(n²) pair search into an equi-join on
  (band_id, band_hash) — only colliding docs meet. This is the
  canonical linear-scan near-dup pipeline used on web-scale corpora
  (cf. the MinHashLSH literature; Spark MLlib has a variant, but the
  pure-SQL formulation below keeps everything in Catalyst and is
  oracle-testable).
- **SimHash**: 16-bit hex-digit majority fingerprint — one aggregate
  per bit over exploded tokens; near-dups collide on the exact
  fingerprint (Hamming-0 buckets; wider Hamming radii = re-join on
  bit-flipped variants).
- **n-gram Jaccard**: exact pairwise verification via a shingle
  equi-join (only docs sharing ≥1 shingle ever pair up), with
  |A∩B| counted per pair and |A∪B| = |A|+|B|−|A∩B|.
- **embedding cosine**: see operators/similarity.py.

All hashes are MD5-derived → identical in Spark, DuckDB, anything.
MinHash mins compare MD5 *hex strings* (fixed length ⇒ string order
= numeric order), avoiding any engine-specific 64-bit hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openaq_data_pipeline_spark.operators.text import fingerprint, normalize, tokens


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id document per exact content fingerprint.
    Equivalent to the reference's W1 latest-per-key dedup with
    'content hash' as the key and 'min id' as the deterministic
    survivor policy."""
    fp = fingerprint(F.col(text_col)).alias("fingerprint")
    ranked = df.select(F.col(id_col), F.col(text_col), fp)
    survivors = ranked.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    return survivors.join(ranked, [id_col, "fingerprint"]).select(
        id_col, "fingerprint", text_col
    )


def shingles(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, distinct: bool = True
) -> DataFrame:
    """(id, shingle) word n-gram shingles per document.
    Built with sequence/transform/slice — pure Catalyst, no UDF.

    ``distinct=True`` (set semantics) is required by Jaccard; MinHash
    callers pass ``distinct=False`` because MIN is multiset-invariant
    — identical signatures, one full shuffle of the exploded shingle
    set saved (the dominant cost at corpus scale).

    The token array is projected into a column *before* the slicing
    lambda references it: Catalyst does not common-subexpression a
    nested expression inside a higher-order-function lambda, so
    inlining ``tokens(normalize(text))`` there re-runs the regex per
    sequence element — O(words²) per document."""
    w = F.col("__w")
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(w, i, n)),
    )
    out = (
        df.select(F.col(id_col), tokens(normalize(F.col(text_col))).alias("__w"))
        .select(F.col(id_col), F.explode(sh).alias("shingle"))
        .where(F.col("shingle") != "")
    )
    return out.distinct() if distinct else out


def minhash_signatures(
    shingle_df: DataFrame, id_col: str, num_hashes: int = 8
) -> DataFrame:
    """(id, minhash_0..minhash_{k-1}): per-document MinHash signature.

    Hash family i is the i-th 32-bit (8-hex-char) slice of
    MD5(f"{i//4}|" + shingle) — ⌈k/4⌉ MD5 digests per shingle instead
    of k (the slices of one digest are uniform and pairwise
    independent enough for the MinHash estimator; standard practice
    for web-scale dedup). Per-doc MIN of each slice →
    P[min_a = min_b] = Jaccard(a,b). One aggregate pass; fixed-width
    hex strings compare identically to their 32-bit values."""
    digests = {
        g: F.md5(F.concat(F.lit(f"{g}|"), F.col("shingle")))
        for g in range((num_hashes + 3) // 4)
    }
    aggs = [
        F.min(F.substring(digests[i // 4], (i % 4) * 8 + 1, 8)).alias(f"minhash_{i}")
        for i in range(num_hashes)
    ]
    return shingle_df.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, num_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """(id_a, id_b) candidate pairs sharing ≥1 LSH band
    (band hash = MD5 of its concatenated minhashes). Only
    hash-colliding documents ever pair up.

    stack() emits all bands in ONE pass over the signature table — a
    per-band union would re-run the whole shingle→minhash pipeline
    once per band (lambda-bearing subplans never canonicalize equal,
    so Catalyst cannot de-duplicate them; measured 4× the Generates
    at sf0.1). Pairs come from posting lists like
    :func:`jaccard_pairs`: one exchange on (band_id, band_hash)
    builds sorted per-bucket id lists and the (i<j) pairs explode
    map-side into the distinct — the self-join formulation moved the
    band table through two exchanges plus a join, and needed a
    checkpoint just to share the build between its sides."""
    n_bands = num_hashes // band_size
    stack_args: list = []
    for b in range(n_bands):
        cols = [f"minhash_{i}" for i in range(b * band_size, (b + 1) * band_size)]
        stack_args += [F.lit(b), F.md5(F.concat_ws("|", *cols))]
    bands = signatures.select(
        F.col(id_col),
        F.stack(F.lit(n_bands), *stack_args).alias("band_id", "band_hash"),
    )
    ids = F.col("__ids")
    pair_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.size(ids) - 2),
            lambda i: F.transform(
                F.sequence(i + 1, F.size(ids) - 1),
                lambda j: F.struct(
                    F.get(ids, i).alias("id_a"), F.get(ids, j).alias("id_b")
                ),
            ),
        )
    )
    return (
        bands.groupBy("band_id", "band_hash")
        .agg(F.array_sort(F.collect_list(F.col(id_col))).alias("__ids"))
        .filter(F.size(ids) >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )


def jaccard_pairs(
    shingle_df: DataFrame,
    id_col: str,
    min_jaccard: float = 0.0,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """(id_a, id_b, n_common, n_a, n_b, jaccard) for every pair of
    documents sharing at least one shingle. Exact n-gram Jaccard:
    the shingle equi-join counts |A∩B|; |A| and |B| come from a
    broadcast per-doc size table; |A∪B| = |A|+|B|−|A∩B|.
    ``jaccard`` is exact-rounded to 4 dp (engine-neutral).

    ``max_doc_freq`` is the stop-shingle guard: shingles appearing in
    more than this many documents are dropped from the shingle
    universe BEFORE pair generation (sizes and intersections both
    exclude them — Jaccard over the non-stop shingle sets, the
    standard treatment of boilerplate n-grams). The inverted-index
    pair scan is O(Σ df²) over shingle document frequencies, so ONE
    boilerplate shingle shared by a million documents alone yields
    5·10¹¹ pairs — at corpus scale an uncapped scan is a job-killer,
    not a slowdown. The guard costs one count-over-shingle window
    (single shuffle, no sort: unordered frame) and is mirrored by the
    SQL oracles."""
    from pyspark.sql import Window

    from openaq_data_pipeline_spark.catalog import exact_ratio_spark

    if max_doc_freq is not None:
        w = Window.partitionBy("shingle")
        shingle_df = (
            shingle_df.withColumn("__df", F.count(F.lit(1)).over(w))
            .filter(F.col("__df") <= max_doc_freq)
            .drop("__df")
        )
    # the shingle table feeds two consumers (sizes + the posting-list
    # aggregate); its lambda-bearing build plan defeats Catalyst's
    # exchange reuse, so materialize it once — the same move a
    # production dedup pipeline makes by checkpointing the inverted
    # index before the pair scan (lazy localCheckpoint: shared
    # blocks, no CacheManager residue in a long-lived session)
    shingle_df = shingle_df.localCheckpoint(eager=False)
    sizes = shingle_df.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    # posting-list pair generation instead of a self-join: ONE
    # exchange of the shingle table builds sorted per-shingle doc
    # lists, and the (i<j) pairs explode map-side straight into the
    # partial pair-count aggregate. The join formulation moves the
    # same table through TWO exchanges plus a join — strictly more
    # shuffle at any scale. Per-shingle work is O(df²), bounded by
    # the max_doc_freq guard above (the same property the join
    # relied on); sorted lists make id_a < id_b by construction.
    ids = F.col("__ids")
    pair_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.size(ids) - 2),
            lambda i: F.transform(
                F.sequence(i + 1, F.size(ids) - 1),
                lambda j: F.struct(
                    F.get(ids, i).alias("id_a"), F.get(ids, j).alias("id_b")
                ),
            ),
        )
    )
    common = (
        shingle_df.groupBy("shingle")
        .agg(F.array_sort(F.collect_list(F.col(id_col))).alias("__ids"))
        .filter(F.size(ids) >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    out = (
        common.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .withColumn(
            "jaccard",
            exact_ratio_spark(
                F.col("n_common"),
                F.col("n_a") + F.col("n_b") - F.col("n_common"),
                out_scale=4,
            ),
        )
    )
    if min_jaccard > 0:
        out = out.filter(F.col("jaccard") >= min_jaccard)
    return out.select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")


def simhash16(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, simhash) 16-bit SimHash fingerprint as a 16-char '0'/'1'
    string. Bit j is the majority vote of hex digit j of each token's
    MD5 (digit ≥ 8 → +1 else −1). Identical in any engine with md5 +
    substring. Near-duplicate documents (mostly-shared token bags)
    agree on most bits; exact-bucket grouping finds Hamming-0 sets."""
    tok = (
        df.select(
            F.col(id_col), F.explode(tokens(normalize(F.col(text_col)))).alias("tok")
        )
        .where(F.col("tok") != "")
        # project the digest once; inlined in 16 agg expressions it
        # would be hashed 16× per token
        .select(F.col(id_col), F.md5(F.col("tok")).alias("__h"))
    )
    h = F.col("__h")
    bit_aggs = [
        F.sum(
            F.when(
                F.substring(h, j + 1, 1).isin(*list("89abcdef")), F.lit(1)
            ).otherwise(F.lit(-1))
        ).alias(f"s{j}")
        for j in range(16)
    ]
    votes = tok.groupBy(id_col).agg(*bit_aggs)
    bits = [F.when(F.col(f"s{j}") >= 0, "1").otherwise("0") for j in range(16)]
    return votes.select(F.col(id_col), F.concat(*bits).alias("simhash"))


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """(node, component_id) for every node appearing in ``pairs``,
    where component_id = the minimum node id reachable through the
    pair graph — the canonical-representative step that turns a
    near-dup PAIR list (MinHash/Jaccard/SimHash/cosine output) into
    duplicate CLUSTERS, so a curation pipeline can keep exactly one
    doc per component.

    Algorithm: iterative min-label propagation — each round every
    node takes the min of its own label and its neighbors' labels.
    Converges in O(graph diameter) rounds; near-dup graphs are
    star/chain shaped with tiny diameters (the alternating
    large-star/small-star contraction from the CC-in-MapReduce
    literature drops in here if ever faced with adversarial
    long-chain topologies — same join shapes, fewer rounds).

    Scale notes: the edge list is symmetrized once and
    localCheckpoint-ed (reused by every round — lambda-free but
    iterative lineage would otherwise grow each round and replan
    from scratch); each round is one shuffle for the neighbor-min
    aggregate and one for the label join, both on the node id. The
    driver loop carries no data — only a converged? flag per round
    (bounded by ``max_iters``, raises if exceeded). The flag is a
    column computed inside the label-update join itself, so
    convergence detection costs a scan of the just-checkpointed
    labels, not a second labels⋈labels shuffle per round.
    """
    spark = pairs.sparkSession
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # size each round's shuffles to the graph, not the session: a
    # few-thousand-edge near-dup graph re-planned at the session's
    # shuffle width pays rounds × partitions near-empty-task
    # scheduling (the dominant cost of small iterative jobs); a
    # billion-edge graph keeps full width. The count is free — edges
    # is already materialized by the eager checkpoint.
    n_edges = edges.count()
    conf_key = "spark.sql.shuffle.partitions"
    prev_parts = spark.conf.get(conf_key)
    round_parts = max(1, min(int(prev_parts), (n_edges + 199_999) // 200_000))
    spark.conf.set(conf_key, str(round_parts))
    try:
        labels = (
            edges.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("comp", F.col("node"))
            .localCheckpoint(eager=True)
        )
        for _ in range(max_iters):
            neigh = (
                edges.join(labels, edges["src"] == labels["node"])
                .groupBy(F.col("dst").alias("node2"))
                .agg(F.min("comp").alias("ncomp"))
            )
            new_labels = (
                labels.join(neigh, labels["node"] == neigh["node2"], "left")
                .select(
                    "node",
                    F.least(
                        F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))
                    ).alias("comp"),
                    (
                        F.coalesce(F.col("ncomp"), F.col("comp")) < F.col("comp")
                    ).alias("__changed"),
                )
                .localCheckpoint(eager=True)
            )
            changed = new_labels.filter(F.col("__changed")).limit(1).count()
            labels = new_labels.drop("__changed")
            if changed == 0:
                return labels.select("node", F.col("comp").alias("component_id"))
    finally:
        spark.conf.set(conf_key, prev_parts)
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds — "
        "pathological chain topology; switch to large-star/small-star"
    )


def keep_one_per_cluster(
    corpus_ids: DataFrame, components: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id, cluster_size) for the documents that SURVIVE dedup — the
    final materialization of the pair → cluster → keep-one pipeline
    (the table a curation run actually trains on). Survivors are the
    per-component minimum id (== component_id by construction in
    :func:`connected_components`) plus every unclustered singleton
    (cluster_size 1).

    Scale shape: one anti-join dropping non-representative members
    and one left join attaching cluster sizes, both equi-joins on the
    id — component counts at corpus scale are far past broadcast
    range, so both sides stay shuffled hash joins under AQE."""
    dropped = components.filter(F.col("node") != F.col("component_id")).select(
        F.col("node").alias(id_col)
    )
    sizes = (
        components.groupBy("component_id")
        .agg(F.count(F.lit(1)).cast("long").alias("cluster_size"))
        .withColumnRenamed("component_id", id_col)
    )
    return (
        corpus_ids.select(id_col)
        .join(dropped, id_col, "left_anti")
        .join(sizes, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("cluster_size"), F.lit(1))
            .cast("long")
            .alias("cluster_size"),
        )
    )
