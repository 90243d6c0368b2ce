"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched Pandas UDFs over ``mapInPandas``.

The heavy decode libraries (PIL/ffmpeg/torchaudio) are NOT in this
container, so the codec step is stubbed: ``decode=\"fake\"`` runs a
deterministic pure-numpy stand-in (so the Spark-side plumbing —
schema, partitioning, UDF signature, Arrow batch shape — is real and
tested end-to-end), while ``decode=\"real\"`` raises
NotImplementedError at the exact point a production deploy would
plug in the library. This mirrors how a 100 TB media pipeline runs:
binary stays columnar in parquet, decode fans out per Arrow batch on
executors, features come back as fixed-width columns.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType()),
        T.StructField("mime_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

_FEATURE_DDL = (
    "media_id long, n_bytes long, header_hex string, "
    "mean_byte double, feature array<float>"
)


def _fake_decode(content: bytes, out_dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real decoder: a byte-histogram
    projection. Pure numpy, stable across platforms."""
    arr = np.frombuffer(content, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(out_dim, dtype=np.float32)
    hist = np.bincount(arr % out_dim, minlength=out_dim).astype(np.float32)
    return (hist / arr.size).astype(np.float32)


def extract_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    decode: str = "fake",
    out_dim: int = 8,
) -> DataFrame:
    """Binary column → fixed-width feature columns via mapInPandas.

    Arrow moves each partition's batches into pandas; the decode loop
    is per-row within a batch (codecs are row-level), but feature
    math is vectorized. Output is a stable narrow schema regardless
    of media type.
    """
    if decode == "real":
        raise NotImplementedError(
            "real media decoding requires codec libraries not present in "
            "this environment; plug PIL/av here and delete this guard"
        )
    if decode != "fake":
        raise ValueError(f"unknown decode mode {decode!r}")

    def _mean_byte(c: bytes) -> float | None:
        # exact half-away-from-zero rounding at 4 dp via integer math
        # (engine-neutral; see catalog.exact_ratio_spark)
        if not c:
            return None
        s = int(np.frombuffer(c, dtype=np.uint8).sum(dtype=np.int64))
        n = len(c)
        return ((s * 20000 + n) // (2 * n)) / 10000.0

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = pdf[content_col]
            feats = [
                _fake_decode(c if isinstance(c, bytes) else bytes(c or b""), out_dim)
                for c in contents
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "n_bytes": contents.map(lambda c: len(c or b"")).astype("int64"),
                    "header_hex": contents.map(
                        lambda c: (c or b"")[:4].hex()
                    ),
                    "mean_byte": contents.map(_mean_byte),
                    "feature": feats,
                }
            )

    return df.select(id_col, content_col).mapInPandas(run, schema=_FEATURE_DDL)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize: plumbing only (schema + passthrough); the pixel
    op needs a codec (NotImplementedError in 'real' mode)."""
    return df.withColumn("target_width", F.lit(width)).withColumn(
        "target_height", F.lit(height)
    )


def frame_sample_plan(df: DataFrame, every_ms: int) -> DataFrame:
    """Video frame-sampling plan: for each media row, the list of
    timestamps to decode (builtin sequence — the expensive decode
    itself happens in extract_features per sampled frame)."""
    return df.withColumn(
        "sample_ts_ms",
        F.when(
            F.col("duration_ms").isNotNull(),
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms)),
        ),
    )
