"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, plus a Pandas-UDF feature-extraction stage.

The sandbox has no image/audio codecs, so the *decode* step is a
clearly-marked stub (``decode_media`` raises ``NotImplementedError``
unless a codec hook is injected), while everything Spark-side is real
and tested: the schema, the deterministic binary synthesis, the
``mapInPandas`` batch shape (iterator of pandas DataFrames, Arrow
transfer), and integer byte-level features that a real extractor would
replace.

Scale design: assets flow as (asset_id, media_type, content binary,
width, height); feature extraction is a narrow ``mapInPandas`` pass —
no shuffle, executor-local batches sized by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — exactly the shape a
real decoder (PIL/ffmpeg behind the hook) would run in, one python
worker per core, model/codec loaded once per worker.

The features are pure integer byte statistics (sum, 4-bin histogram),
so the DuckDB oracle can re-derive them from hex expansion —
the Pandas-UDF path gets a genuinely independent cross-engine check.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from transner_spark.functions.hashing import h60

MEDIA_TYPES = ("image", "audio", "video")

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sum_bytes", LongType()),
        StructField("h0", LongType()),  # bytes in [0, 64)
        StructField("h1", LongType()),  # [64, 128)
        StructField("h2", LongType()),  # [128, 192)
        StructField("h3", LongType()),  # [192, 256)
    ]
)


def synthesize_assets(docs: DataFrame) -> DataFrame:
    """Deterministic asset table from the documents table: the payload is
    the doc's md5 hex repeated 1 + (doc_id % 4) times, unhexed → 16-64
    opaque bytes; width/height derive from the content hash. At real
    scale this column is the raw image/audio blob read from object
    storage — everything downstream only assumes 'binary + metadata'."""
    reps = (F.col("doc_id") % 4 + 1).cast("int")
    hex_payload = F.repeat(F.md5("text"), reps)
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(*[F.lit(m) for m in MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.unhex(hex_payload).alias("content"),
        (F.pmod(h60(F.col("text")), F.lit(240)) + 16).cast("int").alias("width"),
        (F.pmod(h60(F.concat(F.lit("h:"), F.col("text"))), F.lit(240)) + 16)
        .cast("int")
        .alias("height"),
    )


def asset_metadata(docs: DataFrame) -> DataFrame:
    """Typed-metadata projection — the query a catalog/pruning layer
    runs without ever touching the payload bytes."""
    assets = synthesize_assets(docs)
    return assets.select(
        "asset_id",
        "media_type",
        F.octet_length("content").cast("long").alias("n_bytes"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
    )


def decode_media(media_type: str, content: bytes):
    """Default decode hook: STUB. No codecs ship in this container —
    pass a real ``(media_type, content) -> bytes`` callable to
    ``extract_features(..., decoder=...)`` in production (it is applied
    inside the mapInPandas batch loop, once per payload)."""
    raise NotImplementedError(
        "media decoding requires a codec (PIL/soundfile/ffmpeg); "
        "inject a decoder callable to enable it"
    )


def _byte_features(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for decode + feature extraction: integer
    byte statistics via numpy over the Arrow-delivered binary column."""
    import numpy as np

    out = {k: [] for k in ("asset_id", "n_bytes", "sum_bytes", "h0", "h1", "h2", "h3")}
    for asset_id, content in zip(batch["asset_id"], batch["content"]):
        b = np.frombuffer(bytes(content), dtype=np.uint8)
        hist = np.bincount(b >> 6, minlength=4)
        out["asset_id"].append(int(asset_id))
        out["n_bytes"].append(int(b.size))
        out["sum_bytes"].append(int(b.sum()))
        for i in range(4):
            out[f"h{i}"].append(int(hist[i]))
    return pd.DataFrame(out)


def extract_features(
    assets: DataFrame,
    decoder: Callable | None = None,
) -> DataFrame:
    """mapInPandas feature extraction over the binary column. A
    ``decoder`` callable ``(media_type: str, content: bytes) -> bytes``
    runs first on every payload (the real PIL/ffmpeg decode hook —
    e.g. raw pixels / PCM samples); features are then the byte
    statistics of the decoded output. Without one, the identity path
    keeps the full Spark plumbing (schema, Arrow batching,
    partitioning) live over the raw bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if decoder is not None:
                batch = batch.assign(
                    content=[
                        decoder(mt, bytes(c))
                        for mt, c in zip(batch["media_type"], batch["content"])
                    ]
                )
            yield _byte_features(batch)

    return assets.select("asset_id", "media_type", "content").mapInPandas(
        run, FEATURE_SCHEMA
    )


def media_features(docs: DataFrame) -> DataFrame:
    return extract_features(synthesize_assets(docs))


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_off", LongType()),
        StructField("frame_len", LongType()),
        StructField("frame_sum", LongType()),
    ]
)

FRAME_BYTES = 16  # synthetic "frame" = 16-byte window
FRAME_STRIDE = 2  # sample every 2nd frame


def frame_sample(assets: DataFrame) -> DataFrame:
    """Frame sampling for video assets: every FRAME_STRIDE-th fixed-width
    byte window of the payload becomes one output row (the stand-in for
    ffmpeg keyframe extraction — the real decoder slots into the same
    mapInPandas shape). Row explosion happens executor-side inside the
    UDF, so a 1-row-in → many-rows-out asset never materializes on the
    driver; partitioning is inherited from the scan."""
    videos = assets.where(F.col("media_type") == "video").select(
        "asset_id", "content"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for batch in batches:
            out = {k: [] for k in
                   ("asset_id", "frame_idx", "frame_off", "frame_len", "frame_sum")}
            for asset_id, content in zip(batch["asset_id"], batch["content"]):
                b = np.frombuffer(bytes(content), dtype=np.uint8)
                n_frames = len(b) // FRAME_BYTES
                for fi in range(0, n_frames, FRAME_STRIDE):
                    off = fi * FRAME_BYTES
                    w = b[off : off + FRAME_BYTES]
                    out["asset_id"].append(int(asset_id))
                    out["frame_idx"].append(fi)
                    out["frame_off"].append(off)
                    out["frame_len"].append(int(w.size))
                    out["frame_sum"].append(int(w.sum()))
            yield pd.DataFrame(out)

    return videos.mapInPandas(run, FRAME_SCHEMA)


def video_frames(docs: DataFrame) -> DataFrame:
    return frame_sample(synthesize_assets(docs))
