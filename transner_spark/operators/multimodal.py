"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, plus a Pandas-UDF feature-extraction stage.

The sandbox ships no codec libraries, so the defaults here are REAL
dependency-free decoders for two real formats (pure stdlib byte
parsing): ``decode_wav`` walks RIFF/WAVE chunks to the raw PCM samples
and ``decode_ppm`` parses binary-netpbm P6 headers to the raw pixels
(``video`` payloads are a concatenated P6 frame stream — the motion-PPM
idiom ``ppmtoy4m``/mjpegtools consume). ``decode_media`` dispatches on
media_type; heavier codecs (JPEG/ffmpeg) still slot in through the same
injectable ``decoder=`` hook on :func:`extract_features`. Everything
Spark-side is real and tested either way: the schema, the deterministic
binary synthesis, the ``mapInPandas`` batch shape (iterator of pandas
DataFrames, Arrow transfer), and integer byte-level features computed
over the DECODED output.

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
    BinaryType,
    LongType,
    StringType,
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


# ---- real codecs: RIFF/WAVE PCM and binary netpbm (P6), pure stdlib ----

WAV_SAMPLE_RATE = 8000


def _le(v: int, n: int) -> bytes:
    return int(v).to_bytes(n, "little")


def encode_wav(samples: bytes, sample_rate: int = WAV_SAMPLE_RATE) -> bytes:
    """Minimal but REAL RIFF/WAVE writer: 8-bit unsigned mono PCM.
    Odd-length data chunks get the spec's even-padding byte (the chunk
    SIZE field stays the true payload length — readers must honor the
    size field, not the byte remainder)."""
    n = len(samples)
    pad = b"\x00" if n % 2 else b""
    fmt = (
        _le(1, 2)            # audio format: PCM
        + _le(1, 2)          # channels: mono
        + _le(sample_rate, 4)
        + _le(sample_rate, 4)  # byte rate = rate * block_align(1)
        + _le(1, 2)          # block align
        + _le(8, 2)          # bits per sample
    )
    body = (
        b"WAVE"
        + b"fmt " + _le(len(fmt), 4) + fmt
        + b"data" + _le(n, 4) + samples + pad
    )
    return b"RIFF" + _le(len(body), 4) + body


def decode_wav(content: bytes) -> bytes:
    """REAL RIFF/WAVE parser → raw PCM sample bytes: validates magic,
    walks chunks honoring each chunk's size field plus the RIFF
    even-padding rule (so unknown chunks — LIST/INFO metadata — are
    skipped, not tripped over), and requires PCM / mono / 8-bit."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    if int.from_bytes(content[4:8], "little") + 8 != len(content):
        raise ValueError("RIFF size field does not match payload length")
    off, fmt, data = 12, None, None
    while off < len(content):
        if off + 8 > len(content):
            raise ValueError("truncated chunk header")
        cid = content[off : off + 4]
        sz = int.from_bytes(content[off + 4 : off + 8], "little")
        payload = content[off + 8 : off + 8 + sz]
        if len(payload) != sz:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            fmt = payload
        elif cid == b"data":
            data = payload
        off += 8 + sz + (sz % 2)  # chunks are even-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt /data chunk")
    if len(fmt) < 16:
        raise ValueError("short fmt chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if (audio_format, channels, bits) != (1, 1, 8):
        raise ValueError(
            f"unsupported WAV encoding (format={audio_format}, "
            f"channels={channels}, bits={bits}); need PCM mono 8-bit"
        )
    return data


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """REAL binary-netpbm P6 writer (RGB, maxval 255)."""
    if len(pixels) != 3 * width * height:
        raise ValueError(
            f"P6 {width}x{height} needs {3 * width * height} pixel bytes, "
            f"got {len(pixels)}"
        )
    return f"P6\n{width} {height}\n255\n".encode("ascii") + pixels


_PPM_WS = (b" ", b"\t", b"\r", b"\n")  # tuple: b"" (EOF) must NOT match


def _ppm_header(content: bytes, off: int) -> tuple[int, int, int]:
    """Parse one P6 header starting at ``off`` → (width, height,
    pixel_offset). Honors the netpbm spec's arbitrary whitespace and
    ``#``-comment lines between header tokens, and the exactly-one
    whitespace byte after maxval."""

    def token(o: int) -> tuple[bytes, int]:
        while o < len(content):
            c = content[o : o + 1]
            if c in _PPM_WS:
                o += 1
            elif c == b"#":
                while o < len(content) and content[o : o + 1] != b"\n":
                    o += 1
            else:
                break
        start = o
        while o < len(content) and content[o : o + 1] not in _PPM_WS:
            o += 1
        if start == o:
            raise ValueError("truncated PPM header")
        return content[start:o], o

    magic, o = token(off)
    if magic != b"P6":
        raise ValueError(f"not a binary PPM (P6), magic={magic!r}")
    w_raw, o = token(o)
    h_raw, o = token(o)
    maxv_raw, o = token(o)
    try:
        w, h, maxv = int(w_raw), int(h_raw), int(maxv_raw)
    except ValueError:
        raise ValueError("non-numeric PPM header field") from None
    if w < 1 or h < 1:
        raise ValueError(f"bad PPM dimensions {w}x{h}")
    if maxv != 255:
        raise ValueError(f"unsupported PPM maxval {maxv}; need 255")
    # the spec demands EXACTLY one whitespace byte after maxval — verify
    # it rather than blindly skipping: a header that ENDS at maxval
    # (token reader leaves o at EOF; any non-ws byte would have been
    # absorbed into the maxval token and failed as non-numeric) now
    # fails with a header diagnosis instead of a confusing
    # raster-truncation error downstream
    if content[o : o + 1] not in _PPM_WS:
        raise ValueError(
            "PPM maxval must be followed by one whitespace byte, got "
            f"{content[o:o + 1]!r}"
        )
    return w, h, o + 1


def decode_ppm(content: bytes) -> bytes:
    """REAL P6 parser → raw RGB pixel bytes; fails loud on truncated
    pixel data or trailing garbage."""
    w, h, o = _ppm_header(content, 0)
    n = 3 * w * h
    pixels = content[o : o + n]
    if len(pixels) != n:
        raise ValueError(f"truncated PPM pixels: need {n}, got {len(pixels)}")
    if o + n != len(content):
        raise ValueError("trailing bytes after PPM pixel data")
    return pixels


def decode_ppm_stream(content: bytes) -> list[bytes]:
    """Concatenated-P6 video stream → one pixel buffer per frame (frame
    boundaries come from each frame's OWN parsed header, never from a
    fixed stride)."""
    frames, off = [], 0
    while off < len(content):
        w, h, o = _ppm_header(content, off)
        n = 3 * w * h
        pixels = content[o : o + n]
        if len(pixels) != n:
            raise ValueError(
                f"truncated PPM frame {len(frames)}: need {n}, got {len(pixels)}"
            )
        frames.append(pixels)
        off = o + n
    if not frames:
        raise ValueError("empty PPM stream")
    return frames


def decode_media(media_type: str, content: bytes) -> bytes:
    """Default decode hook — REAL stdlib decoders per media type:
    ``audio`` → WAV PCM samples, ``image`` → PPM pixels, ``video`` →
    concatenated per-frame PPM pixels. Formats beyond these (JPEG, MP3,
    MP4) still need an injected codec callable on
    ``extract_features(..., decoder=...)`` (applied inside the
    mapInPandas batch loop, once per payload)."""
    if media_type == "audio":
        return decode_wav(bytes(content))
    if media_type == "image":
        return decode_ppm(bytes(content))
    if media_type == "video":
        return b"".join(decode_ppm_stream(bytes(content)))
    raise ValueError(f"unknown media_type {media_type!r}")


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


# ---- real-format fixture assets + decoded-feature extraction ----
#
# Sample/pixel values are CLOSED-FORM in doc_id (affine mod 256), so the
# DuckDB oracle re-derives the decoded features analytically without any
# codec — while the Spark path round-trips through the real writers and
# the real parsers above. A header-walk or padding bug shows up as a
# value mismatch, not a silent pass.

WAV_N0, WAV_NMOD = 16, 49        # n_samples  = 16 + doc_id % 49
IMG_W0, IMG_WMOD = 4, 13         # width      =  4 + doc_id % 13
IMG_H0, IMG_HMOD = 3, 7          # height     =  3 + doc_id % 7
VID_F0, VID_FMOD = 2, 5          # n_frames   =  2 + doc_id % 5
VID_W, VID_H = 4, 3              # fixed per-frame dims (36 pixel bytes)

REAL_ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
    ]
)


def _real_payload(d: int) -> tuple[str, bytes]:
    """(media_type, encoded bytes) for one doc_id — the synthesis spec
    the oracle mirrors. doc_id % 3: 0 → image, 1 → audio, 2 → video
    (same mapping as synthesize_assets)."""
    mt = MEDIA_TYPES[d % 3]
    if mt == "audio":
        n = WAV_N0 + d % WAV_NMOD
        return mt, encode_wav(bytes((d * 31 + i * 7) % 256 for i in range(n)))
    if mt == "image":
        w, h = IMG_W0 + d % IMG_WMOD, IMG_H0 + d % IMG_HMOD
        return mt, encode_ppm(
            w, h, bytes((d * 17 + j * 5) % 256 for j in range(3 * w * h))
        )
    nf = VID_F0 + d % VID_FMOD
    return mt, b"".join(
        encode_ppm(
            VID_W,
            VID_H,
            bytes((d * 13 + f * 11 + j * 3) % 256 for j in range(3 * VID_W * VID_H)),
        )
        for f in range(nf)
    )


def synthesize_real_assets(docs: DataFrame) -> DataFrame:
    """Deterministic asset table whose payloads are REAL encoded files
    (WAV PCM / PPM / PPM-stream) built by the writers above — a
    mapInPandas fixture generator (test/bench only; at real scale this
    column is blobs read from object storage). Scan stays pruned to the
    one column the synthesis needs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, types, blobs = [], [], []
            for doc_id in batch["doc_id"]:
                d = int(doc_id)
                mt, content = _real_payload(d)
                ids.append(d)
                types.append(mt)
                blobs.append(content)
            yield pd.DataFrame(
                {"asset_id": ids, "media_type": types, "content": blobs}
            )

    return docs.select("doc_id").mapInPandas(run, REAL_ASSET_SCHEMA)


DECODE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("part", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sum_bytes", LongType()),
        StructField("h0", LongType()),
        StructField("h1", LongType()),
        StructField("h2", LongType()),
        StructField("h3", LongType()),
    ]
)


def _stats_row(out: dict, asset_id: int, mt: str, part: str, b) -> None:
    import numpy as np

    arr = np.frombuffer(b, dtype=np.uint8)
    hist = np.bincount(arr >> 6, minlength=4)
    out["asset_id"].append(asset_id)
    out["media_type"].append(mt)
    out["part"].append(part)
    out["n_bytes"].append(int(arr.size))
    out["sum_bytes"].append(int(arr.sum()))
    for i in range(4):
        out[f"h{i}"].append(int(hist[i]))


def decode_features(assets: DataFrame) -> DataFrame:
    """(asset_id, media_type, part, n_bytes, sum_bytes, h0..h3): byte
    statistics of the REAL-DECODED payload — one ``part='full'`` row per
    asset over the whole decoded output (PCM samples / pixels), plus one
    ``part='frame:<f>'`` row per decoded video frame (frame boundaries
    parsed from each frame's own P6 header — real keyframe sampling
    shape, not a fixed stride). Narrow mapInPandas, no shuffle; row
    explosion (1 video → 1 + n_frames rows) happens executor-side."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "asset_id", "media_type", "part",
            "n_bytes", "sum_bytes", "h0", "h1", "h2", "h3",
        )
        for batch in batches:
            out: dict = {k: [] for k in cols}
            for asset_id, mt, content in zip(
                batch["asset_id"], batch["media_type"], batch["content"]
            ):
                aid, raw = int(asset_id), bytes(content)
                if mt == "video":
                    # one parse serves both row kinds (decode_media on a
                    # video would re-walk the identical frame headers)
                    frames = decode_ppm_stream(raw)
                    _stats_row(out, aid, mt, "full", b"".join(frames))
                    for f, frame in enumerate(frames):
                        _stats_row(out, aid, mt, f"frame:{f}", frame)
                else:
                    _stats_row(out, aid, mt, "full", decode_media(mt, raw))
            yield pd.DataFrame(out)

    return assets.select("asset_id", "media_type", "content").mapInPandas(
        run, DECODE_SCHEMA
    )


def media_decoded_features(docs: DataFrame) -> DataFrame:
    return decode_features(synthesize_real_assets(docs))
