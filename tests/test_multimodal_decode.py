"""Real stdlib media codecs (operators/multimodal.py): RIFF/WAVE PCM
chunk-walking and binary-netpbm P6 parsing — round trips, spec quirks
(odd-chunk padding, unknown chunks, header comments), loud failures on
malformed payloads, and the decoded-features Spark operator against a
pure-python twin."""

from __future__ import annotations

import pytest

from transner_spark.operators.multimodal import (
    _real_payload,
    decode_media,
    decode_ppm,
    decode_ppm_stream,
    decode_wav,
    encode_ppm,
    encode_wav,
    media_decoded_features,
)


# ---- WAV ----

def test_wav_round_trip_even_and_odd_lengths():
    for n in (0, 1, 2, 15, 16, 255):
        samples = bytes((i * 37 + 5) % 256 for i in range(n))
        enc = encode_wav(samples)
        assert enc[:4] == b"RIFF" and enc[8:12] == b"WAVE"
        assert len(enc) % 2 == 0  # even-padded container
        assert decode_wav(enc) == samples


def test_wav_data_size_field_not_remainder():
    # odd payload: the pad byte must NOT leak into the decoded samples
    samples = bytes(range(17))
    enc = encode_wav(samples)
    assert int.from_bytes(enc[-2 - 17 : -2 - 13], "little") != 0  # samples
    assert decode_wav(enc) == samples
    assert len(decode_wav(enc)) == 17


def test_wav_skips_unknown_chunks():
    # splice a LIST metadata chunk (odd size → padded) between fmt and
    # data; a chunk-walking parser skips it, a fixed-offset one breaks
    samples = bytes(range(10))
    enc = encode_wav(samples)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    spliced = enc[:fmt_end] + extra + enc[fmt_end:]
    spliced = (
        spliced[:4]
        + (len(spliced) - 8).to_bytes(4, "little")
        + spliced[8:]
    )
    assert decode_wav(spliced) == samples


@pytest.mark.parametrize(
    "mangle, msg",
    [
        (lambda b: b"JUNK" + b[4:], "RIFF"),
        (lambda b: b[:8] + b"NOPE" + b[12:], "RIFF"),
        (lambda b: b[:-4], "size field"),
        (
            lambda b: b[:4]
            + (len(b) - 12).to_bytes(4, "little")
            + b[8:30]
            + b[34:],  # rip 4 bytes out of fmt → misaligned chunk walk
            "chunk",
        ),
    ],
)
def test_wav_malformed_fails_loud(mangle, msg):
    enc = encode_wav(bytes(range(20)))
    with pytest.raises(ValueError, match=msg):
        decode_wav(mangle(enc))


def test_wav_rejects_non_8bit_pcm():
    enc = bytearray(encode_wav(bytes(range(10))))
    # bits-per-sample lives at the last 2 bytes of the 16-byte fmt chunk
    off = 12 + 8 + 14
    enc[off:off + 2] = (16).to_bytes(2, "little")
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav(bytes(enc))


# ---- PPM ----

def test_ppm_round_trip():
    px = bytes((j * 11 + 3) % 256 for j in range(3 * 5 * 4))
    assert decode_ppm(encode_ppm(5, 4, px)) == px


def test_ppm_header_comments_and_whitespace():
    px = bytes(range(3 * 2 * 2))
    raw = b"P6 # binary rgb\n# another comment\n 2\t2 \n255\n" + px
    assert decode_ppm(raw) == px


@pytest.mark.parametrize(
    "raw, msg",
    [
        (b"P3\n2 2\n255\n" + bytes(12), "not a binary PPM"),
        (b"P6\n2 2\n65535\n" + bytes(24), "maxval"),
        (b"P6\n2 2\n255\n" + bytes(11), "truncated PPM pixels"),
        (b"P6\n2 2\n255\n" + bytes(13), "trailing bytes"),
        (b"P6\n2 x\n255\n" + bytes(12), "non-numeric"),
        (b"P6\n2 2", "truncated PPM header"),
        (b"P6\n0 2\n255\n", "bad PPM dimensions"),
        # maxval must be followed by exactly ONE whitespace byte — a
        # header truncated right after maxval must be a HEADER
        # diagnosis, not a confusing raster-truncation error (a non-ws
        # byte there is absorbed into the maxval token and fails as
        # non-numeric instead, also a header diagnosis)
        (b"P6\n2 2\n255", "followed by one whitespace"),
    ],
)
def test_ppm_malformed_fails_loud(raw, msg):
    with pytest.raises(ValueError, match=msg):
        decode_ppm(raw)


def test_ppm_stream_frame_boundaries_from_headers():
    # frames with DIFFERENT dims: boundaries must come from each parsed
    # header, not a fixed stride
    f0 = bytes(range(3 * 2 * 1))
    f1 = bytes((j + 100) % 256 for j in range(3 * 3 * 2))
    stream = encode_ppm(2, 1, f0) + encode_ppm(3, 2, f1)
    assert decode_ppm_stream(stream) == [f0, f1]
    with pytest.raises(ValueError, match="empty PPM stream"):
        decode_ppm_stream(b"")
    with pytest.raises(ValueError, match="truncated PPM frame"):
        decode_ppm_stream(stream[:-1])


# ---- dispatch + synthesis spec ----

def test_decode_media_dispatch():
    for d in (0, 1, 2, 7, 30, 59):
        mt, content = _real_payload(d)
        decoded = decode_media(mt, content)
        if mt == "audio":
            n = 16 + d % 49
            assert decoded == bytes((d * 31 + i * 7) % 256 for i in range(n))
        elif mt == "image":
            w, h = 4 + d % 13, 3 + d % 7
            assert decoded == bytes(
                (d * 17 + j * 5) % 256 for j in range(3 * w * h)
            )
        else:
            nf = 2 + d % 5
            assert decoded == b"".join(
                bytes((d * 13 + f * 11 + j * 3) % 256 for j in range(36))
                for f in range(nf)
            )
    with pytest.raises(ValueError, match="unknown media_type"):
        decode_media("hologram", b"")


def _expected_rows(doc_ids):
    rows = {}

    def stat(aid, mt, part, b):
        hist = [0, 0, 0, 0]
        for v in b:
            hist[v >> 6] += 1
        rows[(aid, part)] = (mt, len(b), sum(b), *hist)

    for d in doc_ids:
        mt, content = _real_payload(d)
        stat(d, mt, "full", decode_media(mt, content))
        if mt == "video":
            for f, frame in enumerate(decode_ppm_stream(content)):
                stat(d, mt, f"frame:{f}", frame)
    return rows


def test_media_decoded_features_spark(spark):
    ids = list(range(12))
    docs = spark.createDataFrame([(d, f"t{d}") for d in ids],
                                 "doc_id long, text string")
    got = {
        (r["asset_id"], r["part"]): (
            r["media_type"], r["n_bytes"], r["sum_bytes"],
            r["h0"], r["h1"], r["h2"], r["h3"],
        )
        for r in media_decoded_features(docs).collect()
    }
    assert got == _expected_rows(ids)
    # videos contribute 1 full + n_frames rows
    vids = [d for d in ids if d % 3 == 2]
    assert sum(1 for (a, p) in got if a in vids) == sum(
        1 + 2 + d % 5 for d in vids
    )
