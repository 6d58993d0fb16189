"""Kernel tests: BIO decode (reference ner.py:364-462 semantics)."""

from __future__ import annotations

import numpy as np

from transner_spark.kernels.decode import decode_bio, softmax_max, truncated_mean


def _ents(s, seq, threshold=0.0):
    tokens = [t for t, _, _ in seq]
    tags = [g for _, g, _ in seq]
    scores = [c for _, _, c in seq]
    return decode_bio(s, tokens, tags, scores, threshold=threshold)


def test_simple_span_closed_by_O():
    s = "mario rossi vive qui"
    out = _ents(s, [("mario", "B-PER", 0.9), ("rossi", "I-PER", 0.8),
                    ("vive", "O", 0.9), ("qui", "O", 0.9)])
    assert out == [
        {"type": "PERSON", "value": "mario rossi",
         "confidence": truncated_mean([0.9, 0.8]), "offset": 0}
    ]


def test_trailing_entity_dropped_without_O():
    """A span still active when tokens run out is lost (ner.py flush at
    :453 can never fire for non-empty strings) — pinned quirk."""
    s = "vado a milano"
    out = _ents(s, [("vado", "O", 0.9), ("a", "O", 0.9), ("milano", "B-LOC", 0.9)])
    assert out == []


def test_orphan_I_acts_as_beginner():
    s = "x rossi ."
    out = _ents(s, [("x", "O", 0.9), ("rossi", "I-PER", 0.9), (".", "O", 0.9)])
    assert out[0]["value"] == "rossi"
    assert out[0]["type"] == "PERSON"


def test_I_type_switch_closes_and_restarts():
    s = "rome paris ."
    out = _ents(s, [("rome", "B-LOC", 0.9), ("paris", "I-ORG", 0.8), (".", "O", 0.7)])
    assert [(e["type"], e["value"]) for e in out] == [
        ("LOCATION", "rome"), ("ORGANIZATION", "paris")
    ]


def test_B_closes_previous():
    s = "rome paris ."
    out = _ents(s, [("rome", "B-LOC", 0.9), ("paris", "B-LOC", 0.8), (".", "O", 0.7)])
    assert [(e["value"], e["offset"]) for e in out] == [("rome", 0), ("paris", 5)]


def test_trailing_e_stripped_on_O_close():
    s = "mario è qui"
    out = _ents(s, [("mario", "B-PER", 0.9), ("è", "I-PER", 0.9), ("qui", "O", 0.9)])
    assert out[0]["value"] == "mario"


def test_trailing_e_not_stripped_on_type_switch():
    s = "mario è paris ."
    out = _ents(s, [("mario", "B-PER", 0.9), ("è", "I-PER", 0.9),
                    ("paris", "I-LOC", 0.8), (".", "O", 0.7)])
    # I-type-switch close does NOT strip ' è' (ner.py:427-436 has no strip)
    assert out[0]["value"] == "mario è"


def test_threshold_filters_at_close():
    s = "mario rossi ."
    seq = [("mario", "B-PER", 0.5), ("rossi", "I-PER", 0.5), (".", "O", 0.9)]
    assert _ents(s, seq, threshold=0.75) == []
    assert len(_ents(s, seq, threshold=0.4)) == 1


def test_repeated_token_offsets_incremental_find():
    """ner.py:397 — search restarts AT the current token, so consecutive
    identical tokens share an offset."""
    s = "bis bis ."
    out = _ents(s, [("bis", "B-LOC", 0.9), ("bis", "B-LOC", 0.9), (".", "O", 0.9)])
    assert [e["offset"] for e in out] == [0, 0]


def test_confidence_truncated_mean():
    # float(str(np.mean(...))[:6]) — ner.py:403
    scores = [0.8765432, 0.9123456]
    assert truncated_mean(scores) == float(str(np.mean(scores))[:6])
    assert truncated_mean([1.0 / 3.0]) == 0.3333


def test_softmax_max():
    v = [0.0] * 13
    v[1] = 4.0
    expect = np.exp(4.0) / (np.exp(4.0) + 12.0)
    assert abs(softmax_max(v) - expect) < 1e-12
