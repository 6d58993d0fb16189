"""Pin the verbatim end-of-string flush semantics of decode_bio.

The reference (/root/reference/transner/transner/ner.py:453-459) does NOT
clear the active-entity state after the end-of-string flush: if the flush
fires before the last token, every remaining iteration re-closes (and so
duplicates) the active entity. With real found tokens ``curr_offset``
always points at a token START (< len(s)), so the multi-fire path is only
reachable through degenerate inputs — an empty processed string with
empty tokens makes ``''.find('') == 0`` keep ``curr_offset == len(s)``.

These tests construct exactly that pathological case and assert the
reference's re-close behavior 1:1 (hand-derived from ner.py:398-459),
closing the one documented deviation VERDICT r1 flagged.
"""

from transner_spark.kernels.decode import decode_bio


def test_flush_fires_only_after_last_token_normally():
    # trailing entity with no closing O token: the flush never fires
    # (curr_offset stays at the last token's start) → entity dropped,
    # the reference's "trailing entity drop" quirk.
    s = "ciao mario rossi"
    ents = decode_bio(
        s,
        ["ciao", "mario", "rossi"],
        ["O", "B-PER", "I-PER"],
        [0.9, 0.9, 0.9],
    )
    assert ents == []


def test_pathological_mid_stream_flush_duplicates_like_reference():
    # s == "" with empty tokens: ''.find('') == 0 keeps curr_offset at
    # len(s) == 0 so the flush fires on EVERY iteration. Reference trace
    # (ner.py:398-459, threshold 0):
    #   it1 B-PER: open (value ' ', scores [.9]); flush → PER '' conf .9
    #   it2 B-LOC: B-branch closes active PER again ('' conf .9) — the
    #              duplicate — then opens LOC; flush → LOC '' conf .8
    ents = decode_bio("", ["", ""], ["B-PER", "B-LOC"], [0.9, 0.8])
    assert [(e["type"], e["value"], e["confidence"]) for e in ents] == [
        ("PERSON", "", 0.9),
        ("PERSON", "", 0.9),
        ("LOCATION", "", 0.8),
    ]
    assert [e["offset"] for e in ents] == [0, 0, 0]


def test_pathological_flush_then_extension_accumulates():
    # I- of the same type after a flush keeps extending the SAME entity
    # (state uncleared), and the flush re-closes with the grown value.
    ents = decode_bio("", ["", ""], ["B-PER", "I-PER"], [0.9, 0.7])
    assert [(e["type"], e["value"], e["confidence"]) for e in ents] == [
        ("PERSON", "", 0.9),
        ("PERSON", " ", 0.8),  # ' ' = two appended spaces minus the last
    ]
