"""Kernel tests: punctuation-separating preprocess + offset remap.

Hand cases derive from the reference's documented behavior
(/root/reference/transner/transner/utils/preprocessing.py:47-119) and
FIXTURES.md (apostrophe words like dell'Italia / L'America).
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from transner_spark.kernels.preprocess import PUNCTS, adjust_entities_one, preprocess_one


def test_apostrophe_word_split():
    proc, omap = preprocess_one("L'America", do_lower_case=True)
    assert proc == "l ' america"
    # inserted spaces map to -1; real chars map to their original index
    assert omap == [0, -1, 1, -1, 2, 3, 4, 5, 6, 7, 8]


def test_space_after_punct_not_duplicated():
    proc, omap = preprocess_one("ciao, mondo", do_lower_case=False)
    assert proc == "ciao , mondo"
    # the original space after ',' is reused (mapped), not doubled
    assert omap == [0, 1, 2, 3, -1, 4, 5, 6, 7, 8, 9, 10]


def test_final_punct_no_trailing_space():
    proc, _ = preprocess_one("fine.", do_lower_case=False)
    assert proc == "fine ."


def test_lowercase_applied_after_mapping():
    proc, omap = preprocess_one("Ab.Cd", do_lower_case=True)
    assert proc == "ab . cd"
    assert len(proc) == len(omap)


def test_adjust_offsets_and_case_restore():
    s = "Mario Rossi è nato a Milano."
    proc, omap = preprocess_one(s, do_lower_case=True)
    # entity "mario rossi" at proc offset 0
    ents = [{"type": "PERSON", "value": "mario rossi", "offset": 0, "confidence": 0.9}]
    out = adjust_entities_one(s, ents, omap)
    assert out[0]["offset"] == 0
    assert out[0]["value"] == "Mario Rossi"


def test_case_restore_truncation_quirk():
    """Insertions BEFORE a span make the reference's case-restore count -1s
    from the wrong (earlier) region and truncate the value — pinned."""
    s = "L'America: Anna Conti arriva."
    proc, omap = preprocess_one(s, do_lower_case=True)
    start = proc.index("anna conti")
    ents = [{"type": "PERSON", "value": "anna conti", "offset": start, "confidence": 0.9}]
    out = adjust_entities_one(s, ents, omap)
    assert out[0]["offset"] == s.index("Anna")
    # truncated by the number of -1s in omap[orig_start : orig_start+10]
    assert out[0]["value"] == "Anna Cont"
    # the value is still an exact prefix-substring at the offset
    o = out[0]["offset"]
    assert s[o : o + len(out[0]["value"])] == out[0]["value"]


def test_length_changing_lowercase_raises_like_reference():
    """'İ'.lower() is two chars; the reference's length assert
    (preprocessing.py:86) fires AFTER lowering, so such input crashes the
    reference — our kernel faithfully raises too."""
    import pytest

    with pytest.raises(AssertionError):
        preprocess_one("İstanbul", do_lower_case=True)


@given(
    st.text(
        alphabet=st.characters(codec="utf-8", categories=("L", "N", "P", "Zs")),
        max_size=60,
    ).filter(lambda s: len(s.lower()) == len(s))
)
@settings(max_examples=300, deadline=None)
def test_preprocess_properties(s):
    proc, omap = preprocess_one(s, do_lower_case=True)
    # total map
    assert len(proc) == len(omap)
    # every mapped char indexes the original char it came from (mod case)
    for i, orig in enumerate(omap):
        if orig != -1:
            assert proc[i] == s[orig].lower() or proc[i] == " "
    # non-punct non-space content is preserved
    keep = [c.lower() for c in s if c not in PUNCTS and c != " "]
    keep_proc = [c for c in proc if c not in PUNCTS and c != " "]
    assert keep == keep_proc


def test_puncts_set_matches_reference():
    assert PUNCTS == string.punctuation + "“" + "”"
