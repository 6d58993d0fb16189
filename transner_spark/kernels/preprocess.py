"""Punctuation-separating preprocessing with a char-level offset map.

Reference semantics: /root/reference/transner/transner/utils/preprocessing.py
(class NERSeparatePunctuations, lines 34-119). The reference keeps the
offset maps as *instance state* accumulated per request (lines 41-45) —
here everything is a pure per-string function so it is safe under Spark
task retry/speculation and trivially vectorizable.

The offset contract (kept exactly — it is what entity offsets are defined
against):

- every punctuation char (``string.punctuation`` + curly quotes) gets a
  space inserted before it (unless one is already there) and after it
  (unless it is the final char);
- ``offset_mapping[i]`` is the index in the ORIGINAL string of processed
  char ``i``, or ``-1`` for inserted chars (preprocessing.py:71,79);
- a pre-existing space immediately after a punctuation char is *dropped*
  from the processed string (preprocessing.py:62-65) because the space was
  already emitted by the punctuation branch.
"""

from __future__ import annotations

import string
from typing import Iterable

# string.punctuation plus the curly quotes the reference adds
# (preprocessing.py:42).
PUNCTS = string.punctuation + "“" + "”"
_PUNCTS_SET = frozenset(PUNCTS)


def preprocess_one(s: str, do_lower_case: bool = False) -> tuple[str, list[int]]:
    """Insert whitespace around punctuation; return (proc_string, offset_map).

    Faithful transcription of preprocessing.py:47-89, including the quirk
    that the space-after-punct check at offset 0 indexes ``s[-1]`` (the
    *last* char of the string).
    """
    proc_chars: list[str] = []
    offset_mapping: list[int] = []
    for original_offset, ch in enumerate(s):
        if ch == " " and s[original_offset - 1] in _PUNCTS_SET:
            # space after a punctuation char: already emitted below
            pass
        elif ch in _PUNCTS_SET:
            if (
                original_offset > 0
                and s[original_offset - 1] != " "
                and proc_chars[-1] != " "
            ):
                proc_chars.append(" ")
                offset_mapping.append(-1)
            proc_chars.append(ch)
            offset_mapping.append(original_offset)
            if len(s) > original_offset + 1:
                proc_chars.append(" ")
                offset_mapping.append(
                    original_offset + 1 if s[original_offset + 1] == " " else -1
                )
        else:
            proc_chars.append(ch)
            offset_mapping.append(original_offset)

    proc_string = "".join(proc_chars)
    if do_lower_case:
        proc_string = proc_string.lower()
    assert len(proc_string) == len(offset_mapping), (
        "processed string and offset mapping lengths do not match"
    )
    return proc_string, offset_mapping


def adjust_entities_one(
    original: str,
    entities: Iterable[dict],
    offset_mapping: list[int],
    adjust_case: bool = True,
) -> list[dict]:
    """Re-map entity offsets from processed- to original-string coordinates
    and restore the original casing of values.

    Faithful transcription of preprocessing.py:92-119 — including the
    reference quirk that the case-restore loop indexes ``offset_mapping``
    with the already-remapped (original-coordinate) offset, not the
    processed-coordinate one (preprocessing.py:103 runs before :112).
    Mutates and returns the entity dicts, like the reference.
    """
    ents = list(entities)
    for e in ents:
        e["offset"] = offset_mapping[e["offset"]]

    if adjust_case:
        for e in ents:
            start_pos = e["offset"]
            non_existing_tokens = 0
            for i in range(start_pos, start_pos + len(e["value"])):
                non_existing_tokens += int(offset_mapping[i] == -1)
            end_pos = start_pos + len(e["value"]) - non_existing_tokens
            e["value"] = original[start_pos:end_pos]
            if e["value"] and e["value"][-1] == " ":
                e["value"] = e["value"][:-1]
    return ents
