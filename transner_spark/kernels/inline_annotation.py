"""Single-node transcription of the reference's panacea inline-annotation
tooling — the parity twin of operators/inline_annotation.py (tests only).

Faithful to /root/reference/transner/transner/tools/panacea_tools/parser.py
(annotation:36-50, create_conll:55-87, corpus concat __main__:122-128),
minus the file I/O. The entity dict is iterated in SORTED key order (the
reference iterates an unordered dict; the Spark operator pins the same
sorted order).
"""

from __future__ import annotations

import hashlib

T10_TYPES = ("PER", "LOC", "ORG")


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def t10_entities_py(texts: list[str], select_mod: int = 3) -> dict[str, str]:
    """Independent re-derivation of operators.inline_annotation.t10_entities."""
    words = {w for t in texts for w in t.split() if w}
    out: dict[str, str] = {}
    for w in sorted(words):
        if _h60("t10:" + w) % select_mod == 0:
            out[w] = T10_TYPES[_h60("t10ty:" + w) % len(T10_TYPES)]
    return out


def annotate_text(data: str, entities: dict[str, str]) -> str:
    """parser.annotation:41-50."""
    for key in sorted(entities):
        new_line = " $" + key + "$" + entities[key] + " "
        if str.find(data, " " + key + " ") > 1:
            data = data.replace(" " + key + " ", new_line)
    return data


def create_conll_lines(data: str) -> list[str]:
    """parser.create_conll:55-87 as a line list (state resets per line;
    an entity left open at end of line is silently dropped)."""
    out: list[str] = []
    for line in data.split("\n"):
        entity = False
        annotation: list[str] = []
        for word in line.split():
            if word.startswith("$") or entity is True:
                if word.count("$") == 2:
                    out.append(word.split("$")[1] + " " + word.split("$")[2])
                elif word.count("$") == 1 and entity is True:
                    tag = word.split("$")[1]
                    annotation.append(word.split("$")[0])
                    for w in annotation:
                        out.append(w + " " + tag)
                    annotation = []
                    entity = False
                elif word.count("$") == 1 and entity is False:
                    entity = True
                    annotation.append(word.split("$")[1])
                else:
                    annotation.append(word)
            else:
                out.append(word + " O")
    return out


def concat_corpus_lines(per_doc_lines: list[list[str]]) -> list[str]:
    """parser.__main__:122-128: each file's content + one extra blank."""
    out: list[str] = []
    for lines in per_doc_lines:
        out.extend(lines)
        out.append("")
    return out
