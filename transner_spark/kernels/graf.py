"""Single-node transcription of the reference's GrAF standoff-XML merge
and CoNLL annotation — the parity twin of operators/graf.py (tests only).

Faithful to
/root/reference/transner/transner/tools/panacea_tools/preprocessing_dataset/graf_merger.py:19-121
(do_merge: region/sentence/token/NER resolution over the 4-file standoff
set) and .../annotation.py:26-48 (annotate: conf>=0.75 filter +
containment tagging), minus the file I/O: inputs are the parsed XML
elements, output is the CoNLL line list.

Quirks preserved:
- sentences come only from ``label == 's'`` annotations; the LAST link of
  a node wins; ``sents`` is keyed by sent_start, so a duplicate
  sent_start OVERWRITES the earlier sentence (dict insertion position is
  kept — iteration order stays first-occurrence order);
- a token joins the FIRST sentence (dict insertion order) that fully
  contains it; tokens contained by no sentence are dropped ("Nosent?");
- per sentence, tokens are keyed by sentOrd (duplicate sentOrd
  overwrites), emitted sorted by int(sentOrd); sentences emit sorted by
  int(sent_start);
- NERs are keyed by the annotation's ref INSIDE the link loop — a NER
  node with no link is silently skipped; duplicate refs overwrite;
- annotate(): NERs with conf >= 0.75, sorted by start; a token emits one
  "word\\tLABEL" line PER containing NER (an overlap double-emits — the
  reference loop ``continue``s, it never breaks), each followed by a
  blank line when tok_end == its sentence's end; otherwise "word\\tO"
  (+ blank on sentence end).
"""

from __future__ import annotations

CONF_THRESHOLD = 0.75


def merge_graf(
    regions: dict[str, tuple[int, int]],
    sent_annos: list[dict],
    pos_annos: list[dict],
    ner_annos: list[dict],
) -> tuple[list[dict], list[dict]]:
    """graf_merger.do_merge over one document's parsed elements.

    regions: region_id -> (start, end); *_annos: document-order lists of
    {ref, region_id, ...attrs}. Returns (sentences, ners) where
    sentences = [{sent_start, sent_end, tokens: {sentOrd: tok}}] in
    OUTPUT order (sorted by int(sent_start)) and ners = conf-unfiltered
    [{start, end, label, conf}] in insertion order.
    """
    sents: dict[int, dict] = {}
    for a in sent_annos:
        if a.get("label") != "s":
            continue
        rid = a.get("region_id")
        if rid is None:
            # a linkless label=='s' annotation would KeyError the
            # reference (sents[sent['sent_start']] with no start set);
            # the operator/oracle drop it via the inner region join —
            # drop here too so the twin comparison stays total
            continue
        sent: dict = {"tokens": {}}
        sent["sent_start"], sent["sent_end"] = regions[rid]
        sents[sent["sent_start"]] = sent

    for a in pos_annos:
        rid = a.get("region_id")
        if rid is None:
            continue  # reference would reuse the previous token's
            # offsets (loop-variable leak) — not replicated; the
            # synthetic corpus always links tokens
        tok = dict(a)
        tok["start"], tok["end"] = regions[rid]
        my_sent = None
        for sent in sents.values():  # insertion order
            if tok["start"] >= sent["sent_start"] and tok["end"] <= sent["sent_end"]:
                my_sent = sent
                break
        if my_sent is not None:
            my_sent["tokens"][tok["sentOrd"]] = tok

    ners: dict[str, dict] = {}
    for a in ner_annos:
        rid = a.get("region_id")
        if rid is None:
            continue  # assignment happens inside the link loop
        ner = dict(a)
        ner["start"], ner["end"] = regions[rid]
        ners[a["ref"]] = ner

    out_sents = [s for _, s in sorted(sents.items(), key=lambda kv: int(kv[0]))]
    return out_sents, list(ners.values())


def annotate_conll(sentences: list[dict], ners: list[dict]) -> list[str]:
    """annotation.annotate over merge_graf's output."""
    kept = [n for n in ners if float(n["conf"]) >= CONF_THRESHOLD]
    kept.sort(key=lambda n: n["start"])

    out: list[str] = []
    for sent in sentences:
        end_offset = sent["sent_end"]
        for _, tok in sorted(sent["tokens"].items(), key=lambda kv: int(kv[0])):
            start, end = tok["start"], tok["end"]
            found = False
            for ner in kept:
                if start >= ner["start"] and end <= ner["end"]:
                    out.append(tok["word"] + "\t" + ner["label"])
                    found = True
                    if end == end_offset:
                        out.append("")
            if not found:
                out.append(tok["word"] + "\tO")
                if end == end_offset:
                    out.append("")
    return out
