"""BIO span decoding with confidence thresholding.

Reference semantics: ``make_ner_dict`` at
/root/reference/transner/transner/ner.py:364-462, kept exactly:

- token offsets are located incrementally with
  ``curr_offset += s[curr_offset:].find(token)`` (ner.py:397) — the search
  restarts *at* the current token, so repeated adjacent tokens share an
  offset;
- ``B-`` closes any active span and opens a new one; ``I-`` of the same
  type extends; an orphan ``I-`` acts as a beginner; an ``I-`` of a
  different type closes the active span and restarts; ``O`` closes
  (ner.py:398-450);
- span value = tokens joined by single spaces (ner.py:414 assumption);
- confidence = ``float(str(np.mean(scores))[:6])`` — the mean is
  string-truncated to ~4 decimals (ner.py:403,429,440,456);
- a trailing ``' è'`` is stripped from values in the B-close and O-close
  branches only (ner.py:405-407,442-444) — NOT in the I-type-switch or
  end-flush branches;
- spans below the threshold are dropped at close time (ner.py:408,431,445,458);
- the end-of-string flush (ner.py:453-459) only fires when ``curr_offset``
  has run past the string, which in practice means a trailing entity not
  followed by an ``O`` token is usually *dropped* — a faithful quirk.
"""

from __future__ import annotations

import math

# BIO tag set of the reference model (ner.py:24-38) and short→long type
# names (ner.py:40-46).
LABELS = [
    "O",
    "B-PER", "I-PER",
    "B-LOC", "I-LOC",
    "B-ORG", "I-ORG",
    "B-MISC", "I-MISC",
    "B-DOC", "I-DOC",
    "B-PROC", "I-PROC",
]
LABEL_TO_ID = {t: i for i, t in enumerate(LABELS)}
SHORT_TO_TYPE = {
    "PER": "PERSON",
    "LOC": "LOCATION",
    "ORG": "ORGANIZATION",
    "MISC": "MISCELLANEOUS",
    "DOC": "DOCUMENT",
    "PROC": "PROCEDURE",
}


def truncated_mean(scores: list[float]) -> float:
    """The reference's confidence aggregation: mean of token scores,
    stringified and truncated to 6 chars (~4 decimal digits), ner.py:403.
    Plain sum/len — bit-identical to np.mean only below numpy's 8-wide
    pairwise unroll; longer spans may differ in the last ulp, which the
    6-char truncation almost always absorbs and the P/R slack covers
    (the single-node oracle shares THIS function, so Spark-vs-oracle
    parity is exact by construction)."""
    return float(str(sum(scores) / len(scores))[:6])


def softmax_max(logits) -> float:
    """Per-token confidence: max of the softmax over label logits
    (ner.py:188-195, torch.nn.functional.softmax → max). Closed form:
    the max softmax entry is exp(0)/Σexp(x−max) = 1/Σexp(x−max).
    Pure-python math.exp beats per-token numpy dispatch ~5× on the
    ≤13-label vectors this sees (33% of kernel time before). Last-ulp
    drift vs the numpy original is possible (different exp/sum order);
    the shared-kernel oracle keeps cross-engine parity exact, and the
    goldens were verified byte-identical across the swap."""
    xs = [float(v) for v in logits]
    m = max(xs)
    return 1.0 / sum(math.exp(v - m) for v in xs)


def decode_bio(
    s: str,
    tokens: list[str],
    tags: list[str],
    scores: list[float],
    threshold: float = 0.0,
) -> list[dict]:
    """Decode a (token, BIO-tag, score) stream over processed string ``s``
    into entity dicts {type, value, offset, confidence}.

    Offsets are in processed-string coordinates; remapping to the original
    string happens in ``preprocess.adjust_entities_one``.
    """
    assert len(tags) == len(scores), "Prediction and scores size mismatch"
    entities: list[dict] = []
    curr_offset = 0
    beginning_offset = None
    active_e_type = None
    active_e_value = ""
    active_e_scores: list[float] = []

    def close(strip_e: bool) -> None:
        curr_entity = {
            "type": SHORT_TO_TYPE[active_e_type],
            "value": active_e_value[:-1],
            "confidence": truncated_mean(active_e_scores),
            "offset": beginning_offset,
        }
        if strip_e and curr_entity["value"][-2:] == " è":
            curr_entity["value"] = curr_entity["value"][:-2]
        if curr_entity["confidence"] >= threshold:
            entities.append(curr_entity)

    for e_value, e_type, score in zip(tokens, tags, scores):
        curr_offset = curr_offset + s[curr_offset:].find(e_value)
        if e_type[0] == "B":
            if active_e_type:
                close(strip_e=True)
                active_e_value = ""
                active_e_scores = []
            beginning_offset = curr_offset
            active_e_type = e_type[2:]
            active_e_value += e_value + " "
            active_e_scores.append(score)
        elif e_type[0] == "I":
            if not active_e_type:
                beginning_offset = curr_offset
                active_e_type = e_type[2:]
                active_e_value += e_value + " "
                active_e_scores.append(score)
            elif e_type[2:] == active_e_type:
                active_e_value += e_value + " "
                active_e_scores.append(score)
            else:
                close(strip_e=False)
                beginning_offset = curr_offset
                active_e_type = e_type[2:]
                active_e_value = e_value + " "
                active_e_scores = [score]
        elif e_type[0] == "O" and active_e_type:
            close(strip_e=True)
            beginning_offset = None
            active_e_type = None
            active_e_value = ""
            active_e_scores = [score]

        if curr_offset >= len(s) and active_e_type:
            # verbatim ner.py:453-459: the reference does NOT clear state
            # after the end-of-string flush, so if the flush ever fires
            # before the last token it re-closes (duplicates) the active
            # entity on each remaining iteration. With real found tokens
            # curr_offset stays < len(s) (it points at a token START), so
            # the multi-fire path is reachable only through degenerate
            # inputs (empty string / empty tokens) — pinned by
            # tests/test_decode_flush.py.
            close(strip_e=False)

    return entities
