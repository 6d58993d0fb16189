"""Pluggable token classifier.

The reference wraps simpletransformers' ``NERModel.predict`` which returns,
per sentence, a list of single-entry ``{word: tag}`` dicts plus raw logits
(/root/reference/transner/transner/ner.py:103-107,187). Real BERT weights
are unreachable from this sandbox, so the default implementation is a
deterministic lexicon tagger that speaks the exact same interface — a real
transformer drops in by implementing ``TokenClassifier.predict`` (load the
model once per Python worker; the operators already treat the classifier as
an executor-local singleton).

Interface contract (mirrors simpletransformers so weights drop in later):

    predict(proc_strings) -> (predictions, logits)
      predictions: list (per sentence) of list of {word: BIO-tag}
      logits:      list (per sentence) of list of {word: [13 floats]}

Confidence is derived downstream via softmax-max per token
(kernels/decode.softmax_max — ner.py:188-195 parity).
"""

from __future__ import annotations

import hashlib
from abc import ABC, abstractmethod
from functools import lru_cache

from transner_spark.data import lexicons
from transner_spark.data.gazetteers import load_cities_set
from transner_spark.kernels.decode import LABEL_TO_ID, LABELS

N_LABELS = len(LABELS)


class TokenClassifier(ABC):
    @abstractmethod
    def predict(
        self, proc_strings: list[str]
    ) -> tuple[list[list[dict]], list[list[dict]]]:
        """Tag whitespace tokens of each processed (lowercased) string."""


def _stable_hash(token: str) -> int:
    """Portable 60-bit hash — the same construction as
    functions/hashing.h60 (first 15 hex chars of md5), so the DuckDB
    mentions oracle can recompute the logit for any token in SQL
    (DuckDB has no crc32; md5 it shares bit-for-bit)."""
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:15], 16)


@lru_cache(maxsize=1 << 16)
def _logit_for(token: str, label: str) -> float:
    """Deterministic one-hot logit magnitude.

    Chosen label gets z ∈ [4.0, 6.0) keyed off the token bytes →
    softmax-max confidence ∈ (0.82, 0.97); ~1 in 12 tokens gets a low
    z=2.2 (confidence ≈ 0.43) so the service threshold (0.75) actually
    filters some spans.
    """
    h = _stable_hash(token + "|" + label)
    if h % 12 == 0:
        return 2.2
    return 4.0 + (h % 80) / 40.0


class LexiconClassifier(TokenClassifier):
    """Greedy longest-match phrase tagger over the lexicons.

    Deterministic, pure, and cheap — used for tests, goldens, and the
    benchmark. Tagging happens on the *processed lowercased* token stream,
    exactly where the reference model operates.
    """

    def __init__(self) -> None:
        phrase_type: dict[tuple[str, ...], str] = {}
        for name in load_cities_set():
            phrase_type[tuple(name.split())] = "LOC"
        for p in lexicons.ORG_PHRASES:
            phrase_type[tuple(p.split())] = "ORG"
        for p in lexicons.MISC_PHRASES:
            # punctuation inside phrases is space-separated post-preprocess:
            # re-tokenize the phrase the same way the input is.
            toks = []
            for w in p.split():
                toks.extend(_split_puncts(w))
            phrase_type[tuple(toks)] = "MISC"
        for p in lexicons.DOC_PHRASES:
            toks = []
            for w in p.split():
                toks.extend(_split_puncts(w))
            phrase_type[tuple(toks)] = "DOC"
        for p in lexicons.PROC_PHRASES:
            phrase_type[tuple(p.split())] = "PROC"
        self.phrase_type = phrase_type
        self.max_phrase_len = max(len(k) for k in phrase_type)
        self.first_names = frozenset(lexicons.FIRST_NAMES)
        self.surnames = frozenset(lexicons.SURNAMES)
        self.titles = frozenset(lexicons.TITLES)

    def _tag_tokens(self, tokens: list[str]) -> list[str]:
        tags = ["O"] * len(tokens)
        i = 0
        n = len(tokens)
        while i < n:
            # longest phrase match first
            matched = False
            for L in range(min(self.max_phrase_len, n - i), 0, -1):
                t = self.phrase_type.get(tuple(tokens[i : i + L]))
                if t is not None:
                    tags[i] = "B-" + t
                    for j in range(i + 1, i + L):
                        tags[j] = "I-" + t
                    i += L
                    matched = True
                    break
            if matched:
                continue
            tok = tokens[i]
            if tok in self.first_names:
                tags[i] = "B-PER"
                j = i + 1
                while j < n and (tokens[j] in self.surnames or tokens[j] in self.first_names):
                    tags[j] = "I-PER"
                    j += 1
                i = j
                continue
            if tok in self.titles and i + 1 < n and tokens[i + 1] in self.surnames:
                tags[i + 1] = "B-PER"
                i += 2
                continue
            if tok in self.surnames and i > 0 and tokens[i - 1] in self.titles:
                tags[i] = "B-PER"
            i += 1
        return tags

    def predict(
        self, proc_strings: list[str]
    ) -> tuple[list[list[dict]], list[list[dict]]]:
        predictions: list[list[dict]] = []
        logits: list[list[dict]] = []
        for s in proc_strings:
            tokens = s.split()
            tags = self._tag_tokens(tokens)
            preds_row: list[dict] = []
            logits_row: list[dict] = []
            for tok, tag in zip(tokens, tags):
                preds_row.append({tok: tag})
                vec = [0.0] * N_LABELS
                vec[LABEL_TO_ID[tag]] = _logit_for(tok, tag)
                logits_row.append({tok: vec})
            predictions.append(preds_row)
            logits.append(logits_row)
        return predictions, logits


def _split_puncts(word: str) -> list[str]:
    """Tokenize a lexicon phrase word the same way the preprocessor splits
    input text (space around every punctuation char)."""
    from transner_spark.kernels.preprocess import _PUNCTS_SET

    out: list[str] = []
    buf = ""
    for ch in word:
        if ch in _PUNCTS_SET:
            if buf:
                out.append(buf)
                buf = ""
            out.append(ch)
        else:
            buf += ch
    if buf:
        out.append(buf)
    return out


_DEFAULT: LexiconClassifier | None = None


def default_classifier() -> LexiconClassifier:
    """Process-level singleton — the Spark analogue of the reference's
    ``app.config['NERmodel']`` reuse (/root/reference/api.py:118-122):
    loaded once per Python worker, reused across Arrow batches."""
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = LexiconClassifier()
    return _DEFAULT
