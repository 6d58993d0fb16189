"""Deterministic lexicons for the stand-in token classifier, the transcript
generator templates, and the alias dictionary.

The reference's BERT weights are unreachable from this sandbox
(/root/reference/transner/transner/ner.py:140 downloads from a private
cloud; the models dir ships empty), so the classifier is a deterministic
lexicon tagger behind the same interface (see kernels/classifier.py). The
names below are ordinary public names chosen to exercise the reference's
documented examples (README.md:12-70, api_doc:4-57, input_example.txt).
"""

from __future__ import annotations

FIRST_NAMES = (
    "mario", "luca", "marco", "matteo", "maria", "francesco", "giulia",
    "paolo", "anna", "sara", "john", "jane", "david", "laura", "peter",
    "rutger", "sanne", "daan", "emma", "lucas", "sofia", "elena", "carlo",
    "franca", "stefano",
)

SURNAMES = (
    "rossi", "bianchi", "verdi", "santos", "stewart", "verhoeven",
    "esposito", "romano", "colombo", "ricci", "marino", "greco", "bruno",
    "gallo", "conti", "ferrari", "russo", "smit", "jansen", "devries",
    "bakker", "visser", "moretti", "barbieri", "fontana",
)

# Honorifics that promote a following surname to PERSON even without a
# first name (mirrors patterns like "Il signor Di Marzio", README.md:13).
TITLES = ("signor", "signora", "dhr", "mevr", "mr", "mrs", "dr", "ing")

ORG_PHRASES = (
    "deutsche bank",
    "abn amro",
    "poste italiane",
    "links foundation",
    "acme corp",
    "banca intesa",
    "unicredit",
    "rabobank",
    "ing groep",
    "european central bank",
    "comune di milan",
    "trenitalia",
    "alitalia",
    "olivetti",
    "ferrovie dello stato",
)

# MISC phrases — some contain punctuation (exercises the preprocessor
# offset map inside entity spans) and some contain a city (exercises the
# nested-LOC rule when enabled).
MISC_PHRASES = (
    "giro d'italia",
    "expo milan",
    "festa della repubblica",
    "serie a",
    "formula uno",
    "tour de france",
)

DOC_PHRASES = (
    "passaporto",
    "passport",
    "carta d'identita",
    "visura camerale",
    "codice fiscale",
)

PROC_PHRASES = (
    "rinnovo",
    "renewal",
    "registrazione",
    "registration",
    "richiesta di rimborso",
)

# Predicate lexicon for OpenIE-lite triple extraction (kernels/triples.py).
# (phrase, predicate, reversed) — reversed=True swaps subject/object
# (passive voice, e.g. "signed by").
PREDICATE_LEXICON = (
    ("è nato a", "born_in", False),
    ("è nata a", "born_in", False),
    ("was born in", "born_in", False),
    ("is geboren in", "born_in", False),
    ("vive a", "lives_in", False),
    ("lives in", "lives_in", False),
    ("woont in", "lives_in", False),
    ("lavora per", "works_for", False),
    ("lavora presso", "works_for", False),
    ("works at", "works_for", False),
    ("works for", "works_for", False),
    ("werkt bij", "works_for", False),
    ("ha effettuato un pagamento a", "paid", False),
    ("payment to", "paid", False),
    ("betaling aan", "paid", False),
    ("sono andati a", "went_to", False),
    ("è andato a", "went_to", False),
    ("went to", "went_to", False),
    ("signed by", "signed_by", True),
    ("firmato da", "signed_by", True),
    ("headquarters of", "hq_of", True),
    ("sede di", "hq_of", True),
    ("si trova a", "located_in", False),
    ("located in", "located_in", False),
    ("member of", "member_of", False),
    ("membro di", "member_of", False),
    ("ceo of", "ceo_of", False),
    ("ha visitato", "visited", False),
    ("visited", "visited", False),
)

# Stopword votes for the heuristic language id (text-analysis operator).
LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "was", "for", "with", "that", "by"),
    "it": ("il", "la", "di", "che", "è", "un", "una", "per", "sono", "del", "con"),
    "nl": ("de", "het", "een", "van", "en", "is", "dat", "aan", "door", "met", "voor"),
}


def ensure_ner_lexicon_parquet(repo_root: str) -> tuple[str, str]:
    """Materialize the lexicon classifier's data as parquet dims for the
    independent DuckDB mentions oracle (same shared-DATA convention as
    alias_dim.parquet): phrases (space-joined pre-tokenized key, type,
    n_toks) dumped from the LexiconClassifier's own phrase dict — so the
    oracle matches against exactly the keys the classifier matches — and
    names (word, kind in first/surname/title). Only the matching/tiling
    LOGIC is re-derived in SQL. The file names embed a digest of the
    dictionary CONTENT, so editing the lexicons or the classifier's
    tokenization invalidates the dims automatically instead of the
    oracle silently running against stale data. Returns
    (phrases_path, names_path)."""
    import hashlib
    import os

    import pandas as pd

    from transner_spark.kernels.classifier import LexiconClassifier

    clf = LexiconClassifier()
    phrases = sorted(
        (" ".join(toks), ty, len(toks)) for toks, ty in clf.phrase_type.items()
    )
    names = (
        [(w, "first") for w in sorted(clf.first_names)]
        + [(w, "surname") for w in sorted(clf.surnames)]
        + [(w, "title") for w in sorted(clf.titles)]
    )
    digest = hashlib.md5(repr((phrases, names)).encode()).hexdigest()[:10]
    base = os.path.join(repo_root, "data", "cache")
    p_path = os.path.join(base, f"ner_phrases-{digest}.parquet")
    n_path = os.path.join(base, f"ner_names-{digest}.parquet")
    if os.path.exists(p_path) and os.path.exists(n_path):
        return p_path, n_path

    os.makedirs(base, exist_ok=True)
    import glob

    for stale in glob.glob(os.path.join(base, "ner_phrases-*.parquet")) + glob.glob(
        os.path.join(base, "ner_names-*.parquet")
    ):  # superseded digests: prune so edits don't accumulate files
        if stale not in (p_path, n_path):
            try:
                os.remove(stale)
            except OSError:
                pass
    tmp = f"{p_path}.{os.getpid()}.tmp"
    pd.DataFrame(phrases, columns=["phrase", "ty", "n_toks"]).to_parquet(
        tmp, index=False
    )
    os.replace(tmp, p_path)
    tmp = f"{n_path}.{os.getpid()}.tmp"
    pd.DataFrame(names, columns=["word", "kind"]).to_parquet(tmp, index=False)
    os.replace(tmp, n_path)
    return p_path, n_path
