"""Deterministic synthetic transcripts (FIXTURES.md F1).

Schema (BASELINE.json ``input_hint``): conv_id string, turn_idx int32,
role string, text string, tool string (nullable), ts timestamp.

Generation is a pure function of (conv_idx, turn_idx) keyed by crc32 — no
RNG state — so it is order-independent and can run EITHER single-node
(pandas, for tests/goldens) or distributed (``spark.range(n).mapInPandas``
over the same per-row function, for the 10^12-turn scale path). A hot-key
"skew" knob plants one entity pair in ~20% of conversations to exercise
salting/AQE on the linking and edge-aggregation shuffles.

Templates embed: multi-word PERSON/LOCATION/ORGANIZATION surfaces,
apostrophe words that exercise the punctuation preprocessor
(reference preprocessing.py:35,48), every PII regex type (FIXTURES.md F3),
religion gazetteer words, predicate-lexicon phrases (so triples exist), a
>150-word turn (quarantine path, reference api.py:27), and a no-trailing-
punctuation turn (pins the trailing-entity-drop decode quirk).
"""

from __future__ import annotations

import zlib
from datetime import datetime, timedelta, timezone

import pandas as pd

from transner_spark.data import lexicons

_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc).replace(tzinfo=None)

# (role, template, tool) — slots: {P}=person full, {P2}=second person,
# {C}=city, {O}=org, {R}=religion word, {F}=first name
TEMPLATES: tuple[tuple[str, str, str | None], ...] = (
    ("user", "{P} è nato a {C} il 13/08/1983.", None),
    ("user", "Il signor {S} ha effettuato un pagamento a {F}.", None),
    ("assistant", "The documents were signed by {P} at the {C} headquarters of {O}.", None),
    ("user", "Bevestiging van betaling aan {O} door dhr. {S}.", None),
    ("user", "{P} lives in {C} and works for {O}.", None),
    ("assistant", "{P} woont in {C} en werkt bij {O}.", None),
    ("user", "Il mio codice fiscale è DMRFNC80E01F205B e vivo a {C}.", None),
    ("user", "Il mio IBAN è IT6012345678901234567890 per il rimborso.", None),
    ("user", "Mijn burgerservicenummer is 123456789 en ik woon in {C}.", None),
    ("user", "My national insurance number is AB123456C, said {P}.", None),
    ("user", "Chiamami al +39 0865989886 oppure scrivi a {F}.{S}@example.com.", None),
    ("assistant", "Il server {O} risponde a 192.168.0.1. come indicato in [URL_0].", None),
    ("user", "{P} e {P2} sono andati a {C} per il {M}.", None),
    ("user", "La storia dell'Italia e L'America: {P} ha visitato {C}.", None),
    ("user", "{F} è membro di {O} e segue il {R}.", None),
    ("assistant", "Practicing {R} is common in {C}, {P} explained.", None),
    ("user", "Ho bisogno del rinnovo del passaporto per {P}.", None),
    ("assistant", "La sede di {O} si trova a {C}.", None),
    ("tool", "lookup result: {P} payment to {O} confirmed via {C} office.", "payments_lookup"),
    ("tool", "search result: 3 flights to {C} for {F} {S}", "search_flights"),
    ("system", "Conversation opened for case {K}.", None),
    ("user", "{P} was born in {C} and visited {C2} with {P2}.", None),
    ("assistant", "Mr {S} works at {O} in {C}", None),  # no trailing punct: decode drop quirk
    ("user", " ".join(["parola"] * 160) + ".", None),  # >150 words → quarantine
)

_FIRST = lexicons.FIRST_NAMES
_SUR = lexicons.SURNAMES
_ORGS = lexicons.ORG_PHRASES
_MISC = lexicons.MISC_PHRASES
# cities rendered in original casing; classifier matches lowercase
_CITIES = (
    "Milan", "Rome", "Naples", "Turin", "Florence", "Palermo", "Genoa",
    "Bologna", "Verona", "Venice", "Trieste", "Parma", "Cárdenas", "Berlin",
    "Amsterdam", "Rotterdam", "Tokyo", "New York", "London", "Paris",
)
_RELIGIONS = ("Taoism", "Shinto", "Tenrikyo", "Konkokyo", "Oomoto")


def _h(key: str) -> int:
    return zlib.crc32(key.encode("utf-8"))


def _pick(seq, key: str):
    return seq[_h(key) % len(seq)]


def gen_turn(conv_idx: int, turn_idx: int, skew: bool = True) -> dict:
    """Pure per-(conv, turn) row generator."""
    conv_id = f"conv-{conv_idx:08d}"
    k = f"{conv_idx}:{turn_idx}"
    role, template, tool = TEMPLATES[_h(k + ":tpl") % len(TEMPLATES)]

    if skew and conv_idx % 5 == 0:
        fn, sn = "Mario", "Rossi"  # hot entity in ~20% of conversations
    else:
        fn = _pick(_FIRST, k + ":fn").title()
        sn = _pick(_SUR, k + ":sn").title()
    fn2 = _pick(_FIRST, k + ":fn2").title()
    sn2 = _pick(_SUR, k + ":sn2").title()

    text = template.format(
        P=f"{fn} {sn}",
        P2=f"{fn2} {sn2}",
        F=fn,
        S=sn,
        C=_pick(_CITIES, k + ":c"),
        C2=_pick(_CITIES, k + ":c2"),
        O=_pick(_ORGS, k + ":o").title(),
        M=_pick(_MISC, k + ":m").title(),
        R=_pick(_RELIGIONS, k + ":r"),
        K=_h(k + ":case") % 100000,
    )
    ts = _EPOCH + timedelta(seconds=conv_idx * 3600 + turn_idx * 30)
    return {
        "conv_id": conv_id,
        "turn_idx": turn_idx,
        "role": role,
        "text": text,
        "tool": tool,
        "ts": ts,
    }


def generate_transcripts_pdf(
    n_convs: int, turns_per_conv: int = 10, skew: bool = True
) -> pd.DataFrame:
    rows = [
        gen_turn(c, t, skew=skew)
        for c in range(n_convs)
        for t in range(turns_per_conv)
    ]
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def generate_transcripts_spark(spark, n_convs: int, turns_per_conv: int = 10, skew: bool = True):
    """Distributed generation: spark.range over conv ids → mapInPandas with
    the same pure per-row function. This is the 10^12-turn scale path — no
    driver-side materialization, partitions generated independently."""
    from pyspark.sql import functions as F  # noqa: N812
    from pyspark.sql.types import (
        IntegerType, StringType, StructField, StructType, TimestampType,
    )

    schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("turn_idx", IntegerType()),
            StructField("role", StringType()),
            StructField("text", StringType()),
            StructField("tool", StringType()),
            StructField("ts", TimestampType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            out = []
            for conv_idx in pdf["id"]:
                for t in range(turns_per_conv):
                    out.append(gen_turn(int(conv_idx), t, skew=skew))
            res = pd.DataFrame(out)
            res["turn_idx"] = res["turn_idx"].astype("int32")
            yield res

    n_parts = max(1, min(256, n_convs // 256))
    return (
        spark.range(0, n_convs, numPartitions=n_parts)
        .mapInPandas(gen, schema=schema)
    )


def sf_name(sf_dir: str) -> str:
    import os

    return os.path.basename(os.path.normpath(sf_dir))


# conversations per scale factor directory name (turns = 10×)
SF_CONVS = {"sf0.001": 200, "sf0.01": 2000, "sf0.1": 20000}


def transcripts_cache_path(repo_root: str, sf: str) -> str:
    import os

    return os.path.join(repo_root, "data", "cache", sf, "transcripts.parquet")


def ensure_transcripts_parquet(repo_root: str, sf_dir: str) -> str:
    """Generate-once parquet cache for a scale factor; both the Spark
    queries and the DuckDB oracle SQL read this same file."""
    import os

    sf = sf_name(sf_dir)
    n_convs = SF_CONVS.get(sf, 2000)
    path = transcripts_cache_path(repo_root, sf)
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pdf = generate_transcripts_pdf(n_convs)
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pa.Table.from_pandas(pdf, preserve_index=False)
        # normalize ts to microsecond precision (Spark-compatible)
        schema = table.schema.set(
            table.schema.get_field_index("ts"),
            pa.field("ts", pa.timestamp("us")),
        )
        pq.write_table(table.cast(schema), path)
    return path
