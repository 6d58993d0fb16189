"""Deterministic alias dictionary for entity linking (FIXTURES.md F5).

Built from the gazetteer fixtures plus the template name lexicons — no
external data. The dictionary is intentionally *incomplete* in places
(e.g. org aliases with/without legal suffixes) so the fuzzy n-gram-Jaccard
linking path has real work to do.

Rows: (entity_key, alias, type). entity_key is ``<type-prefix>:<norm with
underscores>``.
"""

from __future__ import annotations

from functools import lru_cache

from transner_spark.data import lexicons
from transner_spark.data.gazetteers import load_cities_rows
from transner_spark.kernels.triples import normalize_surface


def _key(prefix: str, name: str) -> str:
    return prefix + ":" + normalize_surface(name).replace(" ", "_")


@lru_cache(maxsize=None)
def build_alias_rows() -> tuple[tuple[str, str, str], ...]:
    rows: list[tuple[str, str, str]] = []

    # cities: canonical key from city_ascii; aliases = city + city_ascii
    for r in load_cities_rows():
        key = _key("city", r["city_ascii"])
        rows.append((key, r["city"], "LOCATION"))
        if r["city_ascii"] != r["city"]:
            rows.append((key, r["city_ascii"], "LOCATION"))

    # persons: every first+surname combination used by the templates,
    # plus an abbreviated "f. surname" alias
    for fn in lexicons.FIRST_NAMES:
        for sn in lexicons.SURNAMES:
            key = _key("person", f"{fn} {sn}")
            rows.append((key, f"{fn} {sn}", "PERSON"))
            rows.append((key, f"{fn[0]}. {sn}", "PERSON"))
        rows.append((_key("person", fn), fn, "PERSON"))

    # orgs: canonical name plus suffix variants (the bare form is
    # deliberately left out for some, exercising fuzzy linking)
    for org in lexicons.ORG_PHRASES:
        key = _key("org", org)
        rows.append((key, org, "ORGANIZATION"))
        rows.append((key, org + " s.p.a.", "ORGANIZATION"))

    for m in lexicons.MISC_PHRASES:
        rows.append((_key("misc", m), m, "MISCELLANEOUS"))
    for d in lexicons.DOC_PHRASES:
        rows.append((_key("doc", d), d, "DOCUMENT"))
    for p in lexicons.PROC_PHRASES:
        rows.append((_key("proc", p), p, "PROCEDURE"))

    # dedupe keeping first occurrence, deterministic order
    seen = set()
    out = []
    for row in rows:
        if row not in seen:
            seen.add(row)
            out.append(row)
    return tuple(out)


def ensure_alias_dim_parquet(repo_root: str) -> str:
    """Materialize the FULL alias dictionary as a parquet dimension
    (alias_id = enumeration order, entity_key, alias, type, norm). This
    is shared DATA for the independent kg_links oracle — the SQL
    re-derives the distinct-surface extraction, exact/gram joins,
    Jaccard scoring, and tie-breaks on its own; only the dictionary
    rows (and their kernel-normalized ``norm``) are shared, exactly as
    the corpus parquet files are."""
    import os

    import pandas as pd

    path = os.path.join(repo_root, "data", "cache", "alias_dim.parquet")
    if os.path.exists(path):
        return path
    rows = [
        (i, k, a, t, normalize_surface(a))
        for i, (k, a, t) in enumerate(build_alias_rows())
    ]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pd.DataFrame(
        rows, columns=["alias_id", "entity_key", "alias", "type", "norm"]
    ).to_parquet(tmp, index=False)
    os.replace(tmp, path)
    return path


def ensure_keys_parquet(repo_root: str) -> str:
    """Materialize the distinct normalized alias keys as a single-file
    parquet dimension (input for the substring anti-join operator and
    its DuckDB oracle — both engines read the same file and derive the
    anti-join independently). Deterministic; written once."""
    import os

    import pandas as pd

    from transner_spark.kernels.triples import normalize_surface

    path = os.path.join(repo_root, "data", "cache", "alias_keys.parquet")
    if os.path.exists(path):
        return path
    keys = sorted({normalize_surface(a) for _k, a, _t in build_alias_rows()})
    keys = [k for k in keys if k]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pd.DataFrame({"key": keys}).to_parquet(tmp, index=False)
    os.replace(tmp, path)
    return path
