"""Independent DuckDB derivation of the CLASSIFIER-path mentions
(source='model') — the chain the gate could previously only golden-replay.

Re-derives, in SQL, every stage of kernels/ner_pipeline for the model
path:

1. P1/P2 preprocess WITH the char-level offset map (per-position emission
   rule — same derivation as the r2 ``preprocess_proc_text`` oracle,
   extended to emit (char, original-index-or-−1) structs);
2. tokenization of the processed string (whitespace runs);
3. P3 lexicon classification: greedy longest-phrase tiling + first-name
   chains + title/surname promotion as a recursive CTE over token
   position — the phrase dictionary and name sets are shared DATA
   (``ner_phrases.parquet``/``ner_names.parquet``, dumped from the
   classifier's own tables, the alias_dim convention), the
   matching/tiling LOGIC is re-derived here;
4. P4 softmax-max confidence: the one-hot logit is h60-derived
   (portable md5 hash), and the softmax sum replays python's
   label-order left fold exactly (the 1.0 term sits at the tag's label
   index, so FP addition order matches ``sum(exp(v-m) ...)``);
5. P6/P7 BIO decode: verbatim ner.py branch semantics as a recursive
   CTE — incremental ``find``-from-current-offset token location
   (repeated tokens share offsets), B/I/O close rules with the
   strip-'' è'' quirk, the score-leak quirks (an O-close seeds the next
   span's score list; a B after O appends to it), string-truncated mean
   confidence (``str(mean)[:6]``), threshold at close, and the
   no-state-clear end-of-string flush;
6. P8 offset remap + case restore, including the reference quirk of
   indexing the offset map with the already-remapped offset.

Python-``str.split``-vs-RE2 ``\\s+`` tokenization is the same accepted
ASCII-whitespace divergence class documented for the WikiNER/T10
oracles.

``mentions_regex_sql`` below additionally derives the PII regex
subsets (all 7 non-URI patterns, EU_IBAN included — its ``[]?`` parses
identically in RE2, verified by corpus + fuzz differential) with a
position-exact finditer emulation; together with the URI and religion
gates, EVERY mention subset now has an independent SQL oracle.
"""

from __future__ import annotations

import string

from transner_spark.config import SERVICE_THRESHOLD
from transner_spark.functions.hashing import h60_sql
from transner_spark.kernels.decode import LABELS


def _punct_sql() -> str:
    return (string.punctuation + "“" + "”").replace("'", "''")


def _proc_with_map() -> str:
    """CTE fragment: per-turn processed string + offset map as a list of
    structs {c: processed char, o: original 0-based index or -1}."""
    p = _punct_sql()
    # i is the 1-based ORIGINAL index; kernel original_offset = i - 1
    piece = f"""
      CASE
        WHEN substr(text, i, 1) = ' '
             AND strpos('{p}', substr(text,
                   CASE WHEN i = 1 THEN length(text) ELSE i - 1 END, 1)) > 0
          THEN CAST([] AS STRUCT(c VARCHAR, o INT)[])
        WHEN strpos('{p}', substr(text, i, 1)) > 0
          THEN (CASE WHEN i > 1 AND substr(text, i - 1, 1) <> ' '
                      AND strpos('{p}', substr(text, i - 1, 1)) = 0
                 THEN [{{'c': ' ', 'o': -1}}]
                 ELSE CAST([] AS STRUCT(c VARCHAR, o INT)[]) END)
               || [{{'c': substr(text, i, 1), 'o': i - 1}}]
               || (CASE WHEN i < length(text)
                    THEN [{{'c': ' ',
                            'o': CASE WHEN substr(text, i + 1, 1) = ' '
                                      THEN i ELSE -1 END}}]
                    ELSE CAST([] AS STRUCT(c VARCHAR, o INT)[]) END)
        ELSE [{{'c': substr(text, i, 1), 'o': i - 1}}]
      END"""
    return f"""
pm AS (
  SELECT conv_id, turn_idx, text,
         flatten([{piece} for i in range(1, length(text) + 1)]) AS em
  FROM t
),
proc AS (
  SELECT conv_id, turn_idx, text,
         coalesce(lower(array_to_string([e.c for e in em], '')), '') AS s,
         [e.o for e in em] AS omap
  FROM pm
)"""


def _tagger_ctes(phrases: str, names: str, max_phrase_len: int | None = None) -> str:
    """CTE fragment: greedy tiling of BIO tags over the token array.

    ``max_phrase_len`` defaults to the CLASSIFIER's own computed bound
    (LexiconClassifier.max_phrase_len) so adding a longer phrase to the
    lexicons cannot silently leave the oracle's window generator short."""
    if max_phrase_len is None:
        from transner_spark.kernels.classifier import LexiconClassifier

        max_phrase_len = LexiconClassifier().max_phrase_len
    # chain length of consecutive surname|firstname tokens after pos i
    # (list_position returns 0 — not NULL — when absent, hence nullif)
    chain = (
        "coalesce(nullif(list_position("
        "[NOT (d.issn[j] OR d.isf[j]) for j in range(d.i + 1, d.n + 1)],"
        " true), 0) - 1, d.n - d.i)"
    )
    return f"""
toks AS (
  SELECT conv_id, turn_idx, text, s, omap,
         list_filter(regexp_split_to_array(s, '\\s+'), x -> x <> '') AS tk
  FROM proc
),
nl AS (
  SELECT list(word) FILTER (kind = 'first') AS nf,
         list(word) FILTER (kind = 'surname') AS ns,
         list(word) FILTER (kind = 'title') AS nt
  FROM read_parquet('{names}')
),
flags AS (
  SELECT conv_id, turn_idx, text, s, omap, tk, len(tk) AS n,
         [list_contains(nl.nf, x) for x in tk] AS isf,
         [list_contains(nl.ns, x) for x in tk] AS issn,
         [list_contains(nl.nt, x) for x in tk] AS ist
  FROM toks CROSS JOIN nl
),
win AS (
  SELECT f.conv_id, f.turn_idx, r.i, rl.L,
         array_to_string(list_slice(f.tk, r.i, r.i + rl.L - 1), ' ') AS ph
  FROM flags f,
       unnest(range(1, f.n + 1)) r(i),
       range(1, {max_phrase_len} + 1) rl(L)
  WHERE r.i + rl.L - 1 <= f.n
),
pmatch AS (
  SELECT w.conv_id, w.turn_idx, w.i,
         max(w.L) AS bl, max_by(p.ty, w.L) AS bty
  FROM win w JOIN read_parquet('{phrases}') p
    ON p.phrase = w.ph AND p.n_toks = w.L
  GROUP BY 1, 2, 3
),
pmap AS (
  SELECT conv_id, turn_idx,
         map_from_entries(
           list({{'k': i, 'v': {{'bl': bl, 'bty': bty}}}})) AS mp
  FROM pmatch GROUP BY 1, 2
),
tin AS (
  SELECT f.*,
         [coalesce(map_extract(p.mp, i)[1].bl, 0)
          for i in range(1, f.n + 1)] AS bls,
         [map_extract(p.mp, i)[1].bty
          for i in range(1, f.n + 1)] AS btys
  FROM flags f LEFT JOIN pmap p USING (conv_id, turn_idx)
),
tile AS (
  SELECT conv_id, turn_idx, text, s, omap, tk, n, isf, issn, ist, bls, btys,
         1 AS i, CAST([] AS VARCHAR[]) AS tags
  FROM tin
  UNION ALL
  SELECT d.conv_id, d.turn_idx, d.text, d.s, d.omap, d.tk, d.n,
         d.isf, d.issn, d.ist, d.bls, d.btys,
         CASE
           WHEN d.bls[d.i] > 0 THEN d.i + d.bls[d.i]
           WHEN d.isf[d.i] THEN d.i + 1 + {chain}
           WHEN d.ist[d.i] AND d.i + 1 <= d.n AND d.issn[d.i + 1]
             THEN d.i + 2
           ELSE d.i + 1
         END AS i,
         d.tags || CASE
           WHEN d.bls[d.i] > 0 THEN
             ['B-' || d.btys[d.i]]
             || ['I-' || d.btys[d.i] for _x in range(1, d.bls[d.i])]
           WHEN d.isf[d.i] THEN
             ['B-PER'] || ['I-PER' for _x in range(1, {chain} + 1)]
           WHEN d.ist[d.i] AND d.i + 1 <= d.n AND d.issn[d.i + 1]
             THEN ['O', 'B-PER']
           WHEN d.issn[d.i] AND d.i > 1 AND d.ist[d.i - 1]
             THEN ['B-PER']
           ELSE ['O']
         END AS tags
  FROM tile d WHERE d.i <= d.n
),
tagged AS (
  SELECT conv_id, turn_idx, text, s, omap, tk, n, tags
  FROM tile WHERE i = n + 1
)"""


def _conf_cte() -> str:
    """CTE fragment: per-token softmax-max confidence replaying python's
    label-order summation."""
    labels = ", ".join("'" + lb + "'" for lb in LABELS)
    h = h60_sql("(tk[i] || '|' || tags[i])")
    z = (
        f"CASE WHEN {h} % 12 = 0 THEN 2.2 "
        f"ELSE 4.0 + ({h} % 80) / 40.0 END"
    )
    # python: sum(exp(v - m) for v in xs) with the 1.0 term at the tag's
    # label index — replicate the fold order exactly
    return f"""
conf AS (
  SELECT conv_id, turn_idx, text, s, omap, tk, n, tags,
         [1.0 / list_reduce(list_prepend(0.0,
            [CASE WHEN j = list_position([{labels}], tags[i]) THEN 1.0
                  ELSE exp(-({z})) END
             for j in range(1, {len(LABELS)} + 1)]),
            (acc, v) -> acc + v)
          for i in range(1, n + 1)] AS confs
  FROM tagged
)"""


_SHORT_TO_TYPE = (
    "CASE {a} WHEN 'PER' THEN 'PERSON' WHEN 'LOC' THEN 'LOCATION' "
    "WHEN 'ORG' THEN 'ORGANIZATION' WHEN 'MISC' THEN 'MISCELLANEOUS' "
    "WHEN 'DOC' THEN 'DOCUMENT' WHEN 'PROC' THEN 'PROCEDURE' END"
)


def _close_ent(atype: str, avalue: str, ascores: str, beg: str, strip: str) -> str:
    """Entity struct for ner.py close(): value[:-1], optional ' è' strip,
    string-truncated mean confidence."""
    val0 = f"substr({avalue}, 1, len({avalue}) - 1)"
    val = (
        f"CASE WHEN {strip} AND len({val0}) >= 2 "
        f"AND substr({val0}, len({val0}) - 1, 2) = ' è' "
        f"THEN substr({val0}, 1, len({val0}) - 2) ELSE {val0} END"
    )
    mean = (
        f"list_reduce(list_prepend(0.0, {ascores}), (a, b) -> a + b)"
        f" / len({ascores})"
    )
    conf = f"CAST(substr(CAST(({mean}) AS VARCHAR), 1, 6) AS DOUBLE)"
    return (
        "{'ty': " + _SHORT_TO_TYPE.format(a=atype) + ", "
        "'val': " + val + ", "
        "'conf': " + conf + ", "
        "'off': " + beg + "}"
    )


def _decode_ctes(threshold: float) -> str:
    """CTE fragment: the verbatim ner.py decode state machine."""
    c1 = _close_ent("h.atype", "h.avalue", "h.ascores", "h.beg", "h.strip1")
    c2 = _close_ent("atype", "avalue", "ascores", "beg", "false")
    return f"""
dec AS (
  SELECT conv_id, turn_idx, text, s, omap, tk, n, tags, confs,
         0 AS k, 0 AS curr, CAST(NULL AS INT) AS beg,
         CAST(NULL AS VARCHAR) AS atype, '' AS avalue,
         CAST([] AS DOUBLE[]) AS ascores,
         CAST([] AS STRUCT(ty VARCHAR, val VARCHAR,
                           conf DOUBLE, off INT)[]) AS ents
  FROM conf
  UNION ALL
  SELECT conv_id, turn_idx, text, s, omap, tk, n, tags, confs,
         k, curr, beg, atype, avalue, ascores,
         CASE WHEN curr >= len(s) AND atype IS NOT NULL
              THEN (CASE WHEN ({c2}).conf >= {threshold}
                         THEN list_append(ents, {c2}) ELSE ents END)
              ELSE ents END AS ents
  FROM (
    -- layer g: post-branch state (ents includes the in-branch close)
    SELECT h.conv_id, h.turn_idx, h.text, h.s, h.omap, h.tk, h.n,
           h.tags, h.confs, h.k, h.curr,
           CASE
             WHEN h.is_b THEN h.curr
             WHEN h.is_i AND h.atype IS NULL THEN h.curr
             WHEN h.is_i AND h.atype IS NOT NULL AND h.ty <> h.atype
               THEN h.curr
             WHEN h.is_o AND h.atype IS NOT NULL THEN CAST(NULL AS INT)
             ELSE h.beg
           END AS beg,
           CASE
             WHEN h.is_b OR (h.is_i AND (h.atype IS NULL OR h.ty <> h.atype))
               THEN h.ty
             WHEN h.is_o AND h.atype IS NOT NULL THEN CAST(NULL AS VARCHAR)
             ELSE h.atype
           END AS atype,
           CASE
             WHEN h.is_b THEN
               (CASE WHEN h.atype IS NOT NULL THEN '' ELSE h.avalue END)
               || h.tok || ' '
             WHEN h.is_i AND (h.atype IS NULL OR h.ty = h.atype)
               THEN h.avalue || h.tok || ' '
             WHEN h.is_i THEN h.tok || ' '
             WHEN h.is_o AND h.atype IS NOT NULL THEN ''
             ELSE h.avalue
           END AS avalue,
           CASE
             WHEN h.is_b THEN
               list_append(
                 CASE WHEN h.atype IS NOT NULL
                      THEN CAST([] AS DOUBLE[]) ELSE h.ascores END, h.cf)
             WHEN h.is_i AND (h.atype IS NULL OR h.ty = h.atype)
               THEN list_append(h.ascores, h.cf)
             WHEN h.is_i THEN [h.cf]
             WHEN h.is_o AND h.atype IS NOT NULL THEN [h.cf]
             ELSE h.ascores
           END AS ascores,
           CASE WHEN h.do_close AND ({c1}).conf >= {threshold}
                THEN list_append(h.ents, {c1}) ELSE h.ents END AS ents
    FROM (
      -- layer h: current token (index k, already advanced), branch flags
      SELECT d.*,
             d.tk[d.k] AS tok, d.tags[d.k] AS tag, d.confs[d.k] AS cf,
             starts_with(d.tags[d.k], 'B') AS is_b,
             starts_with(d.tags[d.k], 'I') AS is_i,
             starts_with(d.tags[d.k], 'O') AS is_o,
             substr(d.tags[d.k], 3) AS ty,
             d.atype IS NOT NULL
               AND (starts_with(d.tags[d.k], 'B')
                    OR starts_with(d.tags[d.k], 'O')
                    OR (starts_with(d.tags[d.k], 'I')
                        AND substr(d.tags[d.k], 3) <> d.atype)) AS do_close,
             d.atype IS NOT NULL
               AND (starts_with(d.tags[d.k], 'B')
                    OR starts_with(d.tags[d.k], 'O')) AS strip1
      FROM (
        SELECT dec.conv_id, dec.turn_idx, dec.text, dec.s, dec.omap,
               dec.tk, dec.n, dec.tags, dec.confs,
               dec.k + 1 AS k,
               dec.curr + strpos(substr(dec.s, dec.curr + 1),
                                 dec.tk[dec.k + 1]) - 1 AS curr,
               dec.beg, dec.atype, dec.avalue, dec.ascores, dec.ents
        FROM dec WHERE dec.k < dec.n
      ) d
    ) h
  ) g
),
decoded AS (
  SELECT conv_id, turn_idx, text, s, omap, ents
  FROM dec WHERE k = n
)"""


def _model_m_ctes() -> str:
    """CTE fragment: P8 remap + case restore over the decoded entities →
    ``model_m (conv_id, turn_idx, mid, type, value, offset,
    confidence)`` in decode order."""
    # the P8 quirk: the -1 count indexes the offset map at the REMAPPED
    # (original-coordinate) positions
    remap_cnt = (
        "len(list_filter([x.omap[j] for j in "
        "range(x.e.off0 + 1, x.e.off0 + len(x.e.val) + 1)], v -> v = -1))"
    )
    return f"""
ex AS (
  SELECT conv_id, turn_idx, text, omap,
         unnest([{{'mid': i - 1,
                   'ty': ents[i].ty,
                   'val': ents[i].val,
                   'conf': ents[i].conf,
                   'off0': omap[ents[i].off + 1]}}
                 for i in range(1, len(ents) + 1)]) AS e
  FROM decoded
),
cased AS (
  SELECT x.conv_id, x.turn_idx, x.e.mid AS mid, x.e.ty AS type,
         substr(x.text, x.e.off0 + 1,
                len(x.e.val) - {remap_cnt}) AS v1,
         x.e.off0 AS "offset", x.e.conf AS confidence
  FROM ex x
),
model_m AS (
  SELECT conv_id, turn_idx, mid, type,
         CASE WHEN v1 <> '' AND substr(v1, len(v1), 1) = ' '
              THEN substr(v1, 1, len(v1) - 1) ELSE v1 END AS value,
         "offset", confidence
  FROM cased
)"""


def _model_chain(phrases: str, names: str, threshold: float) -> str:
    return ",\n".join(
        [
            _proc_with_map(),
            _tagger_ctes(phrases, names),
            _conf_cte(),
            _decode_ctes(threshold),
            _model_m_ctes(),
        ]
    )


def mentions_ner_sql(
    cache: str, phrases: str, names: str, threshold: float = SERVICE_THRESHOLD
) -> str:
    return f"""
WITH RECURSIVE
t AS (
  SELECT conv_id, turn_idx, text FROM read_parquet('{cache}')
  WHERE len(regexp_split_to_array(trim(text), '\\s+')) <= 150
),
{_model_chain(phrases, names, threshold)}
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
       CAST(mid AS BIGINT) AS mention_id, type, value,
       CAST("offset" AS BIGINT) AS "offset", confidence
FROM model_m
"""


# ----------------------------------------------------- regex PII subset
# EU_IBAN included: its `[]?` construct (a character class whose first
# char is a literal ']') parses IDENTICALLY in python-re and RE2 —
# verified empirically (all 77 IBAN-bearing sf0.001 turns plus 4000
# randomized fuzz strings produce identical finditer/extract_all
# results). The round-2 "no RE2 translation" caution applied to JAVA
# regex (Spark-side), which still holds — the OPERATOR keeps evaluating
# python-re inside the pandas UDF.
RE2_SAFE_TYPES = (
    "IT_FISCAL_CODE",
    "EU_IBAN",
    "NL_CITIZEN_SERVICE_NUMBER",
    "UK_NATIONAL_ID_NUMBER",
    "EU_PHONE_NUMBER",
    "EMAIL_ADDRESS",
    "IPV4_ADDRESS",
)


def _sql_lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def mentions_regex_sql(cache: str) -> str:
    """Independent SQL derivation of the PII regex mentions (all 7
    non-URI reference patterns; URI has its own gate).

    finditer emulation that is POSITION-EXACT: each step matches
    ``(?s)^(.*?)(PATTERN)`` against the remaining suffix — the lazy
    prefix (group 1) gives the match position directly, avoiding the
    strpos-relocation trap where a pattern's matched STRING occurs
    earlier as a non-match (e.g. an end guard satisfied by ``$`` only at
    the true site). The first step uses the verbatim pattern; later
    steps use a variant whose start guard drops ``^`` (in finditer ``^``
    matches only at position 0, but a suffix re-anchors it). ``$`` stays
    correct because every suffix extends to the end of the text. The
    boundary trim (drop one leading '.,: ' char / one trailing '., '
    char) replays ner.py:227-231. RE2 ``\\s`` is ASCII-only vs python's
    unicode ``\\s`` — the accepted, documented divergence class."""
    return f"""
WITH RECURSIVE t AS (
  SELECT conv_id, turn_idx, text FROM read_parquet('{cache}')
  WHERE len(regexp_split_to_array(trim(text), '\\s+')) <= 150
),
{_regex_walk_ctes(RE2_SAFE_TYPES)}
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, type, value,
       CAST("offset" AS BIGINT) AS "offset", confidence
FROM regex_m
"""


def _regex_walk_ctes(types: tuple[str, ...]) -> str:
    """CTE fragment: position-exact finditer walk over the given
    patterns → ``regex_m (conv_id, turn_idx, prank, pos0, type, value,
    offset, confidence)``. ``prank`` is the pattern's index in the
    reference's pattern-dict order; within a pattern finditer order ==
    ascending pos0 — together they give the entity-append order the
    combined mention_id needs."""
    from transner_spark.kernels.rules import REGEX_PATTERNS

    start_full = r"(\s|^|[.,:])"
    start_rest = r"(\s|[.,:])"
    all_order = list(REGEX_PATTERNS)
    rows = []
    for ty in types:
        pat = REGEX_PATTERNS[ty]
        p1 = "(?s)^(.*?)(" + pat + ")"
        if pat.startswith(start_full):
            pn = "(?s)^(.*?)(" + start_rest + pat[len(start_full):] + ")"
        else:
            pn = p1  # no ^ in the pattern (URI) — suffix-safe as-is
        rows.append(
            f"({all_order.index(ty)}, {_sql_lit(ty)}, "
            f"{_sql_lit(p1)}, {_sql_lit(pn)})"
        )
    pats = ",\n        ".join(rows)
    return f"""
pats(prank, ty, p1, pn) AS (
  SELECT * FROM (VALUES
        {pats}) v
),
wk AS (
  SELECT conv_id, turn_idx, prank, ty, pn, text AS sfx, 0 AS boff,
         regexp_extract(text, p1, 1) AS pre,
         nullif(regexp_extract(text, p1, 2), '') AS m
  FROM t CROSS JOIN pats
  UNION ALL
  SELECT conv_id, turn_idx, prank, ty, pn, sfx2 AS sfx,
         boff2 AS boff,
         regexp_extract(sfx2, pn, 1) AS pre,
         nullif(regexp_extract(sfx2, pn, 2), '') AS m
  FROM (
    SELECT conv_id, turn_idx, prank, ty, pn,
           substr(sfx, length(pre) + length(m) + 1) AS sfx2,
           boff + length(pre) + length(m) AS boff2
    FROM wk WHERE m IS NOT NULL
  )
),
hits AS (
  SELECT conv_id, turn_idx, prank, ty,
         boff + length(pre) AS pos0, m
  FROM wk WHERE m IS NOT NULL
),
trimmed AS (
  SELECT conv_id, turn_idx, prank, ty, pos0,
         CASE WHEN substr(m, 1, 1) IN ('.', ',', ':', ' ')
              THEN substr(m, 2) ELSE m END AS v1,
         CASE WHEN substr(m, 1, 1) IN ('.', ',', ':', ' ')
              THEN pos0 + 1 ELSE pos0 END AS off1
  FROM hits
),
regex_m AS (
  SELECT conv_id, turn_idx, prank, pos0, ty AS type,
         CASE WHEN substr(v1, len(v1), 1) IN ('.', ',', ' ')
              THEN substr(v1, 1, len(v1) - 1) ELSE v1 END AS value,
         off1 AS "offset", 0.9 AS confidence
  FROM trimmed
)"""


def _religion_m_cte() -> str:
    """CTE fragment: word-indexed religion-gazetteer hits →
    ``rel_m (conv_id, turn_idx, widx, type, value, offset, confidence)``.
    Kernel semantics (find_religions): per word of the lowered split, a
    gazetteer member emits value/offset of the FIRST occurrence of the
    word substring; order (for mention_id) is the WORD position, not the
    offset — a repeated word later in the sentence still appends where
    its token sits."""
    from transner_spark.data.gazetteers import load_religions_set

    words = ", ".join(
        _sql_lit(w) for w in sorted(load_religions_set())
    )
    return f"""
relw AS (
  SELECT conv_id, turn_idx, text, lower(text) AS lt,
         unnest([{{'i': i, 'w': ws[i]}} for i in range(1, len(ws) + 1)]) AS u
  FROM (
    SELECT conv_id, turn_idx, text,
           list_filter(regexp_split_to_array(lower(text), '\\s+'),
                       x -> x <> '') AS ws
    FROM t
  )
),
rel_m AS (
  SELECT conv_id, turn_idx, u.i AS widx, 'RELIGION' AS type,
         substr(text, strpos(lt, u.w), length(u.w)) AS value,
         strpos(lt, u.w) - 1 AS "offset", 0.9 AS confidence
  FROM relw
  WHERE u.w IN ({words})
)"""


def kg_mentions_sql(
    cache: str, phrases: str, names: str, threshold: float = SERVICE_THRESHOLD
) -> str:
    """FULLY independent SQL derivation of the combined kg_mentions
    table — including the interleaved ``mention_id``: ner_batch appends
    model entities (decode order), then regex entities (pattern-dict
    order, finditer order within a pattern), then gazetteer hits (word
    order), so mention_id = row_number over (segment, in-segment order)
    per turn. Replaces the golden replay the gate used through round 2;
    the golden file remains as a pytest cross-check."""
    from transner_spark.kernels.rules import REGEX_PATTERNS

    all_types = tuple(REGEX_PATTERNS)
    return f"""
WITH RECURSIVE
t AS (
  SELECT conv_id, turn_idx, text FROM read_parquet('{cache}')
  WHERE len(regexp_split_to_array(trim(text), '\\s+')) <= 150
),
{_model_chain(phrases, names, threshold)},
{_regex_walk_ctes(all_types)},
{_religion_m_cte()},
unioned AS (
  SELECT conv_id, turn_idx, 0 AS seg, mid AS o1, 0 AS o2,
         type, value, "offset", confidence, 'model' AS source
  FROM model_m
  UNION ALL
  SELECT conv_id, turn_idx, 1 AS seg, prank AS o1, pos0 AS o2,
         type, value, "offset", confidence, 'regex' AS source
  FROM regex_m
  UNION ALL
  SELECT conv_id, turn_idx, 2 AS seg, widx AS o1, 0 AS o2,
         type, value, "offset", confidence, 'gazetteer' AS source
  FROM rel_m
)
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
       CAST(row_number() OVER (
         PARTITION BY conv_id, turn_idx
         ORDER BY seg, o1, o2) - 1 AS BIGINT) AS mention_id,
       type, value, CAST("offset" AS BIGINT) AS "offset",
       confidence, source
FROM unioned
"""
