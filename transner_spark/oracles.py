"""DuckDB oracle SQL for the training-data operators.

Each function returns {query_name: ANSI-ish SQL} over the same parquet
inputs the Spark queries read. These are *independent re-derivations*
(DuckDB list comprehensions / window functions), not golden files —
the only shared convention is the engine-portable h60 hash
(functions/hashing.py): Spark ``conv(substr(md5(x),1,15),16,10)`` ==
DuckDB ``CAST(('0x'||substr(md5(x),1,15)) AS BIGINT)``.

Dialect notes baked in here:
- DuckDB ``regexp_replace`` needs the ``'g'`` flag (Spark is global);
- DuckDB ``list_reduce`` has no init value → ``list_prepend(0, ...)``;
- empty list literals need an explicit cast.
"""

from __future__ import annotations

from transner_spark.operators.textops import (
    BPE_PATTERN,
    FINGERPRINT_K,
    LANG_MARKERS,
    PUNCT_PATTERN,
    STOPWORDS,
)

H60 = "CAST(('0x' || substr(md5({e}), 1, 15)) AS BIGINT)"


def _h60(e: str) -> str:
    return H60.format(e=e)


def _in_list(words) -> str:
    return "(" + ", ".join(f"'{w}'" for w in words) + ")"


_TOKS = (
    "CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[]) "
    "ELSE regexp_split_to_array(trim(text), '\\s+') END"
)


def textops_oracles(docs: str) -> dict[str, str]:
    langs = sorted(LANG_MARKERS)
    count_cols = ",\n  ".join(
        f"len(list_filter(toks, t -> t IN {_in_list(LANG_MARKERS[lg])})) AS c_{lg}"
        for lg in langs
    )
    greatest = "greatest(" + ", ".join(f"c_{lg}" for lg in langs) + ")"
    pred_case = "CASE WHEN best = 0 THEN 'und' " + " ".join(
        f"WHEN c_{lg} = best THEN '{lg}'" for lg in langs
    ) + " END"
    k = FINGERPRINT_K
    return {
        "text_stats": f"""
WITH t AS (
  SELECT doc_id, text, {_TOKS} AS toks
  FROM read_parquet('{docs}')
)
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(toks) AS BIGINT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT) AS n_bpe_tokens,
  CAST(len(regexp_extract_all(text, '{PUNCT_PATTERN}')) AS BIGINT) AS n_punct,
  CAST(len(list_filter(toks, t -> lower(t) IN {_in_list(STOPWORDS)})) AS BIGINT)
      AS n_stopwords,
  list_reduce(list_prepend(CAST(0 AS BIGINT),
      [CAST(length(x) AS BIGINT) for x in toks]), (a, b) -> a + b)
      AS sum_token_chars,
  round(
    least(1.0, len(toks) / 50.0)
    * (1.0 - least(1.0,
        len(regexp_extract_all(text, '{PUNCT_PATTERN}'))
        / greatest(len(regexp_extract_all(text, '{BPE_PATTERN}')), 1)))
    * (0.5 + 0.5 * least(1.0,
        (len(list_filter(toks, t -> lower(t) IN {_in_list(STOPWORDS)}))
         / greatest(len(toks), 1)) * 5.0)),
    6) AS quality_score
FROM t
""",
        "lang_id": f"""
WITH t AS (
  SELECT doc_id, lang AS lang_declared,
         [lower(x) for x in {_TOKS}] AS toks
  FROM read_parquet('{docs}')
), c AS (
  SELECT doc_id, lang_declared,
  {count_cols}
  FROM t
), b AS (
  SELECT *, {greatest} AS best FROM c
)
SELECT doc_id, lang_declared, {pred_case} AS lang_pred,
       CAST(best AS BIGINT) AS marker_hits
FROM b
""",
        "doc_fingerprint": f"""
WITH n AS (
  SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS nt
  FROM read_parquet('{docs}')
), s AS (
  SELECT doc_id,
    CASE WHEN length(nt) < {k} THEN [nt]
         ELSE list_distinct([substr(nt, i, {k})
                             for i in range(1, length(nt) - {k - 2})]) END AS sh
  FROM n
)
SELECT doc_id,
  CAST(len(sh) AS BIGINT) AS n_shingles,
  list_min([{_h60('x')} for x in sh]) AS fp_min,
  list_min([{_h60("('1:' || x)")} for x in sh]) AS fp_alt
FROM s
""",
    }
