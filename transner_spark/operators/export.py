"""KG export sinks: serialize the edge table to standard interchange
formats so downstream consumers (triplestores, graph DBs, other teams)
can load the constructed KG without bespoke adapters.

``edges_to_ntriples`` — W3C N-Triples lines, one per edge, plus an
optional reified weight literal per edge. Pure Catalyst string
expressions (concat + an explicit percent-escape chain): no UDF, no
shuffle — serialization is a narrow map over the edge table, so at
100 TB it parallelizes perfectly and pipelines straight into
``df.write.text(...)`` for a distributed multi-file export.

IRI escaping: every character N-Triples forbids inside an IRIREF is
percent-escaped — space, the angle brackets, double quote, backslash,
pipe, caret, backtick, braces — plus ``%`` itself (escaped FIRST so
later escapes don't double-escape) and ``/`` (IRI-legal, but it is this
module's path delimiter inside the reified edge IRI, so leaving it raw
would let distinct (s, p, o) components collide into one IRI). The
identical ordered replace chain runs in the DuckDB oracle, so the
escaping rule itself is value-checked. Remaining illegal bytes can only
be C0/C1 controls; those fail LOUD via an in-plan ``raise_error`` guard
(never silently emitted, never silently dropped) — Spark-side only,
which is safe for the gate because on valid data the guard is inert and
on invalid data the gate errors rather than hash-matching garbage.
Unicode letters beyond ASCII are legal in IRIs and pass through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NT_BASE = "urn:kg:"

# ordered: '%' MUST be first; '/' escaped to keep the edge-IRI
# delimiter collision-free (see module docstring)
_ESCAPES = (
    ("%", "%25"),
    (" ", "%20"),
    ("/", "%2F"),
    ("<", "%3C"),
    (">", "%3E"),
    ('"', "%22"),
    ("\\", "%5C"),
    ("|", "%7C"),
    ("^", "%5E"),
    ("`", "%60"),
    ("{", "%7B"),
    ("}", "%7D"),
)


def _iri_escape(col: F.Column) -> F.Column:
    out = col
    for raw, esc in _ESCAPES:
        out = F.replace(out, F.lit(raw), F.lit(esc))
    # fail loud on anything still IRI-illegal (C0/C1 control bytes):
    # a conformant parser would reject the line, so refuse to emit it
    return F.when(
        out.rlike("[\\x00-\\x1f\\x7f]"),
        F.raise_error(
            F.concat(
                F.lit("edges_to_ntriples: control character in id: "), out
            )
        ),
    ).otherwise(out)


def edges_to_ntriples(
    edges: DataFrame,
    base: str = NT_BASE,
    include_weights: bool = False,
) -> DataFrame:
    """One N-Triples line per edge:
    ``<{base}node/S> <{base}pred/P> <{base}node/O> .``
    With ``include_weights``, one additional line per edge reifying the
    rollup weight as an xsd:integer statement on a deterministic edge
    IRI (``<{base}edge/S/P/O> <{base}pred/weight> "W"^^xsd:integer .``;
    unambiguous because ``/`` inside S/P/O is escaped) — emitted from
    the SAME single scan via an explode, never a second read of the
    edge table.

    Returns a single-column frame (``line`` string) — feed it to
    ``df.write.text(path)`` for the actual sink write (one file per
    partition, cluster-parallel)."""
    s = _iri_escape(F.col("subj_id"))
    p = _iri_escape(F.col("pred"))
    o = _iri_escape(F.col("obj_id"))
    stmt = F.concat(
        F.lit(f"<{base}node/"), s, F.lit(f"> <{base}pred/"), p,
        F.lit(f"> <{base}node/"), o, F.lit("> ."),
    )
    if not include_weights:
        return edges.select(stmt.alias("line"))
    wstmt = F.concat(
        F.lit(f"<{base}edge/"), s, F.lit("/"), p, F.lit("/"), o,
        F.lit(f"> <{base}pred/weight> \""),
        F.col("weight").cast("string"),
        F.lit("\"^^<http://www.w3.org/2001/XMLSchema#integer> ."),
    )
    return edges.select(
        F.explode(F.array(stmt, wstmt)).alias("line")
    )
