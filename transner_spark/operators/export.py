"""KG export sinks: serialize the edge table to standard interchange
formats so downstream consumers (triplestores, graph DBs, other teams)
can load the constructed KG without bespoke adapters.

``edges_to_ntriples`` — W3C N-Triples lines, one per edge, plus an
optional reified weight literal per edge. Pure Catalyst string
expressions (concat + an explicit percent-escape chain): no UDF, no
shuffle — serialization is a narrow map over the edge table, so at
100 TB it parallelizes perfectly and pipelines straight into
``df.write.text(...)`` for a distributed multi-file export.

IRI escaping: node/predicate ids here are controlled vocabulary
(``city:x``, ``surface:foo bar``, canon ids) whose only IRI-illegal
characters in practice are space, percent, and angle brackets; those
four are escaped explicitly (%25 FIRST, then %20/%3C/%3E — order
matters, and the identical replace chain runs in the DuckDB oracle so
the escaping rule itself is value-checked). Anything beyond this
controlled charset is a data bug the kg_integrity sweep would surface,
not an escaping concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NT_BASE = "urn:kg:"


def _iri_escape(col: F.Column) -> F.Column:
    # %25 first so later escapes aren't double-escaped
    out = F.replace(col, F.lit("%"), F.lit("%25"))
    out = F.replace(out, F.lit(" "), F.lit("%20"))
    out = F.replace(out, F.lit("<"), F.lit("%3C"))
    out = F.replace(out, F.lit(">"), F.lit("%3E"))
    return out


def edges_to_ntriples(
    edges: DataFrame,
    base: str = NT_BASE,
    include_weights: bool = False,
) -> DataFrame:
    """One N-Triples line per edge:
    ``<{base}node/S> <{base}pred/P> <{base}node/O> .``
    With ``include_weights``, one additional line per edge reifying the
    rollup weight as an xsd:integer statement on a deterministic edge
    IRI (``<{base}edge/S/P/O> <{base}pred/weight> "W"^^xsd:integer .``)
    so the count survives a round-trip through any RDF store.

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
    lines = edges.select(stmt.alias("line"))
    if not include_weights:
        return lines
    wstmt = F.concat(
        F.lit(f"<{base}edge/"), s, F.lit("/"), p, F.lit("/"), o,
        F.lit(f"> <{base}pred/weight> \""),
        F.col("weight").cast("string"),
        F.lit("\"^^<http://www.w3.org/2001/XMLSchema#integer> ."),
    )
    return lines.unionByName(edges.select(wstmt.alias("line")))
