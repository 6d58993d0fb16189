"""transner_spark — a PySpark-native knowledge-graph construction pipeline.

Built from scratch around the NER semantics of the reference `transner`
service (read-only at /root/reference): multi-turn transcripts
(conv_id, turn_idx, role, text, tool, ts) flow through vectorized
pandas/Arrow UDF stages that emit typed entity mentions, OpenIE-lite
triples, entity links, canonical ids, and a materialized edge table.

Design rules (see SURVEY.md):
- every semantic kernel lives in ``transner_spark.kernels`` as a pure
  function used by BOTH the single-node oracle and the Spark UDFs
  (parity by construction);
- all heavy compute is Arrow-batched (``mapInPandas`` / pandas UDFs),
  never per-row Python UDFs;
- the first shuffle appears only at the linking stage — mention
  extraction and triple extraction are embarrassingly parallel per turn.
"""

__version__ = "0.1.0"

from transner_spark.config import PipelineConfig  # noqa: F401
