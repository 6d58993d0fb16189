"""Sources & sinks: transcript synthesis, catalog abstraction, CoNLL tooling."""
