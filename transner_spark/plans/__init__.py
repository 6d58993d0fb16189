"""Driver-side orchestration: staged pipeline with lineage + resume."""
