"""Dataflow operators: dedup/seen-set, politeness, retry, pipelines,
similarity & sketches."""
