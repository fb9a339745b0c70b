"""Dataflow operators: enrich / route / sample / carry-forward / batcher /
memory-limiter gate, plus the training-data ops (dedup, similarity, text,
multimodal). Each maps a reference component (SURVEY.md §2) to an idiomatic
DataFrame composition."""
