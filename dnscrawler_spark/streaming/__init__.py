"""Iterative round loop (the engine's micro-batch layer, SURVEY §2.8).

The reference is batch-iterative (one wave of the two-phase loop per
"round"), not an unbounded stream, so the engine uses a driver loop of
batch jobs with snapshot commits rather than Structured Streaming —
checkpoint/resume is snapshot-based and every state table stays
inspectable as parquet.
"""
