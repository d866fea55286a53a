"""Scalar function library (SURVEY.md §2.7 F1-F12).

Each function exists in up to three forms that must agree exactly:
- scalar Python (used by the pure-Python oracle crawler),
- vectorized pandas (used inside Arrow UDF batches where needed),
- Catalyst Column expression (the engine hot path — JVM-side, codegen).
"""
