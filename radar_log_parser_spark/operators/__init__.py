"""Operators: routing, aggregation, dedup, similarity — pure DataFrame API
(no per-row Python; the only UDFs live in functions/)."""
