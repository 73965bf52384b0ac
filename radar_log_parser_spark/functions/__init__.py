"""Vectorized functions: the engine's only Python-on-rows surface (Arrow
pandas UDFs) plus JVM-side column helpers."""
