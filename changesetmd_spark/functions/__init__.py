"""Vectorized function library: geo math, cell grids, text analytics.

Rule of the house (SURVEY.md §4): everything that *can* be a Spark
column expression IS one (whole-stage codegen, JVM-side); only
genuinely non-expressible kernels (S2 Hilbert walk) drop to
Arrow-batched pandas UDFs; per-row Python is banned (input_hint).
"""
