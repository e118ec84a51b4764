"""Scalar function library: deterministic, dependency-free equivalents of the
reference's rapidfuzz / regex / unit / date helpers (SURVEY.md §2.6).

Everything here is plain Python over strings/floats so it can be used from
both Arrow-batched pandas UDFs (engine side) and the pure-Python oracle
(test side) — the two consumers never share DataFrame code paths.
"""
