"""Generic Ray-Data operators: the reference's validator suite recast over
arbitrary tables, plus relational/text/dedup/ANN operators for the driver's
correctness gate (SURVEY.md §2 operator inventory).

Determinism contract with the DuckDB oracle: aggregates over money-like
doubles are computed in integer cents (``ROUND(x*100)`` both sides) so
float summation order can never flip a value hash; orderings always carry a
total tie-break key.
"""
