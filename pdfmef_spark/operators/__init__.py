"""Operator library: each module is one pipeline stage or operator family.

All stages are DataFrame -> DataFrame functions; Python work is always
Arrow-batched (pandas UDF / mapInPandas), never per-row (input_hint:
"no per-row Python").
"""
