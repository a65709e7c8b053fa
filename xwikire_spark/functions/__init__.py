"""Spark-side functions: native column expressions + vectorized pandas UDFs.

Everything that can stay JVM-side (whole-stage codegen) is a Column
expression in ``text.py`` / ``ids.py``; Python crosses the boundary only in
``udfs.py`` through Arrow-batched pandas UDFs (never per-row ``udf()`` — the
BASELINE.json input_hint mandate).
"""
