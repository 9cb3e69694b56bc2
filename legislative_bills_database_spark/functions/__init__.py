"""Scalar expression builders (pure ``pyspark.sql.functions`` compositions).

Everything here stays JVM-side / whole-stage-codegen — no Python UDFs.
"""
