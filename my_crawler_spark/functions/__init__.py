"""Scalar column-expression kernels.

Everything here is either a native pyspark.sql.functions expression (JVM-side,
whole-stage-codegen eligible) or an Arrow-batched pandas UDF. Per-row Python
UDFs (``pyspark.sql.functions.udf``) are banned engine-wide (north_rule).
"""
