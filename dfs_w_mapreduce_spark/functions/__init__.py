"""Scalar/array helper functions (text, vectors) built on pyspark.sql.functions."""
