"""Scalar-function surface of the engine (SURVEY.md §2.6, §2.8).

Everything here is built-in ``pyspark.sql.functions`` expressions unless a
genuine geometry kernel is needed (see ``wkb``), so plans stay inside
whole-stage codegen.
"""
