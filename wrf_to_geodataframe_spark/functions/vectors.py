"""Vector similarity as built-in array expressions (no UDFs).

Cosine similarity is computed from EXACT integer quantities: each
elementwise product is floored at 2^-40 resolution into a BIGINT
(products of float32 values are exact in double, so both engines floor
the identical double), and the sum of 64 such ints is exact under any
execution order — the suite's bit-reproducibility discipline applied to
embeddings.  The final ``dot / sqrt(n1*n2)`` is one deterministic double
expression (norms multiplied in double: BIGINT*BIGINT would overflow).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DOT_SCALE = float(1 << 40)


def as_double_vec(col: Column) -> Column:
    """array<float> → array<double> (float widening is exact)."""
    return col.cast("array<double>")


def dot_q(a: Column, b: Column) -> Column:
    """Exact-integer quantized dot product of two double vectors."""
    prods = F.zip_with(
        a, b, lambda x, y: F.floor(x * y * F.lit(DOT_SCALE)).cast("long")
    )
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)


def norm_q(a: Column) -> Column:
    """Exact-integer quantized squared norm."""
    return dot_q(a, a)


def cosine_from_q(dq: Column, nqa: Column, nqb: Column) -> Column:
    """Deterministic cosine from quantized dot + squared norms."""
    return dq.cast("double") / F.sqrt(nqa.cast("double") * nqb.cast("double"))
