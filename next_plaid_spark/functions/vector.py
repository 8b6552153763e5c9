"""Vector column expressions — JVM-side (whole-stage-codegen-able), no UDFs.

These are the Spark analogs of the reference's BLAS kernels
(next-plaid/src/maxsim.rs:270-328) for the *relational* paths; the hot batch
paths (index encode, exact rerank) use NumPy inside pandas UDFs instead
(see operators/codec.py, operators/maxsim.py).

All arithmetic is done in DOUBLE with a strict left-to-right fold so results
are bit-identical to a DuckDB oracle computing the same expression
(IEEE-754 addition is order-sensitive; a fixed fold order removes the
ambiguity).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two ARRAY<numeric> columns (DOUBLE)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            _as_double(a),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v * v,
        )
    )


def l2_normalize(a: Column) -> Column:
    """Row-normalize; zero vectors stay zero (reference normalizes at encode,
    next-plaid/src/kmeans.rs:414-419 guards zero norm)."""
    n = l2_norm(a)
    return F.when(n == 0.0, _as_double(a)).otherwise(
        F.transform(_as_double(a), lambda x: x / n)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either norm is zero."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(dot(a, b) / (na * nb))
