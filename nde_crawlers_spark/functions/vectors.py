"""Vector (embedding) column kernels: dot, norm, cosine, sign-LSH buckets.

Pure Catalyst higher-order functions over ``array<float>`` columns —
JVM-side, codegen'd, no Python. All arithmetic is done in float64 with an
explicit left-fold accumulation order so the DuckDB oracle
(``list_dot_product`` on DOUBLE[]) matches bit-for-bit.

Reference analog: the post-index embedding pass stores 768-d dense
vectors with int8_hnsw (hub/dataindex/embed.py:51-59,124-131); ANN over
an embedding column is the training-data-pipeline extension here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def sign_bucket(vec: Column, bits: int = 8) -> Column:
    """Axis-aligned sign-LSH bucket: bit i set iff vec[i] > 0.

    A deterministic, oracle-mirrorable stand-in for random-hyperplane LSH;
    at cluster scale the hyperplanes become a broadcast matrix inside a
    pandas UDF, but the plan shape (bucket -> co-partitioned self-join)
    is identical."""
    acc: Column = F.lit(0)
    for i in range(bits):
        acc = acc + F.when(F.element_at(vec, i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return acc
