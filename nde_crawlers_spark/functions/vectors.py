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
    """Axis-aligned sign bucket: bit i set iff vec[i] > 0.

    KEPT ONLY as the cheap teaching form — on real (anisotropic)
    embeddings the first-k raw dims are correlated, so these buckets
    collapse into one hot bucket and the in-bucket join goes quadratic.
    Production buckets are ``hyperplane_bucket`` (random hyperplanes,
    rotation-robust); same plan shape either way."""
    acc: Column = F.lit(0)
    for i in range(bits):
        acc = acc + F.when(F.element_at(vec, i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return acc


def hyperplane_matrix(bits: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Seeded pseudo-random hyperplanes in [-1, 1): component (p, d) is a
    pure function of md5, so the SAME doubles are reproducible anywhere —
    Spark literals, the DuckDB oracle, a numpy batch — with no RNG-state
    coupling. At cluster scale this list is broadcast once (it is
    bits*dim floats); here it folds into the expression as constants."""
    import hashlib

    planes: list[list[float]] = []
    for p in range(bits):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"plane:{seed}:{p}:{d}".encode()).digest()
            row.append(int.from_bytes(h[:8], "big") / 2**64 * 2.0 - 1.0)
        planes.append(row)
    return planes


def hyperplane_bucket(vec: Column, bits: int = 8, dim: int = 64, seed: int = 42) -> Column:
    """Random-hyperplane LSH bucket: bit p set iff dot(plane_p, vec) > 0.

    Unlike ``sign_bucket`` this is rotation-robust: bucket balance holds
    for correlated/anisotropic embeddings (each plane splits the corpus
    ~in half regardless of the data's principal axes), which is what
    keeps the in-bucket self-join sub-quadratic at 10^9 vectors. The dot
    products are explicit left-fold sums of literal*element products —
    codegen'd, engine-deterministic (the oracle mirrors the same literals
    in the same order), no Python in the hot path."""
    planes = hyperplane_matrix(bits, dim, seed)
    acc: Column = F.lit(0)
    for p in range(bits):
        dot: Column = F.lit(0.0)
        for d in range(dim):
            dot = dot + F.lit(planes[p][d]) * F.element_at(vec, d + 1).cast("double")
        acc = acc + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return acc
