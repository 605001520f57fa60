"""Vector (embedding) column functions — JVM-side, no UDFs.

Cosine/dot over ``array<float>`` columns via ``zip_with`` + ``aggregate``;
deterministic left-to-right summation in double precision so a SQL oracle
(DuckDB ``list_dot_product`` / explicit unnest-sum) reproduces values exactly
after rounding.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a, b) -> Column:
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a, b) -> Column:
    """Cosine similarity; 0.0 when either norm is 0."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(d / (na * nb))


def lsh_bucket(a, num_planes: int = 8, seed: int = 0) -> Column:
    """Random-hyperplane LSH bucket id (sign bits of ``num_planes`` projections).

    Deterministic pseudo-random planes derived from (seed, plane, dim) via a
    portable md5 hash mapped to [-0.5, 0.5); bucket = packed sign bits.
    Vectors in the same bucket are cosine-near with high probability — the
    scale path for ANN (brute-force within bucket only).
    """
    v = _c(a)
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        # plane component for dim i: hash(seed,p,i) scaled to [-0.5, 0.5)
        proj = F.aggregate(
            F.zip_with(
                v,
                F.transform(
                    F.sequence(F.lit(0), F.size(v) - 1),
                    lambda i: (
                        F.conv(
                            F.substring(
                                F.md5(F.concat_ws("_", F.lit(seed), F.lit(p), i.cast("string"))),
                                1,
                                8,
                            ),
                            16,
                            10,
                        ).cast("double")
                        / F.lit(float(16**8))
                        - 0.5
                    ),
                ),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
    return bucket
