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


def _plane_projection(v: Column, seed: int, plane: int) -> Column:
    """Dot product of ``v`` with deterministic pseudo-random hyperplane
    ``plane``: component for dim i = md5-hash(seed, plane, i) scaled to
    [-0.5, 0.5). Portable — a DuckDB oracle reproduces it bit-for-bit."""
    return F.aggregate(
        F.zip_with(
            v,
            F.transform(
                F.sequence(F.lit(0), F.size(v) - 1),
                lambda i: (
                    F.conv(
                        F.substring(
                            F.md5(F.concat_ws("_", F.lit(seed), F.lit(plane), i.cast("string"))),
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
        proj = _plane_projection(v, seed, p)
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
    return bucket


def banded_params(n_vectors: int, target_bucket: int = 16, n_tables: int = 4) -> tuple[int, int]:
    """Scale-parameterized banded-LSH shape: (n_tables, planes_per_table).

    Planes per table r = ceil(log2(N / target_bucket)) clamped to [2, 24], so
    the expected bucket size stays ~``target_bucket`` as N grows — at 10^9
    vectors r = 26→24 gives ~60-row buckets, where the fixed-256-bucket
    single-table scheme would put ~4M rows in each. More tables raise recall
    (P[candidate] = 1-(1-p^r)^b for per-plane agreement p); more planes cut
    cost. Both knobs are free of the data (portable hash planes).
    """
    import math

    r = math.ceil(math.log2(max(n_vectors, 2) / max(target_bucket, 1)))
    return n_tables, min(max(r, 2), 24)


def banded_lsh_keys(a, n_tables: int = 4, n_planes: int = 6, seed: int = 0) -> Column:
    """Banded multi-table hyperplane LSH keys (array<string>, one per table).

    Table t uses planes [t*n_planes, (t+1)*n_planes) of the same portable
    hash family as ``lsh_bucket``; key = ``"t<t>|<packed sign bits>"``. Two
    vectors are ANN candidates iff they share >= 1 table key — the standard
    banding construction (same shape as MinHash LSH bands), sized by
    ``banded_params`` so within-bucket work is bounded at any N.
    """
    v = _c(a)
    keys = []
    for t in range(n_tables):
        bucket = F.lit(0).cast("long")
        for p in range(n_planes):
            proj = _plane_projection(v, seed, t * n_planes + p)
            bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
        keys.append(F.concat_ws("|", F.lit(f"t{t}"), bucket.cast("string")))
    return F.array(*keys)


def multiprobe_lsh_keys(
    a, n_tables: int = 4, n_planes: int = 6, seed: int = 0
) -> Column:
    """Query-side multi-probe keys (array<string>, TWO per table): the exact
    banded bucket plus the bucket with the LEAST-CONFIDENT sign bit flipped
    — the plane whose |projection| margin is smallest (ties to the lowest
    plane index), i.e. the neighbor bucket a near-miss most likely fell
    into (Lv et al. 2007, multi-probe LSH).

    Why it matters at scale: recall in banded LSH is bought with MORE
    TABLES, and every table replicates the whole index (b× memory and
    build shuffle). Probing the best perturbation of each existing table
    buys comparable recall on the QUERY side for zero index cost — only
    2× probe keys. Index rows keep using ``banded_lsh_keys`` unchanged.

    Deterministic and portable: margins are the same fixed-order
    projections the bucket bits use, so a SQL twin reproduces bucket,
    argmin plane, and flipped key bit-for-bit. The flip uses a
    PRE-COMPUTED array of statically-masked buckets selected by the argmin
    index (no dynamic shift, stays inside codegen).
    """
    v = _c(a)
    keys = []
    for t in range(n_tables):
        projs = [_plane_projection(v, seed, t * n_planes + p) for p in range(n_planes)]
        bucket = F.lit(0).cast("long")
        for p in range(n_planes):
            bucket = bucket + F.when(projs[p] >= 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
        jstar = F.least(
            *[
                F.struct(F.abs(projs[p]).alias("a"), F.lit(p).alias("p"))
                for p in range(n_planes)
            ]
        )["p"]
        flips = F.array(*[bucket.bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)])
        flipped = F.element_at(flips, jstar + 1)
        keys.append(F.concat_ws("|", F.lit(f"t{t}"), bucket.cast("string")))
        keys.append(F.concat_ws("|", F.lit(f"t{t}"), flipped.cast("string")))
    return F.array(*keys)
