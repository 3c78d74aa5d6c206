"""Embedding-column utilities (SURVEY.md §2.G extensions, round 2).

int8 symmetric quantization — the storage/serving transform every
embedding corpus runs before indexing (4x smaller, SIMD-friendly).
Pure float64/integer arithmetic in narrow codegen expressions: both
engines compute x * (127/maxabs) on identical doubles and floor
identically, so the quantized integers are engine-exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .hashing import round4


def quantize_int8(emb: DataFrame) -> DataFrame:
    """Per-vector symmetric int8 quantization summary.

    scale = 127 / max|x|; q_i = floor(x_i * scale + 0.5). Emits the
    per-vector checksum/extremes (qsum, qmin, qmax) and the rounded
    scale — the manifest row an index-builder validates against. A
    narrow per-row transform: no shuffle at any corpus size.
    """
    # maxabs becomes a projected attribute BEFORE the quantize lambda:
    # an expression captured in a lambda re-evaluates per element
    # (O(dim²) per row — the round-1 minhash trap), an attribute ref
    # is free.
    base = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    ).select(
        "vec_id", "v", F.array_max(F.transform("v", F.abs)).alias("maxabs")
    )
    q = F.transform(
        "v",
        lambda x: F.floor(x * (F.lit(127.0) / F.col("maxabs")) + F.lit(0.5)),
    )
    # round maxabs in a SEPARATE select: aliasing the rounded value as
    # "maxabs" in the same projection would re-bind the lambda's
    # F.col("maxabs") to the ROUNDED output (observed: 84/500 vectors
    # off by one), because unresolved lambda refs resolve against the
    # projection, not the input.
    out = base.select(
        "vec_id",
        "maxabs",
        F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + x.cast("long")).alias(
            "qsum"
        ),
        F.array_min(q).cast("long").alias("qmin"),
        F.array_max(q).cast("long").alias("qmax"),
    )
    return out.select(
        "vec_id",
        round4(F.col("maxabs")).alias("maxabs"),
        "qsum",
        "qmin",
        "qmax",
    )


def pq_encode(
    emb: DataFrame, m: int = 4, sub: int = 16, k: int = 16
) -> DataFrame:
    """Product-quantization encoding manifest: each vector's `m`
    subvectors are snapped to their nearest codebook entry, yielding
    m small codes per vector (here 4 codes over 64 dims = 16x smaller
    than int8) plus the total squared reconstruction error — the
    storage transform behind every billion-scale ANN index (IVF-PQ).

    Codebooks here are the deterministic placeholder (subvectors of
    the k lowest-id vectors) so the whole encode is engine-exact and
    oracle-checkable; production trains them with
    similarity.kmeans_centroids(exact=False) per subspace — the same
    scalable update lane, tested separately.

    Shape: one k-row codebook broadcast (packed as data), then a
    NARROW per-vector pass — distances are strict left-to-right folds
    over (x-c)^2, argmin ties break on code id via array_min over
    (dist, code) structs. No shuffle at any corpus size.
    """
    v = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    cents = v.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("code"), F.col("v").alias("cv")
    )
    packed = cents.agg(
        F.collect_list(F.struct("code", "cv")).alias("cb")
    )
    out = v.crossJoin(F.broadcast(packed))
    picks = []
    for s in range(m):
        lo = s * sub + 1
        sv = F.slice(F.col("v"), lo, sub)
        dist = lambda c: F.aggregate(  # noqa: E731
            F.zip_with(
                sv, F.slice(c["cv"], lo, sub), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        best = F.array_min(
            F.transform(
                F.col("cb"),
                lambda c: F.struct(dist(c).alias("d"), c["code"].alias("code")),
            )
        )
        picks.append(best)
    recon = picks[0]["d"]
    for p in picks[1:]:
        recon = recon + p["d"]
    return out.select(
        "vec_id",
        *[p["code"].alias(f"code{s}") for s, p in enumerate(picks)],
        (F.floor(recon * 1000000.0 + F.lit(0.5)) / 1000000.0).alias("recon_err6"),
    )
