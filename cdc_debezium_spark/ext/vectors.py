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
