"""Relational helpers: thin, reusable compositions over Catalyst built-ins.

The reference's processing layer ("Kafka Streams / Spark Streaming"
enrich + aggregate, reference README.md:75-81) is realized with plain
DataFrame operators; Catalyst plans them (broadcast vs SMJ, partial
aggregation, AQE). Only patterns worth naming live here.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def topk_per_group(
    df: DataFrame,
    partition: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Top-K per key: rank inside the key's partition, filter rk<=k.

    Scales as one shuffle; the per-key sort is bounded by the key's row
    count and AQE splits skewed keys. Never a global sort.
    """
    w = Window.partitionBy(*partition).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def detect_hot_keys(
    df: DataFrame,
    on: Sequence[str],
    threshold_frac: float = 0.05,
    sample_frac: float | None = None,
    seed: int = 7,
) -> list[tuple]:
    """Driver-side heavy-hitter detection for targeted salting.

    Returns the key tuples whose row share exceeds ``threshold_frac``
    — at most ``1/threshold_frac`` entries by construction, so the
    collect is O(1) in the data. Pass ``sample_frac`` to estimate on a
    Bernoulli sample: a key above the threshold is oversampled by
    definition, so even 1e-3 samples find production hot keys reliably
    while turning the detection scan into noise. (The SCALE.md
    round-11 skew rehearsal measured why targeting matters: salting a
    row-linear dim wholesale shuffles more than the skew it cures.)
    """
    keys = list(on)
    src = df.sample(fraction=sample_frac, seed=seed) if sample_frac else df
    total = src.count()
    if total == 0:
        return []
    rows = (
        src.groupBy(*keys)
        .count()
        .filter(F.col("count") >= float(threshold_frac) * total)
        .collect()
    )
    return [tuple(r[c] for c in keys) for r in rows]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt: int = 8,
    how: str = "inner",
    hot_keys: Sequence | None = None,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    A hot key concentrates one reducer at 100 TB; AQE's skew-join split
    (enabled in session.py) handles most cases at runtime, but when the
    small side is replicable this classic rewrite removes the hot
    partition statically: the big side gets a deterministic salt in
    [0, salt), the small side is exploded `salt` ways, and the join key
    becomes (key, salt) — the hot key now spreads over `salt` reducers.
    Results are identical to the unsalted join (salt columns are
    internal and dropped).

    ``hot_keys`` (a list of key values, or key tuples for composite
    keys — e.g. from :func:`detect_hot_keys`) switches to TARGETED
    salting: only those keys take the replicated path; every other key
    takes the plain join, and the two branches union. The round-11
    skew rehearsal (SCALE.md) measured why: replicating a row-linear
    1.5M-row dim ×32 shuffled 651 MB and ran 5× slower than the naive
    join it was meant to fix, while the skew lives in a handful of
    keys. Both sides split on the same key predicate, so the union
    equals the plain join for every supported ``how``; NULL join keys
    route to the plain branch (they never equi-match, and
    left-preserved rows must survive exactly once).

    Right/full-outer joins are rejected: an unmatched small-side row
    is replicated ``salt`` ways and would be emitted once per replica.
    """
    keys = list(on)
    if how.lower().replace("_", "") in {"right", "rightouter", "full", "fullouter", "outer"}:
        raise ValueError(
            f"salted_join: how={how!r} would emit unmatched small-side "
            "rows once per salt replica; use AQE skew handling for "
            "right/full-outer joins"
        )
    if hot_keys is not None:
        if not len(hot_keys):
            return big.join(small, keys, how)
        tuples = [t if isinstance(t, (tuple, list)) else (t,) for t in hot_keys]
        if len(keys) == 1:
            pred = F.col(keys[0]).isin([t[0] for t in tuples])
        else:
            pred = F.lit(False)
            for t in tuples:
                term = F.lit(True)
                for c, v in zip(keys, t):
                    term = term & (F.col(c) == F.lit(v))
                pred = pred | term
        pred = F.coalesce(pred, F.lit(False))  # NULL keys -> plain branch
        hot = salted_join(
            big.filter(pred), small.filter(pred), keys, salt=salt, how=how
        )
        rest = big.filter(~pred).join(small.filter(~pred), keys, how)
        return hot.unionByName(rest)
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), salt)
    big_s = big.withColumn("_salt", salt_col)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<long>"))
    )
    return big_s.join(small_s, [*keys, "_salt"], how).drop("_salt")


def grouped_processor(df: DataFrame, keys: Sequence[str], fn, schema: str) -> DataFrame:
    """Per-key user processor: the Spark-native analog of a Kafka
    Streams app slotted into the pipeline (reference values.yaml:71-83,
    `userProcessor`/`orderProcessor` user-supplied images).

    Arrow-batched grouped-map (`applyInPandas`) — each key's rows reach
    `fn` as one pandas DataFrame; stays off the row-at-a-time path.
    """
    return df.groupBy(*list(keys)).applyInPandas(fn, schema=schema)


def grouped_processor_batched(
    df: DataFrame, keys: Sequence[str], fn, schema: str
) -> DataFrame:
    """Partition-batched user processor: one Python call per PARTITION.

    `applyInPandas` pays Python/pandas overhead once per KEY — fine for
    fat groups, dominant for millions of small ones. Here each key's
    rows are co-located with `repartition(keys)`, then `mapInPandas`
    hands the whole partition to `fn` (which does a vectorized pandas
    groupby inside). Per-group overhead is amortized across the
    partition; the shuffle guarantees no group spans partitions, so
    per-partition results are final. The scale knob is the partition
    count — state per task is one partition's rows, as in any shuffle.
    """
    import pandas as pd

    def run(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        if len(pdf):
            yield fn(pdf)

    return df.repartition(*list(keys)).mapInPandas(run, schema=schema)


def zorder_value(x, y, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative int columns'
    low `bits` bits — the multi-dimensional clustering key behind
    Delta/Iceberg OPTIMIZE ZORDER BY. Sorting or range-partitioning by
    this value co-locates rows that are close in BOTH dimensions, so
    per-file min/max statistics prune scans for predicates on either
    column. Pure integer arithmetic (shifts as multiplies), one narrow
    projection — whole-stage codegen, no shuffle to compute."""
    import pyspark.sql.functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        xbit = F.floor(x / (2 ** i)) % 2
        ybit = F.floor(y / (2 ** i)) % 2
        z = z + xbit * (2 ** (2 * i)) + ybit * (2 ** (2 * i + 1))
    return z


def zorder_repartition(df, x_col: str, y_col: str, n_files: int, bits: int = 16):
    """Layout rewrite: range-partition by the Morton key so each output
    file covers a compact z-range (2D-local rows land together). The
    writer-side half of OPTIMIZE ZORDER — one range shuffle, then
    sortWithinPartitions keeps row groups internally clustered too."""
    import pyspark.sql.functions as F

    z = zorder_value(F.col(x_col), F.col(y_col), bits).alias("_z")
    return (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
    )


def sessionize(
    ev: DataFrame,
    gap_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    ord_col: str = "event_id",
) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap
    from the previous event exceeds `gap_us`. One shuffle on the user
    key; both windows share that partitioning. Returns
    (user, session_id, s_start, s_end, n_events)."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, ord_col)
    new_s = F.when(
        F.lag(ts_col).over(w).isNull()
        | ((F.col(ts_col) - F.lag(ts_col).over(w)) > gap_us),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("_sid", F.sum(new_s).over(w))
        .groupBy(user_col, "_sid")
        .agg(
            F.min(ts_col).alias("s_start"),
            F.max(ts_col).alias("s_end"),
            F.count("*").alias("n_events"),
        )
        .withColumnRenamed("_sid", "session_id")
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    on: str,
    bucket_us: int,
    a_start: str = "s_start",
    a_end: str = "s_end",
    b_start: str = "s_start",
    b_end: str = "s_end",
) -> DataFrame:
    """Large×large interval OVERLAP join, keyed on `on` — the join
    shape Spark has no native operator for (a raw inequality join on
    two big sides is a per-key nested loop; a range-join hint needs
    Databricks). Standard scale-out formulation:

    1. explode each interval to the `bucket_us`-granularity buckets it
       covers — output grows by interval_span/bucket, a constant
       chosen to bound per-bucket population;
    2. equi-join on (key, bucket) — a plain shuffled hash/SMJ that
       AQE can split on skew, NOT a nested loop;
    3. keep pairs that truly overlap, and keep each pair ONLY in the
       bucket containing max(a.start, b.start) — every overlapping
       pair is emitted exactly once with no DISTINCT (the dedup-free
       assignment trick range-join implementations use).

    Emits key, a_start/a_end, b_start/b_end, overlap_us.
    """
    av = a.select(
        F.col(on),
        F.col(a_start).alias("a_start"),
        F.col(a_end).alias("a_end"),
        F.explode(
            F.sequence(
                F.floor(F.col(a_start) / bucket_us),
                F.floor(F.col(a_end) / bucket_us),
            )
        ).alias("bucket"),
    )
    bv = b.select(
        F.col(on),
        F.col(b_start).alias("b_start"),
        F.col(b_end).alias("b_end"),
        F.explode(
            F.sequence(
                F.floor(F.col(b_start) / bucket_us),
                F.floor(F.col(b_end) / bucket_us),
            )
        ).alias("bucket"),
    )
    return (
        av.join(bv, [on, "bucket"])
        .where(
            (F.col("a_start") <= F.col("b_end"))
            & (F.col("b_start") <= F.col("a_end"))
        )
        .where(
            F.col("bucket")
            == F.floor(F.greatest("a_start", "b_start") / bucket_us)
        )
        .select(
            on,
            "a_start",
            "a_end",
            "b_start",
            "b_end",
            (
                F.least("a_end", "b_end") - F.greatest("a_start", "b_start")
            ).alias("overlap_us"),
        )
    )
