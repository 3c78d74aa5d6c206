"""Engine-agnostic deterministic hashing primitives.

The extension operators (dedup, fingerprinting, simhash, minhash) need
hash functions that produce IDENTICAL values in Spark and in the DuckDB
oracle — built-in hashes differ across engines (xxhash64 vs murmur), so
we define a polynomial rolling hash over characters in pure integer
arithmetic, expressible as a higher-order-function fold on both sides:

    h(s) = fold(c in chars(s)) acc -> (acc*31 + ascii(c)) mod (2^31 - 1),
    acc0 = 7

SHINGLE hashes live in a 61-bit space (mod 2^61-1, Mersenne): at
10^9-10^10 distinct shingles a 31-bit space saturates (birthday
collisions inflate candidate mass and intersection counts), while
2^61 keeps expected collisions in the tens even at 100 TB. All
61-bit arithmetic is built from linear forms whose every
intermediate stays < 2^63 — DuckDB raises on BIGINT overflow and
Spark wraps silently, so overflow-free construction is what keeps
the two engines bit-identical.

Every constant here has a mirror in the DuckDB SQL fragments below;
keep them in lockstep. At 100 TB this hash runs inside whole-stage
codegen (no Python), so it is also the *fast* path, not just the
portable one.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

MOD = 2_147_483_647  # 2^31 - 1 (Mersenne prime); keeps acc*31+c < 2^36
INIT = 7

M61 = (1 << 61) - 1  # 2^61 - 1 (Mersenne prime): the shingle-hash space
_L31 = 1 << 31  # lo/hi split for overflow-free linear forms mod M61

# Per-position shingle coefficients: DISTINCT odd 13-bit multipliers,
# so coef * word_hash48 < 2^13 * 2^48 = 2^61 and each fold step
# acc + coef*h (acc < M61) stays < 2^62 for ANY shingle width n —
# never overflows int64. Distinctness matters: equal coefficients at
# two positions would make the fold symmetric in them (ABC == CBA).
# Width cap: 64 positions — every fold entry point raises a clear
# ValueError past it (_check_shingle_width) instead of an IndexError.
SHINGLE_COEF: list[int] = [
    ((0x9E3779B1 * (k + 1)) % (1 << 13)) | 1 for k in range(64)
]
assert len(set(SHINGLE_COEF)) == len(SHINGLE_COEF)


def _check_shingle_width(n: int) -> None:
    if not 1 <= n <= len(SHINGLE_COEF):
        raise ValueError(
            f"shingle width n={n} outside 1..{len(SHINGLE_COEF)} "
            "(the per-position coefficient family SHINGLE_COEF)"
        )

# Affine seed pairs (a_j odd, b_j arbitrary) over 31-bit inputs:
# kept for the count-min / bloom lanes whose keys are < 2^31.
MINHASH_SEEDS: list[tuple[int, int]] = [(2 * j + 1, 101 * j + 17) for j in range(8)]

# MinHash permutations over 61-bit shingle hashes. (a*h+b) mod M61
# would overflow int64 for h near 2^61, so each perm is a 2-universal
# linear form over h's (lo, hi) 31/30-bit split:
#   perm_j(h) = (a_j*(h & (2^31-1)) + b_j*(h >> 31) + d_j) mod M61
# with a_j, b_j odd < 2^30: every term < 2^61, the sum < 2^63 — exact
# on both engines. 8 perms, banded 4x2 for LSH candidate generation.
MINHASH_SEEDS61: list[tuple[int, int, int]] = [
    (
        ((0x9E3779B1 * (2 * j + 1)) % (1 << 30)) | 1,
        ((0x85EBCA77 * (2 * j + 1)) % (1 << 30)) | 1,
        101 * j + 17,
    )
    for j in range(8)
]
N_BANDS = 4
ROWS_PER_BAND = 2


def lsh_recall(jaccard: float, bands: int = N_BANDS, rows: int = ROWS_PER_BAND) -> float:
    """LSH S-curve: P(candidate) = 1 - (1 - j^r)^b for a pair at
    Jaccard j under (b bands × r rows) banding — the textbook MinHash
    collision model (Leskovec/Rajaraman/Ullman, MMDS ch.3). The r8
    measurement (recall 0.975 at j>=0.5 with 4x2) matches this curve;
    use it to SIZE banding instead of guessing."""
    return 1.0 - (1.0 - jaccard**rows) ** bands


def minhash_bands_for(
    target_recall: float, jaccard: float, rows: int = ROWS_PER_BAND
) -> int:
    """Smallest band count whose S-curve recall at `jaccard` meets
    `target_recall` (rows fixed: row count sets the precision side —
    more rows = sharper low-j rejection — while bands buy recall at
    bands x signature/index cost). The deployment knob the r8 verdict
    noted ('if a story needs >0.98 recall, raise N_BANDS'), made
    analytic: e.g. >=0.98 at j=0.5 with r=2 needs ceil(log(0.02) /
    log(1 - 0.25)) = 14 bands. Changing bands means re-deriving
    MINHASH_SEEDS61 (bands*rows permutations) and rebuilding any
    persisted band index — the same migration note as the r8 band-key
    schema change."""
    import math

    if not 0 < target_recall < 1:
        raise ValueError("target_recall must be in (0, 1)")
    if not 0 < jaccard <= 1:
        raise ValueError("jaccard must be in (0, 1]")
    p = jaccard**rows
    if p >= 1.0:
        return 1
    return max(1, math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p)))


SIMHASH_BITS = 32


def char_hash(col: Column | str) -> Column:
    """Polynomial rolling hash of a string column (JVM-side fold)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.filter(F.split(col, ""), lambda c: c != F.lit("")),
        F.lit(INIT).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % F.lit(MOD).cast("long"),
    )


def word_hash(col: Column | str) -> Column:
    """32-bit token hash: integer value of the first 8 hex chars of md5.

    Unlike char_hash's per-character fold (an interpreted lambda per
    character), md5/substring/conv are JVM builtins inside whole-stage
    codegen — ~30× less overhead on token-sized strings. DuckDB mirrors
    it by parsing the same 8 hex chars (duck_word_hash).
    """
    col = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def duck_word_hash(expr: str) -> str:
    return (
        f"list_reduce(list_transform(string_split(substr(md5({expr}), 1, 8), ''), "
        "c -> strpos('0123456789abcdef', c) - 1), (a, x) -> a * 16 + x)::BIGINT"
    )


def word_hash48(col: Column | str) -> Column:
    """48-bit token hash for the SHINGLE path (first 12 hex md5 chars).

    The 32-bit word_hash is fine for buckets and bit sampling, but a
    100 TB vocabulary (IDs, typos, hapaxes) reaches 10^8-10^9 distinct
    tokens — at 2^32 that is guaranteed mass collision (each token ~0.1
    expected collision partners), which leaks false equality into the
    shingle space the r8 widening just cleaned. 2^48 keeps expected
    colliding word PAIRS in the low thousands at 10^9 vocab, and
    13-bit SHINGLE_COEF keeps coef*h < 2^61 in the fold.
    Mirror: duck_word_hash48().
    """
    col = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def duck_word_hash48(expr: str) -> str:
    return (
        f"list_reduce(list_transform(string_split(substr(md5({expr}), 1, 12), ''), "
        "c -> strpos('0123456789abcdef', c) - 1), (a, x) -> a * 16 + x)::BIGINT"
    )


def shingle_hashes(words: Column, n: int = 3) -> Column:
    """Array of distinct 61-bit shingle hashes from a token-array column.

    Hashes each WORD once (md5-prefix, codegen builtins), then combines
    n word-hashes per shingle with a position-weighted linear form mod
    2^61-1 — O(words + shingles) per document; shingle strings are
    never materialized, and every fold step stays < 2^62 (no int64
    overflow on either engine).
    Mirror: duck_shingle_hashes() over an `hwl` word_hash48 list.
    """
    _check_shingle_width(n)
    hw = F.transform(words, word_hash48)
    length = F.size(words) - (n - 1)
    parts = [F.slice(hw, k + 1, length) for k in range(n)]
    z = F.transform(
        parts[0],
        lambda x: (F.lit(INIT).cast("long") + F.lit(SHINGLE_COEF[0]) * x) % M61,
    )
    for k, p in enumerate(parts[1:], 1):
        z = F.zip_with(z, p, _shingle_step(SHINGLE_COEF[k]))
    return F.when(F.size(words) >= n, F.array_distinct(z)).otherwise(
        F.array().cast("array<long>")
    )


def _shingle_step(coef: int):
    """2-arg zip_with lambda for one shingle-fold step (a closure, NOT
    a default arg — PySpark counts lambda parameters to bind HOF
    variables, so a bound default would be mistaken for a third arg)."""
    return lambda acc, x: (acc + F.lit(coef) * x) % M61


def duck_shingle_hashes(words_expr: str, n: int = 3) -> str:
    """DuckDB fragment: distinct shingle hashes of a token-list expr."""
    _check_shingle_width(n)
    acc = f"{INIT}::BIGINT"
    for k in range(n):
        acc = f"(({acc}) + {SHINGLE_COEF[k]} * hwl[i + {k}]) % {M61}"
    return (
        f"list_distinct(list_transform(range(1, len({words_expr}) - {n - 2}), "
        f"i -> {acc}))"
    )


def minhash_col(hash_col: Column, j: int) -> Column:
    """j-th minhash permutation of a 61-bit shingle-hash column
    (pre-min): the overflow-free split-linear form (MINHASH_SEEDS61)."""
    a, b, d = MINHASH_SEEDS61[j]
    lo = hash_col.bitwiseAND(F.lit(_L31 - 1))
    hi = F.shiftright(hash_col, 31)
    return (lo * a + hi * b + d) % F.lit(M61).cast("long")


def round4(col: Column) -> Column:
    """Engine-portable 4dp rounding: floor(x*1e4 + 0.5)/1e4.

    Spark's round() goes through BigDecimal's decimal-string view of the
    double while DuckDB rounds the binary double directly — they disagree
    on half-boundaries (e.g. 0.42375). floor over pure IEEE ops is
    bit-identical everywhere. Mirror: duck_round4().
    """
    return F.floor(col * 10000.0 + 0.5) / 10000.0


# --- DuckDB mirrors (oracle side) -----------------------------------------


def duck_round4(expr: str) -> str:
    return f"floor(({expr}) * 10000.0 + 0.5) / 10000.0"

def duck_char_hash(expr: str) -> str:
    """DuckDB SQL fragment computing char_hash(expr) — identical values."""
    return (
        f"list_reduce(list_prepend({INIT}::BIGINT, "
        f"list_transform(string_split({expr}, ''), c -> ascii(c)::BIGINT)), "
        f"(acc, c) -> (acc*31 + c) % {MOD})"
    )


def duck_minhash(hash_expr: str, j: int) -> str:
    # ::BIGINT up front: DuckDB types small literals / INT32 columns as
    # INT32, and the 30-bit multipliers overflow INT32 multiplication
    a, b, d = MINHASH_SEEDS61[j]
    return (
        f"((({hash_expr})::BIGINT & {_L31 - 1}) * {a} + "
        f"(({hash_expr})::BIGINT >> 31) * {b} + {d}) % {M61}"
    )
