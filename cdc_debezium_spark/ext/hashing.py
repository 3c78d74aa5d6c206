"""Engine-agnostic deterministic hashing primitives.

The extension operators (dedup, fingerprinting, simhash, minhash) need
hash functions that produce IDENTICAL values in Spark and in the DuckDB
oracle — built-in hashes differ across engines (xxhash64 vs murmur), so
we define a polynomial rolling hash over characters in pure integer
arithmetic, expressible as a higher-order-function fold on both sides:

    h(s) = fold(c in chars(s)) acc -> (acc*31 + ascii(c)) mod (2^31 - 1),
    acc0 = 7

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

# MinHash seed pairs (a_j odd, b_j arbitrary): sig_j = min (a_j*h + b_j) mod MOD.
# 8 signatures, banded 4x2 for LSH candidate generation.
MINHASH_SEEDS: list[tuple[int, int]] = [(2 * j + 1, 101 * j + 17) for j in range(8)]
N_BANDS = 4
ROWS_PER_BAND = 2

SIMHASH_BITS = 32


def char_hash(col: Column | str) -> Column:
    """Polynomial rolling hash of a string column (JVM-side fold)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.filter(F.split(col, ""), lambda c: c != F.lit("")),
        F.lit(INIT).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % F.lit(MOD).cast("long"),
    )


COMBINE = 1_000_003  # word-hash -> shingle-hash combiner (prime)


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


def shingle_hashes(words: Column, n: int = 3) -> Column:
    """Array of distinct shingle hashes from a token-array column.

    Hashes each WORD once (md5-prefix, codegen builtins), then combines
    n word-hashes per shingle with a polynomial — O(words + shingles)
    per document; shingle strings are never materialized.
    Mirror: duck_shingle_hashes() over an `hwl` word-hash list.
    """
    hw = F.transform(words, word_hash)
    length = F.size(words) - (n - 1)
    parts = [F.slice(hw, k + 1, length) for k in range(n)]
    z = F.transform(parts[0], lambda x: (F.lit(INIT).cast("long") * COMBINE + x) % MOD)
    for p in parts[1:]:
        z = F.zip_with(z, p, lambda acc, x: (acc * COMBINE + x) % MOD)
    return F.when(F.size(words) >= n, F.array_distinct(z)).otherwise(
        F.array().cast("array<long>")
    )


def duck_shingle_hashes(words_expr: str, n: int = 3) -> str:
    """DuckDB fragment: distinct shingle hashes of a token-list expr."""
    acc = f"{INIT}::BIGINT"
    for k in range(n):
        acc = f"(({acc}) * {COMBINE} + hwl[i + {k}]) % {MOD}"
    return (
        f"list_distinct(list_transform(range(1, len({words_expr}) - {n - 2}), "
        f"i -> {acc}))"
    )


def minhash_col(hash_col: Column, j: int) -> Column:
    """j-th minhash permutation of a shingle-hash column (pre-min)."""
    a, b = MINHASH_SEEDS[j]
    return (hash_col * a + b) % F.lit(MOD).cast("long")


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
    a, b = MINHASH_SEEDS[j]
    return f"(({hash_expr}) * {a} + {b}) % {MOD}"
