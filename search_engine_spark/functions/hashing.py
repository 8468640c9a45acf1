"""Cross-engine deterministic hashing helpers.

MinHash / SimHash / LSH need hash functions that are reproducible both in
Spark (built-ins, JVM-side) and in the DuckDB oracle SQL used by the
correctness gate. xxhash64/murmur differ between engines, so we derive
integer hashes from md5 hex digests, which are identical everywhere:

    h_seed(s) = int(md5(f"{seed}:{s}")[:15], 16)        # 60 bits, fits int64

Spark:  conv(substring(md5(concat('{seed}:', col)), 1, 15), 16, 10) :: long
DuckDB: ('0x' || substr(md5('{seed}:' || col), 1, 15)) :: BIGINT

This is the slow-but-portable definition used for gate parity; at
production scale the same operators would swap in xxhash64 (one line) since
no cross-engine oracle is involved.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, functions as F

HEX_DIGITS = 15  # 60 bits < 2^63: safe for BIGINT in both engines


def md5_int(col: Column, seed: int | str = 0) -> Column:
    """Spark column: 60-bit integer hash of `{seed}:{value}` via md5."""
    tagged = F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(tagged), 1, HEX_DIGITS), 16, 10).cast("long")


def md5_int_sql(expr: str, seed: int | str = 0) -> str:
    """DuckDB SQL fragment mirroring ``md5_int``."""
    return (
        f"(('0x' || substr(md5('{seed}:' || {expr}), 1, {HEX_DIGITS}))::BIGINT)"
    )


def md5_int_py(value: str, seed: int | str = 0) -> int:
    """Pure-Python mirror (for oracles/tests)."""
    return int(hashlib.md5(f"{seed}:{value}".encode()).hexdigest()[:HEX_DIGITS], 16)


# --- two-hash family (Kirsch & Mitzenmacher 2006): k hash functions from
# ONE digest, h_j = h1 + j*h2. h1 is 60-bit, h2 32-bit, so h1 + j*h2 stays
# < 2^63 for any small j — no overflow, no modulo, identical in both
# engines. Cuts the per-row digest count from k to 1 (the MinHash hot path).

MH_SEED = "mh"


def md5_two_hash_cols(col: Column, num: int) -> "list[Column]":
    """Spark: [h_0 … h_{num-1}] columns, one md5 evaluation feeding all."""
    hx = F.md5(F.concat(F.lit(f"{MH_SEED}:"), col))
    h1 = F.conv(F.substring(hx, 1, HEX_DIGITS), 16, 10).cast("long")
    h2 = F.conv(F.substring(hx, HEX_DIGITS + 1, 8), 16, 10).cast("long")
    return [(h1 + F.lit(j) * h2).alias(f"h{j}") for j in range(num)]


def md5_two_hash_sql(expr: str) -> tuple[str, str]:
    """DuckDB fragments (h1, h2) over ``expr`` — combine as h1 + j*h2."""
    hx = f"md5('{MH_SEED}:' || {expr})"
    return (
        f"(('0x' || substr({hx}, 1, {HEX_DIGITS}))::BIGINT)",
        f"(('0x' || substr({hx}, {HEX_DIGITS + 1}, 8))::BIGINT)",
    )


def md5_two_hash_py(value: str, j: int) -> int:
    hx = hashlib.md5(f"{MH_SEED}:{value}".encode()).hexdigest()
    h1 = int(hx[:HEX_DIGITS], 16)
    h2 = int(hx[HEX_DIGITS : HEX_DIGITS + 8], 16)
    return h1 + j * h2


def md5_int32(col: Column, seed: int | str = 0) -> Column:
    """32-bit variant (first 8 hex digits) — used by SimHash bit tests."""
    tagged = F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(tagged), 1, 8), 16, 10).cast("long")


def md5_int32_sql(expr: str, seed: int | str = 0) -> str:
    return f"(('0x' || substr(md5('{seed}:' || {expr}), 1, 8))::BIGINT)"


def md5_int32_py(value: str, seed: int | str = 0) -> int:
    return int(hashlib.md5(f"{seed}:{value}".encode()).hexdigest()[:8], 16)


# second 32-bit word of the same digest — with md5_int32 this gives a
# 64-bit hash as two sign-safe halves (SimHash uses both)

def md5_int32_hi(col: Column, seed: int | str = 0) -> Column:
    tagged = F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(tagged), 9, 8), 16, 10).cast("long")


def md5_int32_hi_sql(expr: str, seed: int | str = 0) -> str:
    return f"(('0x' || substr(md5('{seed}:' || {expr}), 9, 8))::BIGINT)"


def md5_int32_hi_py(value: str, seed: int | str = 0) -> int:
    return int(hashlib.md5(f"{seed}:{value}".encode()).hexdigest()[8:16], 16)
