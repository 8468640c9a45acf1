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


def md5_int32(col: Column, seed: int | str = 0) -> Column:
    """32-bit variant (first 8 hex digits) — used by SimHash bit tests."""
    tagged = F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(tagged), 1, 8), 16, 10).cast("long")


def md5_int32_sql(expr: str, seed: int | str = 0) -> str:
    return f"(('0x' || substr(md5('{seed}:' || {expr}), 1, 8))::BIGINT)"


def md5_int32_py(value: str, seed: int | str = 0) -> int:
    return int(hashlib.md5(f"{seed}:{value}".encode()).hexdigest()[:8], 16)
