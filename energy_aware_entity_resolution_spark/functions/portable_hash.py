"""Cross-engine portable hashing.

The engine's hot paths use Spark-native xxhash64 (JVM, fastest). But
operators whose results must be reproducible by OTHER engines (the
DuckDB correctness oracle, downstream consumers of dedup fingerprints)
use an md5-derived 60-bit hash that any SQL engine can compute:

  Spark : conv(substr(md5(x), 1, 15), 16, 10)  -> bigint
  DuckDB: ('0x' || substr(md5(x), 1, 15))::bigint
  Python: int(hashlib.md5(x).hexdigest()[:15], 16)

15 hex chars = 60 bits: always positive in signed int64, and products
with 31-bit coefficients stay under 2^63 in the (a*x+b) mod p
universal-hash family below (both engines error/ wrap differently on
int64 overflow, so staying under 2^62 is load-bearing).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE31 = 2147483647  # 2^31 - 1


def md5_hash60_col(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_hash60_py(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def md5_hash60_sql(expr: str) -> str:
    """DuckDB SQL fragment computing the same value."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::bigint)"


def perm_coeff_a(i: int) -> int:
    """Deterministic odd 31-bit multiplier for permutation i — a plain
    arithmetic formula so SQL oracles can derive it from i inline."""
    return ((1103515245 * (i + 1) + 12345) % (1 << 31)) | 1


def perm_coeff_b(i: int) -> int:
    return (69069 * (i + 1) + 1) % (1 << 31)


def perm_hash_col(x31: Column, i: int) -> Column:
    """h_i(x) = (a_i * x + b_i) mod (2^31-1), x already reduced mod 2^31."""
    return (F.lit(perm_coeff_a(i)) * x31 + F.lit(perm_coeff_b(i))) % F.lit(MERSENNE31)


def perm_hash_sql(x31_expr: str, i_expr: str) -> str:
    """Same formula with the permutation index as a SQL expression."""
    i64 = f"(({i_expr})::BIGINT + 1)"
    a = f"((((1103515245::BIGINT * {i64} + 12345) % 2147483648) | 1))"
    b = f"((69069::BIGINT * {i64} + 1) % 2147483648)"
    return f"(({a} * ({x31_expr})::BIGINT + {b}) % 2147483647)"
