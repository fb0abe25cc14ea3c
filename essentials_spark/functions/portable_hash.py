"""Portable (Spark ⇔ ANSI-SQL) hash family for oracle-checkable dedup.

The fast paths in dedup/ and ann/ use Spark's ``xxhash64`` — JVM-side
and cheap, but not reproducible in DuckDB, so queries built on it can
only be rows-count-checked by the correctness gate. This module
provides a second hash family computable IDENTICALLY in Spark and in
portable SQL, so the full MinHash/SimHash/LSH pipelines become
value-checkable end-to-end:

- ``md5`` exists in both engines and produces identical hex strings;
- 60 bits of it parse to a positive BIGINT both ways
  (Spark ``conv(substr(md5(x),1,15),16,10)``,
  DuckDB ``('0x' || substr(md5(x),1,15))::BIGINT``);
- affine permutations ``(a*h + b) mod 2147483647`` (31-bit Mersenne
  prime) with the multiplier bounded so products stay < 2^62 — no
  overflow in either engine (Spark wraps silently, DuckDB throws;
  staying in range sidesteps both).

Same trick the SSSP oracle already uses for deterministic edge weights
(md5-derived); constants below are the single source of truth for both
the Spark expressions and the generated oracle SQL.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

# 31-bit Mersenne prime modulus for the affine MinHash permutations
MERSENNE31 = 2_147_483_647
# shingle hashes are reduced to 30 bits so a*h < 2^61 (no bigint overflow)
H30 = 1 << 30

_rng = random.Random(20260816)
# affine permutation constants (fixed seed -> identical across runs,
# inlined as literals into BOTH the Spark plan and the oracle SQL)
PERM_A = [_rng.randrange(1, MERSENNE31) for _ in range(256)]
PERM_B = [_rng.randrange(0, MERSENNE31) for _ in range(256)]


# ---------------------------------------------------------------- Spark side

def md5_int60(col: Column) -> Column:
    """First 60 bits of md5(col) as a positive BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def perm_hash(h30: Column, i: int) -> Column:
    """i-th affine permutation of a 30-bit hash (31-bit output)."""
    return (F.lit(PERM_A[i]) * h30 + F.lit(PERM_B[i])) % F.lit(MERSENNE31)


def plane_components(tables: int, bits: int, dim: int) -> list[list[list[float]]]:
    """Deterministic random-hyperplane components ``planes[t][b][i]``.

    Values are k/1000 for k in [-1000, 1000] — short exact decimal
    literals that parse to the SAME double in Spark and DuckDB, so the
    sign of every projection (hence every LSH bucket) is reproducible
    in the oracle SQL. Seeded by the (tables, bits, dim) shape only —
    independent of process state."""
    rng = random.Random(f"rh-planes:{tables}:{bits}:{dim}")
    return [
        [[(rng.randrange(2001) - 1000) / 1000.0 for _ in range(dim)] for _ in range(bits)]
        for _ in range(tables)
    ]


# ------------------------------------------------------------------ SQL side

def sql_md5_int60(expr: str) -> str:
    """Portable-SQL (DuckDB) twin of :func:`md5_int60`."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def sql_perm_hash(h30_expr: str, i: int) -> str:
    """Portable-SQL twin of :func:`perm_hash`."""
    return f"(({PERM_A[i]} * {h30_expr} + {PERM_B[i]}) % {MERSENNE31})"
