"""Deterministic hash primitive shared by all fake generators.

``h = md5(f"{seed}|{salt}|" + coalesce(value, NULL_MARKER))`` yields 32
hex chars; independent 8-hex-char slices of it act as four independent
32-bit uniform draws. This replaces the reference's per-value
SipHash-seeded StdRng (ref: transformator.rs:95-99,122-144) with a
construction that is (a) a pure Catalyst expression — whole-stage
codegen, no Python in the hot path — and (b) renderable as identical
ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rustic_witcher_spark.functions.wordlists import NULL_MARKER

# ---------------------------------------------------------------- Spark side


def md5_hex(value: Column, seed: int, salt: str) -> Column:
    """32-hex-char deterministic digest of (seed, salt, value)."""
    return F.md5(F.concat(F.lit(f"{seed}|{salt}|"), F.coalesce(value, F.lit(NULL_MARKER))))


def hash_slice(hex_digest: Column, start: int) -> Column:
    """8 hex chars starting at 1-based ``start`` → non-negative long < 2^32."""
    return F.conv(F.substring(hex_digest, start, 8), 16, 10).cast("long")


def hash64(value: Column, seed: int, salt: str) -> Column:
    """60-bit deterministic hash of (seed, salt, value) as a long."""
    return F.conv(F.substring(md5_hex(value, seed, salt), 1, 15), 16, 10).cast("long")


# --------------------------------------------------------------- DuckDB side
# Same constructions rendered as DuckDB SQL over an expression string.


def sql_md5_hex(value_expr: str, seed: int, salt: str) -> str:
    return f"md5('{seed}|{salt}|' || coalesce(({value_expr})::VARCHAR, chr(1)))"


def sql_hash_slice(hex_expr: str, start: int) -> str:
    return f"(('0x' || substr({hex_expr}, {start}, 8))::BIGINT)"


def sql_hash64(value_expr: str, seed: int, salt: str) -> str:
    return f"(('0x' || substr({sql_md5_hex(value_expr, seed, salt)}, 1, 15))::BIGINT)"
