"""Cross-engine deterministic scalar functions.

The driver's correctness gate runs every query twice — PySpark and DuckDB —
and value-hashes the results, so any synthetic/derived value must be
*bit-identical* across engines. ``md5`` is the common denominator: both
engines produce the same hex digest, and a 15-hex-digit prefix fits a signed
BIGINT exactly the same way on both sides (verified:
``hash64('hello') == 419982666956583591`` in Spark 4.1 and DuckDB 1.0).

Spark's own ``hash``/``xxhash64`` are NOT portable to DuckDB; never use them
in an oracle-checked query.
"""

from __future__ import annotations


def spark_hash64(expr: str) -> str:
    """Spark SQL snippet: 60-bit deterministic hash of a string expression."""
    return f"cast(conv(substr(md5({expr}), 1, 15), 16, 10) as bigint)"


def duck_hash64(expr: str) -> str:
    """DuckDB SQL snippet computing the identical value."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def spark_hash32(expr: str, off: int = 1) -> str:
    """32-bit hash from an 8-hex-char md5 slice at 1-based ``off`` — two
    disjoint slices (off=1, off=9) give two independent 32-bit hashes from
    ONE digest (the 64-bit SimHash halves)."""
    return f"cast(conv(substr(md5({expr}), {off}, 8), 16, 10) as bigint)"


def duck_hash32(expr: str, off: int = 1) -> str:
    """DuckDB twin of :func:`spark_hash32` (identical values)."""
    return f"(('0x' || substr(md5({expr}), {off}, 8))::BIGINT)"


# Long.MIN_VALUE literal that parses on BOTH engines (the bare literal
# overflows before unary negation applies): the bit-63 weight of a 64-bit
# sketch packed into a signed BIGINT.
INT64_MIN_SQL = "(-9223372036854775807 - 1)"
