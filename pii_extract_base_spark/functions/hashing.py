"""The ONE portable hash kernel every oracle-replayable randomized
operator builds on: ``md5(salt ‖ key)`` → first 8 hex chars → 32-bit
integer → ``% mod``.

Why this exact shape: md5 exists with identical semantics on Spark
and DuckDB (xxhash64 does not), a fixed-width hex slice is
order-isomorphic to its integer value, and 2³² % mod has modulo bias
≤ mod/2³² (quantified per call site).  DuckDB rendering of the same
kernel: ``('0x' || substr(md5(s), 1, 8))::BIGINT % mod``.

Call sites (keep them on this helper — a drifted copy silently breaks
that operator's oracle parity): count-min sketch rows
(`operators/sketch`), Bloom-filter probes (`operators/bloom`),
sampling buckets (`functions/sampling`).
"""

from pyspark.sql import Column, functions as F


def md5_mod(key: Column, mod: int, salt: str = "") -> Column:
    """Deterministic value in [0, mod) from a STRING column.

    ``salt`` derives independent hash functions from one kernel (the
    count-min/Bloom ``i``-th probe); '' hashes the key alone."""
    s = F.concat(F.lit(salt), key) if salt else key
    h = F.md5(s)
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(mod)


def md5_mod_sql(expr: str, mod: int, salt: str = "") -> str:
    """DuckDB rendering of the same kernel (same bytes hashed)."""
    s = f"'{salt}' || {expr}" if salt else expr
    return f"(('0x' || substr(md5({s}), 1, 8))::BIGINT % {mod})"
