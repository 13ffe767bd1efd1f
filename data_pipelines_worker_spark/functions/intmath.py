"""Engine-portable exact integer arithmetic column helpers.

These exist because Spark's ``/`` on longs goes through doubles and its
``div`` truncates toward zero while DuckDB's ``//`` floors — so any
oracle-gated integer division must be written in a form whose result is
identical under BOTH division semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_floordiv(a: Column, b: Column | int) -> Column:
    """Floor division, exact on every engine for |a| within 2^53·b.

    ``a − pmod(a, b)`` is a non-negative-remainder multiple of ``b``, so
    the double divide is exact (the quotient is an integer ≤ 2^53) and
    truncation vs floor semantics cannot differ. For non-negative ``a``
    this equals both Spark's ``div`` and DuckDB's ``//``; for negative
    ``a`` it equals floor division (DuckDB ``//``), which is why the
    oracle twin of a signed use must spell
    ``(a - ((a % b) + b) % b) // b``.
    """
    return ((a - F.pmod(a, b)) / b).cast("long")


def md5_fold60(col: Column) -> Column:
    """The house engine-portable 60-bit string hash: fold the first 15
    hex chars of md5 into a BIGINT. DuckDB twin (must stay
    character-for-character in semantics):
    ``CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)``.

    This is the ONLY Spark-side spelling — new hash uses import this
    helper rather than re-inlining the conv/substring/md5 chain (each
    inline copy is a chance to drift on a bit-exactness-critical
    expression)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
