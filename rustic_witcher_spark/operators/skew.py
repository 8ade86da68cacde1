"""Skew mitigation: salted joins for pathological key distributions.

AQE's skew-join splitting (enabled in ``session.get_spark``) handles
most skew by splitting oversized shuffle partitions, but it only works
for sort-merge joins and after a shuffle exists. When one join key
carries a double-digit percentage of a 100 TB fact table, pre-salting
is the deterministic fix: fan the hot key's rows across N subkeys and
replicate the other side N× so every subkey still finds its match.

``salted_join`` salts the LARGE side with a hash of its row content
(never a random() — retries/speculative tasks must salt identically)
and explodes the SMALL side into all N salt values. Result is exactly
the plain inner equi-join, but the shuffle spreads the hot key over N
partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on ``on`` with the shuffle key salted
    N ways. Semantics identical to ``large.join(small, on, how)`` for
    ``inner``/``left`` joins (each large row matches exactly its key's
    rows in small regardless of salt).

    The salt is ``pmod(xxhash64(<all large columns>), n)`` —
    content-derived, so partitioning, task retries, and speculative
    execution all agree; no RNG state exists anywhere.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(n_salts)).cast("int")
    l = large.withColumn("__salt", salt)
    s = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")))
    return l.join(s, on=[*on, "__salt"], how=how).drop("__salt")
