"""Explicit skew handling: salt-and-replicate equi-join.

north_star calls for explicit head-entity skew control beyond AQE. The hot
spot: one surface form ("USA") appearing in millions of cells joins against
its (small) candidate set — a single hash partition receives the whole hot
key. ``salted_join`` splits every hot key across ``n_salts`` partitions by
salting the probe (big) side deterministically and replicating the build
(small) side once per salt value.

Used by lookup.lookup() for the per-cell × candidate join; AQE skew-join
splitting remains enabled as the runtime backstop at ≥1M rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the hot-key load split over
    n_salts partitions. Deterministic: the big side's salt is a hash of its
    whole row (stable for identical inputs); the small side is exploded once
    per salt value. Result is identical to the plain join (verified in
    tests/test_skew.py)."""
    salt_b = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("_salt", salt_b)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, on + ["_salt"], how).drop("_salt")
