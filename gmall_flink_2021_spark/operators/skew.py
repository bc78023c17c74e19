"""Skew-handling join utilities.

AQE's skew-join splitting (enabled in session.py) covers moderate
skew at runtime; explicit salting is the deterministic fallback for
pathologically hot keys (the classic 100 TB failure mode: one
mega-customer key lands an entire shuffle partition on one executor).

``salted_join`` replicates the small side N ways and scatters the big
side's hot keys across N salt buckets, so the shuffle spreads a hot
key over N tasks. Results are identical to a plain equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join big⋈small on ``key`` with an N-way salt.

    big rows get a random-but-deterministic salt (hash of the full
    row's key + a spread column via pmod of xxhash); small rows are
    exploded into all N salts. Use when one/few keys dominate the
    distribution; for even keys, prefer a plain join.
    """
    salt = F.pmod(F.xxhash64(F.col(key), F.monotonically_increasing_id()),
                  F.lit(n_salts))
    big_s = big.withColumn("_salt", salt.cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")
