"""Skew-mitigation: salted join for heavy-hitter keys.

AQE's skew-join split (on in `session.get_spark`) handles most skew by
splitting oversized partitions at runtime — but it only applies to
sort-merge joins and after-the-fact. For *known* heavy-hitter keys (a null
surrogate, a default user, a dominant tenant) explicit salting is the
deterministic fix:

- the skewed (large) side gets a random salt in [0, salt); its hot key's
  rows spread across ``salt`` partitions instead of one;
- the small side is replicated ``salt``× (explode over the salt range) so
  every salted partition finds its match;
- join key becomes (key, salt) — same result set, no hot partition.

Replication multiplies the small side, so salt only the keys that need it:
``salted_join`` takes an optional ``hot_keys`` list and salts ONLY those
rows (union of salted-hot + unsalted-cold paths), keeping replication cost
proportional to the skew, not the table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    hot_keys: Sequence | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to heavy-hitter keys in ``large``.

    With ``hot_keys`` given, only those keys pay the replication cost; all
    other rows join on a single salt bucket. Without it, every key is
    salted (full ``salt``× replication of ``small``).
    """
    if hot_keys is not None:
        hot = F.col(on).isin(list(hot_keys))
        large_salt = F.when(
            hot, (F.rand(seed=42) * salt).cast("int")
        ).otherwise(F.lit(0))
        small_range = F.when(hot, F.sequence(F.lit(0), F.lit(salt - 1))).otherwise(
            F.array(F.lit(0))
        )
    else:
        large_salt = (F.rand(seed=42) * salt).cast("int")
        small_range = F.sequence(F.lit(0), F.lit(salt - 1))

    l_salted = large.withColumn(_SALT, large_salt)
    s_salted = small.withColumn(_SALT, F.explode(small_range))
    out = l_salted.join(s_salted, on=[on, _SALT], how=how)
    return out.drop(_SALT)
