"""Skew-mitigation join: explicit key salting.

AQE's skew-join handling (on in our session defaults) splits oversized
shuffle partitions at runtime, but it only triggers for sort-merge
joins and can't help when one reduce-side KEY is hot (all rows of a
key land in one task by definition). Salting fixes the hot-key case
structurally:

- fact side: extend the join key with a deterministic salt in
  ``[0, num_salts)`` derived by hashing stable row columns — the hot
  key's rows spread over ``num_salts`` reduce tasks;
- dim side: replicate each row ``num_salts`` times (once per salt) so
  every (key, salt) bucket still finds its match.

Join on ``(key, salt)`` produces exactly the plain join's rows: each
fact row matches the single dim replica carrying its salt. Cost: the
dim side shuffles ``num_salts×`` its size — use for fact⋈medium-dim
joins where the dim is too big to broadcast but cheap to replicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    num_salts: int = 8,
    salt_from: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on column ``on`` with salt spreading.

    ``salt_from``: column(s) whose hash picks the salt — any stable
    per-row value (an id column). Defaults to the whole fact row's
    key column plus nothing — callers should pass an id column for
    real spreading when the join key itself is constant per hot key.
    """
    if salt_from is None:
        salt_from = on
    salt_col = (
        F.col(salt_from) if isinstance(salt_from, str) else salt_from
    )
    f = fact.withColumn(_SALT, F.pmod(F.hash(salt_col), F.lit(num_salts)))
    d = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return f.join(d, [on, _SALT], how).drop(_SALT)
