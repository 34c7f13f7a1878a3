"""Skew mitigation: salted joins.

AQE's skew-join splitting (enabled in our session factory) handles most
runtime skew; salting is the explicit, planner-independent tool for the
pathological case — a handful of hot keys holding most of the fact rows,
where even a split shuffle partition pins one task per hot key.

``salted_join`` spreads each hot key across ``n_salts`` shuffle
partitions: the fact side gets a pseudo-random salt per row, the
dimension side is replicated once per salt value.  Dimension shuffle
volume grows n_salts-fold — use for genuinely small-ish build sides that
still exceed the broadcast threshold.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt__"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join with the fact side salted ``n_salts`` ways.

    Result equals ``fact.join(dim, on, how)`` for how in
    inner/left/left_outer (each fact row joins exactly one dim replica
    per matching dim row).  Right/full joins would duplicate unmatched
    dim rows per salt — rejected.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    on = list(on)
    fact_cols: List[str] = fact.columns
    dim_cols = [c for c in dim.columns if c not in on]

    salted_fact = fact.withColumn(
        _SALT,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int"),
    )
    replicated_dim = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = salted_fact.join(replicated_dim, on + [_SALT], how)
    return joined.select(*fact_cols, *dim_cols)
