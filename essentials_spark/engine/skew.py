"""Hub-vertex skew mitigation: salted joins.

Power-law hubs are why the reference ships four advance load
balancers (operators/configs.hxx:31-39, advance/merge_path.hxx): a
single high-degree vertex must not serialize on one worker. Spark
equivalent: a join keyed on a hub vertex puts that vertex's entire
adjacency in one shuffle partition. Fix: split each key into
``n_salts`` sub-keys on the big (edge) side and replicate the small
(frontier/state) side once per salt — the hub's rows spread over
``n_salts`` partitions. AQE's skewJoin (enabled in session.py) is the
runtime backstop; salting is the explicit, plan-time mitigation the
north rule requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    small: DataFrame,
    big: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
    big_salt_cols: list[str] | None = None,
) -> DataFrame:
    """Join ``small`` x ``big`` on ``on`` with key salting.

    ``big`` rows get a deterministic salt derived from their non-key
    columns (so a hub key's rows spread uniformly); ``small`` is
    exploded n_salts ways. Output equals the unsalted join for the
    supported modes. Right/full outer joins are rejected: the exploded
    small side would emit each unmatched small-side row n_salts times.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} (got {how!r}): outer modes would "
            "duplicate unmatched small-side rows once per salt"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salt_src = big_salt_cols or [c for c in big.columns if c not in keys]
    big_s = big.withColumn("_salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(n_salts)).cast("int"))
    small_s = small.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return big_s.join(small_s, keys + ["_salt"], how).drop("_salt")
