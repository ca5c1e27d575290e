"""Salted join for skewed keys.

When one join key carries a disproportionate share of rows, the
shuffle hashes every row of that key into ONE reducer partition and
the stage runs at the speed of its hottest key. Salting breaks the
hot key into ``num_salts`` sub-keys: the big side gets a deterministic
salt derived from a row-unique column, the small side is replicated
once per salt value, and the join key becomes (key, salt) — the hot
key now spreads over ``num_salts`` partitions.

Result-identical to the plain join (every big-side row still meets
every matching small-side row exactly once), so the DuckDB oracle is
the unsalted SQL join. AQE's skew-join split handles moderate skew
automatically; explicit salting is the deterministic fallback when a
single key exceeds what one executor can hold — the 100 TB insurance
policy. Complements broadcast (for small dims) — salting is for when
BOTH sides are too big to broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_BIG = "_salt_b"
SALT_SMALL = "_salt_s"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Column,
    salt_source: str,
    num_salts: int = 16,
    how: str = "inner",
    join_hint: str | None = "shuffle_hash",
) -> DataFrame:
    """Join ``big`` to ``small`` on ``on`` with the big side salted.

    ``salt_source`` must be a row-unique (or near-unique) column of
    ``big`` — the salt is xxhash64(salt_source) % num_salts, so it is
    deterministic across retries/runs (no rand(): a recomputed task
    must salt identically or rows silently drop). ``join_hint`` is
    applied to the replicated small side; the default shuffle_hash
    keeps the demo honest (without it Catalyst would happily broadcast
    a small test table and the salt would be dead weight).
    """
    b = big.withColumn(
        SALT_BIG,
        F.pmod(F.xxhash64(F.col(salt_source)), F.lit(num_salts)).cast("int"),
    )
    s = small.withColumn(
        SALT_SMALL,
        F.explode(F.array(*[F.lit(i) for i in range(num_salts)])),
    )
    if join_hint:
        s = s.hint(join_hint)
    joined = b.join(s, on & (F.col(SALT_BIG) == F.col(SALT_SMALL)), how)
    return joined.drop(SALT_BIG, SALT_SMALL)
