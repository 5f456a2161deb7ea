"""Skew-aware join: salting for hot keys.

AQE's skew-join handling (enabled by the session factory) covers most
cases by splitting oversized shuffle partitions. Salting is the
explicit fallback for *single hot keys* that AQE can't split further —
e.g. a null-ish sentinel key or a power-law entity joined against a
medium table that can't be broadcast.

Mechanics: replicate each right row R times (salt 0..R-1); spray left
rows across the R salts with a deterministic per-row hash; join on
(key, salt). The hot key's rows now land in R partitions instead of
one. Cost: right side grows R× — use only when the right side is much
smaller than the hot key's row count, and prefer broadcast when the
right side fits in memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over salt buckets.

    Semantics match ``left.join(right, on, how)`` for how in
    {inner, left}: every left row carries exactly one salt and every
    right row exists under all salts, so matches are preserved exactly
    once and left rows without a match survive a left join.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_buckets)
    ).cast("int")
    l_salted = left.withColumn("_salt", salt)
    r_salted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    # Pin a sort-merge join: salting exists precisely because the right
    # side can NOT be broadcast — if Catalyst broadcasts it anyway
    # (small-looking stats), the (key, salt) spray never reaches a
    # shuffle and the operator silently degrades to a worse broadcast
    # join (R× replicated build side).
    return l_salted.join(r_salted.hint("merge"), on + ["_salt"], how).drop("_salt")
