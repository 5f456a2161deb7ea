"""Bloom-filter semi-join prefilter: cut shuffle bytes on fact ⋈ dim.

At 100 TB the probe side of a selective join ships every row through
the exchange only for most of them to find no match. A Bloom filter
built from the build side's keys and broadcast to the probe scan drops
non-matching rows *before* the shuffle; the exact join afterwards
removes the false positives, so results are identical to the plain
join while shuffle volume shrinks to ~(selectivity + fp_rate) of the
probe. Spark's own runtime bloom (spark.sql.optimizer.runtime.
bloomFilter.enabled) does this opportunistically; this operator is the
explicit, tunable form — usable where the optimizer declines (e.g.
non-trivial build plans, or to pin the behavior in tests).

Implementation is pure DataFrame ops, no UDF:
- build: k = ``n_hashes`` positions per key via seeded xxhash64,
  OR-folded into a packed bitmap with a groupBy(word) / bit_or —
  map-side partial aggregation makes this one cheap pass; the driver
  collects only the bitmap (``n_bits/64`` longs, independent of row
  count — O(bitmap), never O(data)).
- probe: the bitmap is embedded as a single array<long> literal and
  each row tests k bits with shift/AND expressions — whole-stage
  codegen, no Python, no broadcast-variable plumbing.

Sizing: fp ≈ (1 - e^(-k·n/m))^k; the default m = 2^20 bits holds ~73k
keys at k=5 under 1% fp. At 100 TB, size m to the build-side NDV and
ship the bitmap via ``F.lit`` exactly as here (a 1 MiB literal is
still cheaper than shuffling a fact table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_bitmap(
    keys: DataFrame,
    key: str,
    *,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> list[int]:
    """Build a packed Bloom bitmap (list of ``n_bits/64`` longs) from a
    key column. One aggregation job; driver memory is O(n_bits)."""
    if n_bits % 64 != 0:
        raise ValueError("n_bits must be a multiple of 64")
    positions = F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), F.col(key)), F.lit(n_bits))
            for i in range(n_hashes)
        ]
    )
    words = (
        keys.where(F.col(key).isNotNull())
        .select(F.explode(positions).alias("pos"))
        .select(
            F.shiftright("pos", 6).alias("word_idx"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.col("pos").bitwiseAND(F.lit(63)).cast("int"),
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    bitmap = [0] * (n_bits // 64)
    for row in words:
        bitmap[row["word_idx"]] = row["word"]
    return bitmap


def bloom_might_contain(
    key: Column,
    bitmap: list[int],
    *,
    n_hashes: int = 5,
) -> Column:
    """Membership test column: true for every inserted key (no false
    negatives), true with probability ~fp for others. NULL keys test
    false (mirrors equi-join semantics, which never match NULL)."""
    n_bits = len(bitmap) * 64
    words = F.lit(bitmap)
    cond = key.isNotNull()
    for i in range(n_hashes):
        pos = F.pmod(F.xxhash64(F.lit(i), key), F.lit(n_bits))
        word = F.element_at(words, (F.shiftright(pos, 6) + 1).cast("int"))
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), pos.bitwiseAND(F.lit(63)).cast("int")
        )
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    *,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
    bitmap: list[int] | None = None,
) -> DataFrame:
    """``probe LEFT SEMI JOIN build`` with a Bloom prefilter on the
    probe side. Exact: the final semi join removes false positives.

    Single build-side pass: the distinct key set is cached, the bitmap
    aggregation materializes that cache, and the exact semi join reads
    the cache instead of rescanning the build plan. Pass a pre-built
    ``bitmap`` (from :func:`bloom_bitmap`) to skip the build job
    entirely — the way to amortize one filter across many probes.

    Cache lifetime: when ``bitmap is None`` the cached key set must
    outlive this call (the returned join is lazy), so it is NOT
    unpersisted here — it lives until LRU eviction or session end. A
    caller issuing many one-shot filters should use the explicit
    lifecycle instead: build the keys DataFrame itself, pass
    ``bitmap=bloom_bitmap(keys, ...)`` and ``build=keys``, and
    unpersist after its action completes.
    """
    build_key = build_key or probe_key
    keys = (
        build.select(F.col(build_key).alias(probe_key))
        .where(F.col(probe_key).isNotNull())
        .distinct()
    )
    if bitmap is None:
        keys = keys.cache()
        bitmap = bloom_bitmap(keys, probe_key, n_bits=n_bits, n_hashes=n_hashes)
    prefiltered = probe.where(
        bloom_might_contain(F.col(probe_key), bitmap, n_hashes=n_hashes)
    )
    return prefiltered.join(keys, on=probe_key, how="left_semi")
