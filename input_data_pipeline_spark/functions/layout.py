"""Multi-dimensional storage layout: Z-order (Morton) interleaving.

Sorting a table by one column gives parquet row groups tight min/max spans
on that column only; predicates on any other column skip nothing. Z-order
interleaves the bits of several normalized key columns into one sort key,
so a lexicographic sort clusters rows that are close in EVERY dimension —
the layout trick behind Delta/Iceberg OPTIMIZE ZORDER, built here from
plain column expressions (shift/mask/or stay in whole-stage codegen; no UDF).

Usage::

    z = z_order_key([F.col("user_id"), F.unix_timestamp("ts")], bits=16)
    df.repartition(1).sortWithinPartitions(z).write.parquet(out)

At 100 TB: repartitionByRange on the z-key first, then sortWithinPartitions —
range partitioning spreads the curve across files, in-file sort tightens
row groups; both dimensions then prune at scan time.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _normalize(col: Column, bits: int) -> Column:
    """Rank-preserving squash of a non-negative long into ``bits`` bits by
    dropping low-order bits relative to the column max (computed by the
    caller); here we just mask assuming the caller pre-scaled."""
    return col.bitwiseAND(F.lit((1 << bits) - 1))


def z_order_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each column expression
    into one long sort key. Pure codegen: bits*len(cols) shift/mask/or
    terms. Callers should pre-scale each column into [0, 2^bits) —
    e.g. ``(c - min) / ceil((max - min + 1) / 2^bits)`` — so the masked
    range is rank-preserving."""
    n = len(cols)
    key = F.lit(0).cast("long")
    for d, c in enumerate(cols):
        v = _normalize(c.cast("long"), bits)
        for i in range(bits):
            bit = F.shiftright(v, i).bitwiseAND(1)
            key = key.bitwiseOR(F.shiftleft(bit, i * n + d))
    return key


def scale_to_bits(col: Column, lo: int, hi: int, bits: int = 16) -> Column:
    """Map [lo, hi] linearly onto [0, 2^bits): the pre-scaling step for
    z_order_key. Bounds come from a cheap min/max aggregate (or catalog
    stats) — one tiny action, same spirit as AQE statistics."""
    span = max(hi - lo, 1)
    return ((col - F.lit(lo)) * F.lit((1 << bits) - 1) / F.lit(span)).cast("long")
