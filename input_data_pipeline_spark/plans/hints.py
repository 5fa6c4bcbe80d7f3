"""Size-guarded join-strategy hints.

SURVEY §4 sanctions broadcasting every TPC-H dimension except
lineitem/orders/events, and at test scales (sf0.001-0.1) that is always
right. But ``part``/``supplier``/``customer`` scale LINEARLY with SF —
at the 100 TB target (SF ≈ 100k) ``part`` is ~20 B rows, and a hard
``F.broadcast(part)`` forces a build that cannot fit on any executor
while simultaneously forfeiting AQE's size-based fallback (an explicit
hint overrides ``spark.sql.autoBroadcastJoinThreshold`` AND AQE's
runtime strategy switch).

``maybe_broadcast`` keeps the sf0.1 plans byte-identical (the hint still
fires, so the star probes stay single-stage) while letting the same
unedited code survive a 100× scale-up: the guard reads Catalyst's own
``sizeInBytes`` estimate for the optimized logical plan — file-size
stats propagated through filters/projections, computed driver-side with
NO job — and only attaches the hint when the estimated build side fits
comfortably in executor memory. Above the bound the frame is returned
unhinted and the strategy falls to AQE's runtime decision (broadcast if
the POST-shuffle measured size is small, sort-merge otherwise), which is
exactly the behavior a 1000-executor deployment wants.

``region``/``nation`` (5/25 rows at every SF) and aggregate-derived
one-row frames keep their unconditional ``F.broadcast`` hints — their
size is a constant of the schema, not of SF.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Default guard: 512 MiB estimated. Catalyst's parquet estimates are
# compressed-file-size based, so the in-memory build is larger — but the
# driver-side broadcast limit is 8 GB and executors here have multi-GB
# heaps; 512 MiB estimated keeps an order-of-magnitude safety margin
# while still hinting every dim up to roughly SF 100 (part at SF 100
# ≈ 20M rows ≈ 2.3 GB raw ≈ >512 MiB estimated → unhinted → AQE).
DEFAULT_BROADCAST_BOUND = 512 << 20


def maybe_broadcast(
    df: DataFrame,
    max_bytes: int = DEFAULT_BROADCAST_BOUND,
    gauge: DataFrame | None = None,
) -> DataFrame:
    """Attach a broadcast hint only when Catalyst's size estimate allows.

    Reads ``optimizedPlan().stats().sizeInBytes`` — a driver-side
    estimate (no Spark job) derived from file statistics and filter
    selectivity. Returns ``F.broadcast(df)`` when the estimate is at or
    under ``max_bytes``; otherwise returns ``df`` unhinted so AQE's
    runtime size measurement picks the join strategy. If stats are
    unavailable (e.g. a plan node that reports the BigInt max sentinel),
    the frame is returned unhinted — "don't know" must never force a
    broadcast build.

    ``gauge``: optional frame whose estimate stands in for ``df``'s.
    Catalyst's size-only stats visitor MULTIPLIES child sizes at a join
    node, so a dimension enriched through a 25-row ``nation`` hop gets a
    wildly inflated estimate even though an FK equi-join cannot exceed
    the dimension's own row count. Passing the SF-scaling base table
    (``supplier``/``customer``) as the gauge anchors the decision to the
    quantity that actually grows with data size — exactly what the
    100 TB stance needs — while the multiplied join estimate would
    otherwise suppress the hint already at sf0.1."""
    probe = gauge if gauge is not None else df
    try:
        raw = probe._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        # py4j converts java.math.BigInteger to a Python int when it
        # fits; very large estimates (the unknown-stats sentinel) can
        # surface as the Java object — handle both
        est = int(raw if isinstance(raw, int) else raw.toString())
    except Exception:
        return df
    if est < 0 or est > max_bytes:
        return df
    return F.broadcast(df)
