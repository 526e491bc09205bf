"""Range (point-in-interval) join — the second custom temporal operator
(with operators/asof.py), built as a composition of DataFrame ops.

Semantics: for each left row (key, ts), return every right row with the
same key whose half-open interval [start, end) contains ts.

The naive plan — equi-join on key + range residual — is correct but at
web scale one hot key (e.g. one crawl host) makes the per-key pair
space quadratic. The scalable form adds a TIME BUCKET to the equi key:
points join on (key, floor(ts/W)); intervals are replicated once per
bucket they span (``sequence`` + ``explode``, native). The shuffle key
becomes (key, bucket), so pair space is bounded by per-bucket density,
and the residual ``start <= ts < end`` keeps exactness. Pick W near the
typical interval length: replication factor ≈ len/W + 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_point_in_interval(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts: str,
    start: str,
    end: str,
    bucket_seconds: int = 86_400 * 30,
) -> DataFrame:
    """All (point, interval) matches: equal ``key`` and
    ``start <= ts < end``. Output = all point columns + all interval
    columns (minus its key column). Timestamps may be TIMESTAMP or
    TIMESTAMP_NTZ; bucketing uses epoch microseconds.
    """
    us = 1_000_000 * bucket_seconds
    p = points.withColumn(
        "__bucket",
        F.floor(F.unix_micros(F.col(ts).cast("timestamp")) / us).cast("long"),
    )
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start).cast("timestamp")) / us).cast(
                    "long"
                ),
                # end is exclusive: the last covered bucket is end-1us
                F.floor(
                    (F.unix_micros(F.col(end).cast("timestamp")) - 1) / us
                ).cast("long"),
            )
        ),
    )
    ikey_cols = [c for c in intervals.columns if c != key]
    cond = (
        (p[key] == i[key])
        & (p["__bucket"] == i["__bucket"])
        & (p[ts] >= i[start])
        & (p[ts] < i[end])
    )
    return (
        p.join(i, cond)
        .select(*[p[c] for c in points.columns], *[i[c] for c in ikey_cols])
    )
