"""Interval (point-in-range) join — SURVEY §2.3 J1/J2/J3.

The reference hand-rolls this as a per-accounting-row loop of
equality+range filters over the metric frame
(step-2/consumer.py:340-394).  The Spark-first formulation is a single
declarative join:

    metrics ⋈ accounting  ON  m.jid = a.jid
                          AND m.ts >= a.start AND m.ts < a.end

written so Catalyst sees the equi-key (`jid`) and plans a hash join
with the range as a residual predicate — a range-condition-only join
would degenerate to BroadcastNestedLoop.

Scale strategy (100 TB metrics):
  - accounting is small (10⁴-10⁵ rows/month) → `broadcast()` the
    parsed accounting side; zero shuffle of the metric table.
  - if the dim side ever outgrows broadcast, the same expression
    compiles to a shuffled hash / sort-merge join on `jid`; time-range
    stays residual.  Month-partitioned storage gives partition pruning
    on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark.functions import normalize_job_id


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    event_key: str,
    interval_key: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    how: str = "inner",
    broadcast_intervals: bool = True,
    inclusive_end: bool = False,
) -> DataFrame:
    """Generic point-in-interval equi-join.

    Exclusive end (`[start, end)`) is the canonical reference semantic
    (step-2/consumer.py:363,393,419 — SURVEY §7.3 trap 5);
    `inclusive_end=True` reproduces the legacy consumer_2 behavior.
    """
    right = F.broadcast(intervals) if broadcast_intervals else intervals
    upper = (
        events[ts_col] <= intervals[end_col]
        if inclusive_end
        else events[ts_col] < intervals[end_col]
    )
    cond = (
        (events[event_key] == intervals[interval_key])
        & (events[ts_col] >= intervals[start_col])
        & upper
    )
    return events.join(right, cond, how)


def bucketed_interval_join(
    events: DataFrame,
    intervals: DataFrame,
    event_key: str,
    interval_key: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 86_400,
    inclusive_end: bool = False,
) -> DataFrame:
    """Interval join for when the interval side is too big to
    broadcast (SURVEY §4.1 fallback): both sides get a coarse time
    bucket — events by truncation, intervals EXPLODED across every
    bucket they overlap — and the join becomes a plain shuffled
    equi-join on (key, bucket) with the exact range as residual.

    Each event matches a given interval in exactly one bucket (the
    event's own), so no dedup is needed.  Interval replication factor
    = interval length / bucket size; pick the bucket near the typical
    interval length (days-long HPC jobs → daily buckets)."""
    bucket_us = int(bucket_seconds) * 1_000_000

    e_us = F.unix_micros(events[ts_col])
    e = events.withColumn("__bucket", (e_us - e_us % bucket_us))

    lo_us = F.unix_micros(intervals[start_col])
    hi_us = F.unix_micros(intervals[end_col])
    # buckets overlapped by [start, end) (or [start, end] inclusive)
    last = hi_us if inclusive_end else hi_us - 1
    lo_bucket = lo_us - lo_us % bucket_us
    # Degenerate intervals (start == end with exclusive end, or end
    # inside the start's bucket) would make sequence() see a
    # descending range and throw; clamp the upper bound so they
    # replicate into one bucket and fall out of the residual range
    # predicate as zero matches instead of crashing the job.
    last_bucket = F.greatest(last - last % bucket_us, lo_bucket)
    i = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(lo_bucket, last_bucket, F.lit(bucket_us))),
    )
    upper = (
        events[ts_col] <= intervals[end_col]
        if inclusive_end
        else events[ts_col] < intervals[end_col]
    )
    cond = (
        (e["__bucket"] == i["__bucket"])
        & (events[event_key] == intervals[interval_key])
        & (events[ts_col] >= intervals[start_col])
        & upper
    )
    return e.join(i, cond, "inner").drop("__bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    lstart: str,
    lend: str,
    rstart: str,
    rend: str,
    bucket_seconds: int = 3600,
    inclusive: bool = False,
) -> DataFrame:
    """Interval×interval overlap join ([ls,le) × [rs,re), overlap iff
    ls < re AND rs < le; `inclusive=True` closes both ends).

    Point-in-interval joins (above) only need one side exploded; a
    true overlap join would otherwise be a pure inequality join —
    BroadcastNestedLoop, quadratic at scale.  Here BOTH sides explode
    to the coarse time buckets they cover and the join is a shuffled
    equi-join on (key, bucket) with the exact overlap as residual.

    A pair overlapping k shared buckets would match k times, so the
    match is pinned to ONE canonical bucket — the bucket containing
    max(lstart, rstart), which every overlapping pair covers on both
    sides exactly once — making the join duplicate-free BY
    CONSTRUCTION: no post-join distinct shuffle.

    Scale: replication factor = interval length / bucket size (pick
    bucket_seconds near the typical interval length); the pair space
    is bounded by per-(key, bucket) co-occurrence, never |L|×|R|.
    """
    bucket_us = int(bucket_seconds) * 1_000_000

    def cover(df, s_col, e_col):
        lo = F.unix_micros(df[s_col])
        hi = F.unix_micros(df[e_col])
        last = hi if inclusive else hi - 1
        lo_b = lo - lo % bucket_us
        last_b = F.greatest(last - last % bucket_us, lo_b)
        return df.withColumn(
            "__bucket",
            F.explode(F.sequence(lo_b, last_b, F.lit(bucket_us))),
        )

    le_ = cover(left, lstart, lend)
    ri = cover(right, rstart, rend)

    lo_max = F.greatest(
        F.unix_micros(left[lstart]), F.unix_micros(right[rstart])
    )
    canonical = lo_max - lo_max % bucket_us
    if inclusive:
        overlap = (left[lstart] <= right[rend]) & (
            right[rstart] <= left[lend]
        )
    else:
        overlap = (left[lstart] < right[rend]) & (
            right[rstart] < left[lend]
        )
    cond = (
        (le_["__bucket"] == ri["__bucket"])
        & (left[left_key] == right[right_key])
        & overlap
        & (le_["__bucket"] == canonical)
    )
    return le_.join(ri, cond, "inner").drop("__bucket")


def join_metrics_to_accounting(
    metrics: DataFrame,
    accounting: DataFrame,
    broadcast_accounting: bool = True,
) -> DataFrame:
    """FRESCO metrics × job accounting with fuzzy-id normalization.

    Both sides' job ids pass through normalize_job_id (trailing-digit
    extraction with original-string fallback, step-2/consumer.py:161-174
    applied at :208,273) and join on the normalized key `jid`; rows
    with start >= end or null bounds are dropped
    (step-2/consumer.py:384-386,210).
    """
    m = metrics.withColumn("jid", normalize_job_id(F.col("Job Id")))
    a = (
        accounting.withColumn("jid", normalize_job_id(F.col("jobID")))
        .filter(
            F.col("start").isNotNull()
            & F.col("end").isNotNull()
            & (F.col("start") < F.col("end"))
        )
        .drop("jobID")
    )
    return interval_join(
        m.drop("Job Id"),
        a,
        event_key="jid",
        interval_key="jid",
        ts_col="Timestamp",
        start_col="start",
        end_col="end",
        broadcast_intervals=broadcast_accounting,
    ).drop(a["jid"])
