"""Temporal operators: distributed as-of join and gap sessionization.

Beyond-the-reference pipeline operators (SURVEY.md §2 Table B scope):
a 100-TB event/transcript pipeline constantly needs "attach the most
recent X before this row" (as-of join — the canonical operator Spark
lacks natively; semantics follow pandas ``merge_asof`` backward mode
and the SQL ``ASOF JOIN``) and "split a user's stream into visits
separated by idle gaps" (sessionization).

Both are pure DataFrame compositions — no Python kernels:

* ``asof_join`` uses the union-and-window technique: tag right rows
  0 and left rows 1, union them, sort each key's rows by
  (event-time, tag, order-col) inside a single hash shuffle on the
  key, and carry the last non-null right payload forward with
  ``last(..., ignorenulls=True)``.  One shuffle, no join explosion,
  no per-left-row probe — the classic scalable formulation (the same
  shape Flink uses for event-time temporal joins).  Ties at equal
  event-time resolve right-before-left (backward INCLUSIVE), and
  among equal-time right rows the largest order-col wins, so results
  are deterministic and exactly reproducible in portable SQL.
* ``sessionize`` / ``session_stats`` use lag + running-sum windows
  over the same single per-key shuffle; the follow-up per-session
  aggregate needs no second exchange because hash partitioning on
  the key already clusters (key, session_idx).

Scale notes: both operators shuffle once on the join/session key.
Skewed keys (one user with millions of events) serialize inside one
partition's sort — at production scale feed AQE skew handling or
pre-split hot keys upstream; there is no cross-key dependency.
All event-time arithmetic is integral epoch microseconds derived
TZ-invariantly (``_epoch_us``) — never session-TZ-rendered timestamps
(see CLAUDE.md TZ gotcha).  ``unix_micros`` is unusable here: the
testdata columns are TIMESTAMP_NTZ, and casting NTZ to TIMESTAMP
re-interprets the wall clock in the session TZ.  Instead
``unix_timestamp`` (empirically TZ-invariant on NTZ, matches DuckDB
``floor(epoch(ts))``) supplies whole seconds and the fractional part
comes from ``date_part('SECOND') % 1`` — verified equal to DuckDB
``epoch_us`` under UTC and Asia/Tokyo.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS_US = "_asof_ts_us"
_TAG = "_asof_tag"
_ORD = "_asof_ord"
_R_TS = "_asof_right_ts_us"


def _epoch_us(col: Column) -> Column:
    """Integral epoch microseconds, TZ-invariant for TIMESTAMP_NTZ
    (and plain TIMESTAMP) columns — see module docstring."""
    frac = (F.date_part(F.lit("SECOND"), col) % F.lit(1)) * F.lit(1_000_000)
    return (F.unix_timestamp(col) * F.lit(1_000_000)
            + frac.cast("long")).cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    right_order: str,
    tolerance_us: Optional[int] = None,
    lag_col: str = "asof_lag_us",
) -> DataFrame:
    """Backward-inclusive as-of join, one shuffle on ``on``.

    For every left row, attach ``right_cols`` from the right row with
    the greatest (event-time, ``right_order``) among rows of the same
    ``on`` key whose event-time is <= the left row's event-time.
    Rows with no qualifying match (or a match older than
    ``tolerance_us``) get NULLs.  ``lag_col`` carries the match age in
    integral microseconds (NULL when unmatched / out of tolerance).

    ``right_order`` must be a deterministic tiebreaker (e.g. a unique
    id) so equal-timestamp right rows resolve identically here and in
    any SQL oracle re-statement.
    """
    right_cols = list(right_cols)
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"right_cols collide with left columns: {sorted(clash)}; "
            "alias the right side before joining"
        )
    l2 = left.withColumn(_TS_US, _epoch_us(F.col(left_ts))) \
        .withColumn(_TAG, F.lit(1)) \
        .withColumn(_ORD, F.lit(None).cast("long"))
    r2 = right.select(
        F.col(on),
        _epoch_us(F.col(right_ts)).alias(_TS_US),
        F.lit(0).alias(_TAG),
        F.col(right_order).cast("long").alias(_ORD),
        _epoch_us(F.col(right_ts)).alias(_R_TS),
        *[F.col(c).alias(f"_asof_r_{c}") for c in right_cols],
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(_TS_US), F.col(_TAG), F.col(_ORD).asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched_ts = F.last(F.col(_R_TS), ignorenulls=True).over(w)
    lag_us: Column = F.col(_TS_US) - matched_ts
    in_tol = lag_us.isNotNull() if tolerance_us is None \
        else lag_us <= F.lit(int(tolerance_us))
    out = u.withColumn(lag_col, F.when(in_tol, lag_us))
    for c in right_cols:
        out = out.withColumn(
            c,
            F.when(in_tol, F.last(f"_asof_r_{c}", ignorenulls=True).over(w)),
        )
    keep = [c for c in left.columns] + right_cols + [lag_col]
    return out.where(F.col(_TAG) == 1).select(*keep)


def sessionize(
    events: DataFrame,
    key: str,
    ts: str,
    order: str,
    gap_s: int,
) -> DataFrame:
    """Assign a 0-based ``session_idx`` per key: a new session starts
    when the gap since the previous event (same key, ordered by
    event-time with ``order`` as tiebreaker) exceeds ``gap_s``
    seconds.  Adds ``session_idx``; one shuffle on ``key``."""
    w = Window.partitionBy(key).orderBy(F.col(_TS_US), F.col(order))
    us = _epoch_us(F.col(ts))
    gap_us = int(gap_s) * 1_000_000
    with_flag = events.withColumn(_TS_US, us).withColumn(
        "_new_sess",
        F.when(
            (F.col(_TS_US) - F.lag(_TS_US).over(w)) > F.lit(gap_us), 1
        ).otherwise(0),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return with_flag.withColumn(
        "session_idx", F.sum("_new_sess").over(run).cast("long")
    ).drop("_new_sess", _TS_US)


def session_stats(
    events: DataFrame,
    key: str,
    ts: str,
    order: str,
    gap_s: int,
) -> DataFrame:
    """Per-session rollup: event count, integral start epoch-seconds,
    duration in whole microseconds.  Reuses ``sessionize``'s key
    partitioning — the aggregate adds no second exchange because
    hash(key) already clusters (key, session_idx)."""
    s = sessionize(events, key, ts, order, gap_s)
    us = _epoch_us(F.col(ts))
    agg = (
        s.groupBy(F.col(key), F.col("session_idx"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(us).alias("_min_us"),
            (F.max(us) - F.min(us)).alias("duration_us"),
        )
    )
    # Exact floor-division to seconds: make the numerator a multiple of
    # 10^6 first so the double division is exact (a bare us/1e6 cast can
    # round up across a second boundary for .999999xx fractions).
    start_s = ((F.col("_min_us") - F.col("_min_us") % 1_000_000)
               / 1_000_000).cast("long")
    return agg.select(
        key, "session_idx", "n_events",
        start_s.alias("start_epoch_s"), "duration_us",
    )
