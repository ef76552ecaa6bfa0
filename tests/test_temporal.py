"""As-of join + sessionization semantics: backward-inclusive ties,
tiebreak among equal-time right rows, tolerance null-out, unmatched
lefts, gap boundary strictness, and the single-shuffle plan shape."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from html_parser_spark.operators.temporal import (
    asof_join, session_stats, sessionize,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _ts(s):
    return T0 + timedelta(seconds=s)


def _left(spark, rows):
    return spark.createDataFrame(rows, "id long, k long, ts timestamp")


def _right(spark, rows):
    return spark.createDataFrame(rows, "k long, ts timestamp, rid long")


def _join(spark, left_rows, right_rows, **kw):
    out = asof_join(
        _left(spark, left_rows), _right(spark, right_rows),
        on="k", left_ts="ts", right_ts="ts",
        right_cols=["rid"], right_order="rid", **kw,
    )
    return {r["id"]: (r["rid"], r["asof_lag_us"]) for r in out.collect()}


class TestAsofJoin:
    def test_backward_match_and_unmatched(self, spark):
        got = _join(
            spark,
            [(1, 7, _ts(10)), (2, 7, _ts(100)), (3, 7, _ts(2))],
            [(7, _ts(5), 50), (7, _ts(60), 60)],
        )
        assert got[1] == (50, 5_000_000)
        assert got[2] == (60, 40_000_000)
        assert got[3] == (None, None)      # before every right row

    def test_equal_timestamp_is_inclusive(self, spark):
        got = _join(spark, [(1, 7, _ts(5))], [(7, _ts(5), 50)])
        assert got[1] == (50, 0)

    def test_equal_time_right_rows_max_order_wins(self, spark):
        got = _join(
            spark, [(1, 7, _ts(9))],
            [(7, _ts(5), 11), (7, _ts(5), 44), (7, _ts(5), 22)],
        )
        assert got[1] == (44, 4_000_000)

    def test_keys_do_not_leak(self, spark):
        got = _join(
            spark, [(1, 7, _ts(10)), (2, 8, _ts(10))],
            [(7, _ts(5), 50)],
        )
        assert got[1] == (50, 5_000_000)
        assert got[2] == (None, None)      # other key, no rights

    def test_tolerance_nulls_out_stale_matches(self, spark):
        got = _join(
            spark,
            [(1, 7, _ts(10)), (2, 7, _ts(200))],
            [(7, _ts(5), 50)],
            tolerance_us=30_000_000,
        )
        assert got[1] == (50, 5_000_000)   # 5 s old: inside 30 s
        assert got[2] == (None, None)      # 195 s old: dropped

    def test_tolerance_boundary_inclusive(self, spark):
        got = _join(
            spark, [(1, 7, _ts(35))], [(7, _ts(5), 50)],
            tolerance_us=30_000_000,
        )
        assert got[1] == (50, 30_000_000)

    def test_sub_second_resolution(self, spark):
        # 250 ms gap must survive the microsecond epoch derivation
        got = _join(
            spark,
            [(1, 7, T0 + timedelta(milliseconds=750))],
            [(7, T0 + timedelta(milliseconds=500), 50)],
        )
        assert got[1] == (50, 250_000)

    def test_right_col_collision_rejected(self, spark):
        with pytest.raises(ValueError, match="collide"):
            asof_join(
                _left(spark, [(1, 7, _ts(1))]),
                _left(spark, [(2, 7, _ts(0))]),
                on="k", left_ts="ts", right_ts="ts",
                right_cols=["id"], right_order="id",
            )

    def test_single_exchange_plan(self, spark):
        plan = asof_join(
            _left(spark, [(1, 7, _ts(1))]),
            _right(spark, [(7, _ts(0), 5)]),
            on="k", left_ts="ts", right_ts="ts",
            right_cols=["rid"], right_order="rid",
        )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" not in plan  # no join operator at all


class TestSessionize:
    def _events(self, spark, rows):
        return spark.createDataFrame(rows, "eid long, k long, ts timestamp")

    def test_gap_strictly_greater_splits(self, spark):
        ev = self._events(spark, [
            (1, 7, _ts(0)), (2, 7, _ts(100)),      # exactly gap: same
            (3, 7, _ts(201)),                      # 101 s > 100 s: new
        ])
        s = {r["eid"]: r["session_idx"]
             for r in sessionize(ev, "k", "ts", "eid", gap_s=100).collect()}
        assert s == {1: 0, 2: 0, 3: 1}

    def test_per_key_numbering_restarts(self, spark):
        ev = self._events(spark, [
            (1, 7, _ts(0)), (2, 7, _ts(5000)),
            (3, 8, _ts(0)),
        ])
        s = {r["eid"]: (r["k"], r["session_idx"])
             for r in sessionize(ev, "k", "ts", "eid", gap_s=100).collect()}
        assert s == {1: (7, 0), 2: (7, 1), 3: (8, 0)}

    def test_stats_rollup(self, spark):
        ev = self._events(spark, [
            (1, 7, _ts(0)), (2, 7, _ts(30)), (3, 7, _ts(5000)),
        ])
        rows = {(r["k"], r["session_idx"]): r for r in session_stats(
            ev, "k", "ts", "eid", gap_s=100).collect()}
        a, b = rows[(7, 0)], rows[(7, 1)]
        assert (a["n_events"], a["duration_us"]) == (2, 30_000_000)
        assert (b["n_events"], b["duration_us"]) == (1, 0)
        assert b["start_epoch_s"] - a["start_epoch_s"] == 5000

    def test_stats_single_exchange_plan(self, spark):
        ev = self._events(spark, [(1, 7, _ts(0))])
        plan = session_stats(ev, "k", "ts", "eid", gap_s=100) \
            ._jdf.queryExecution().executedPlan().toString()
        # the (k, session_idx) aggregate must reuse the window's
        # hash(k) partitioning — exactly one exchange end to end
        assert plan.count("Exchange hashpartitioning") == 1
