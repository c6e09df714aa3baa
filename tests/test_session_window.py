"""Session-window tie-mate semantics (native op vs relational oracle).

Spark's ``session_window`` merges ALL events sharing one timestamp into the
same session — including the session-opening event's tie-mates. The DuckDB
oracle derives sessions relationally (lag -> flag -> running sum); its
running-sum window must order by the SAME total key (ts, event_id) as the
flag window, otherwise an unflagged tie-mate straddling a gap boundary can
be summed before the flagged row and land in the PREVIOUS session. This
test constructs exactly that hostile input and runs the real gated query
against the real oracle SQL through the parity harness."""

from __future__ import annotations

from datetime import datetime

import pytest

from job_crawler_spark.plans.events_plans import (
    Q_SESSION_WINDOW_SQL,
    q_session_window_totals,
)
import duckdb

from tests.oracle_harness import compare


def _mk_events(spark, tmp_path):
    t = lambda h, m: datetime(2024, 3, 1, h, m)
    rows = [
        # user 1: session A opens 10:00; 10:45 is >= 30 min later so a new
        # session opens there — with TWO tie-mates at 10:45 whose event_ids
        # are inserted out of (ts, event_id) order. Both must land in the
        # NEW session (Spark semantics); a ts-only running sum could split
        # them nondeterministically.
        (1, t(10, 0), 1, "view", 1.0, "{}"),
        (3, t(10, 45), 1, "click", 2.0, "{}"),
        (2, t(10, 45), 1, "view", 4.0, "{}"),
        # user 1: tie-mates WITHIN a session (10:55, < 30 min gap) — both
        # stay in the 10:45 session.
        (5, t(10, 55), 1, "view", 8.0, "{}"),
        (4, t(10, 55), 1, "click", 16.0, "{}"),
        # user 2: exact-gap boundary — Spark MERGES touching windows, so
        # 9:30 (exactly prev + gap) CONTINUES the 9:00 session — and a
        # strictly-greater gap (10:01 is 31 min later) opens a new one.
        (6, t(9, 0), 2, "view", 1.0, "{}"),
        (7, t(9, 30), 2, "view", 2.0, "{}"),
        (8, t(10, 1), 2, "view", 4.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_session_window_tie_mates_match_oracle(spark, tmp_path):
    sf = _mk_events(spark, tmp_path)
    out = q_session_window_totals(spark, sf)
    rows = {
        (r["user_id"], r["session_start"]): r for r in out.collect()
    }
    # both 10:45 tie-mates open the new session together with the 10:55 pair
    s = rows[(1, datetime(2024, 3, 1, 10, 45))]
    assert s["n_events"] == 4 and s["total_value"] == pytest.approx(30.0)
    # 10:00 session holds only the opener
    assert rows[(1, datetime(2024, 3, 1, 10, 0))]["n_events"] == 1
    # exact-gap boundary: 9:30 CONTINUES user 2's 9:00 session (touching
    # windows merge); the strictly-greater 31-min gap opens a new one
    assert rows[(2, datetime(2024, 3, 1, 9, 0))]["n_events"] == 2
    assert rows[(2, datetime(2024, 3, 1, 10, 1))]["n_events"] == 1

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{sf}/events.parquet/*.parquet')"
    )
    try:
        compare(out, con, Q_SESSION_WINDOW_SQL)
    finally:
        con.close()
