"""Custom stateful streaming operators (applyInPandasWithState).

Two reference behaviors are genuinely stateful across micro-batches:

- **per-host politeness gate** (north rule; reference's per-request cap,
  main.py:207): a host may be fetched at most once per ``crawl_delay``
  seconds. State = the last granted fetch time per host, persisted in the
  streaming state store, surviving across micro-batches and restarts.
- **follow-up timeout** (T5, main.py:932): the first event arriving >= 7
  days after an application entered the 'applied' status is flagged
  ``needs_follow_up`` — at most once per applied-spell (the flag re-arms
  only when the status changes and later returns to 'applied'). State =
  (status, first_seen_ts, already_flagged) per application id. Detection
  is arrival-driven (NoTimeout): a silent application fires on its next
  event, which is the reference's behavior too — main.py:932 computes the
  flag when the summary is requested, not on a timer.

Both are GroupState per key — the streaming twin of the batch engine's
window-ranked politeness scheduling (operators/politeness.py). Batch mode
stays the primary path (round-based crawling is micro-batching already);
this module exists for deployments that want a continuously-running
scheduler with the state store doing checkpointing instead of the round
loop's explicit Iceberg snapshots.

Scale: state is partitioned by the group key (host / application id), so
state-store size per executor is bounded by the key range it owns; hot
hosts are single keys — the gate emits at most round_seconds/crawl_delay
rows per key per batch regardless of how many requests queue up, which is
exactly the skew bound the batch scheduler enforces via window rank.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GATE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("granted_at", T.DoubleType(), False),
    ]
)

GATE_STATE_SCHEMA = T.StructType(
    [T.StructField("last_granted", T.DoubleType(), True)]
)

FOLLOWUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("app_id", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("first_seen", T.DoubleType(), False),
        T.StructField("needs_follow_up", T.BooleanType(), False),
    ]
)

FOLLOWUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("status", T.StringType(), True),
        T.StructField("first_seen", T.DoubleType(), True),
        T.StructField("flagged", T.BooleanType(), True),
    ]
)


def politeness_gate(
    requests: DataFrame, crawl_delay_s: float = 1.0
) -> DataFrame:
    """Stateful per-host politeness gate over a stream of fetch requests.

    Input (may be a streaming DataFrame): rows with
    ``(host string, url_canon string, req_ts double)``. Within each host
    group, requests are granted in (req_ts, url_canon) order — a TOTAL
    order, so grants are deterministic — and a grant is scheduled at
    ``max(req_ts, last_granted + crawl_delay_s)``. Requests that cannot be
    scheduled within the same batch window simply receive later
    ``granted_at`` stamps (a real deployment would cap per-batch grants;
    the batch scheduler's budget logic in operators/politeness.py does).
    """

    def gate(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        last = state.get[0] if state.exists else None
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["req_ts", "url_canon"], kind="mergesort")
        granted = []
        for ts in rows["req_ts"]:
            g = float(ts) if last is None else max(float(ts), last + crawl_delay_s)
            granted.append(g)
            last = g
        state.update((last,))
        yield pd.DataFrame(
            {
                "host": host,
                "url_canon": rows["url_canon"].to_numpy(),
                "granted_at": granted,
            }
        )

    return requests.groupBy("host").applyInPandasWithState(
        gate,
        outputStructType=GATE_OUTPUT_SCHEMA,
        stateStructType=GATE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def followup_tracker(
    app_events: DataFrame, timeout_days: float = 7.0
) -> DataFrame:
    """Stateful follow-up detector: remembers each application's first-seen
    time per status; emits needs_follow_up=true when a row arrives >= 7 days
    after first_seen with the status still 'applied' (reference P6 rule,
    main.py:932, as stream state instead of a recomputed column).

    Input rows: ``(app_id long, status string, event_ts double)``.
    """
    timeout_s = timeout_days * 86400.0

    def track(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (app_id,) = key
        prev_status, first_seen, flagged = (
            (state.get[0], state.get[1], bool(state.get[2]))
            if state.exists
            else (None, None, False)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["event_ts"], kind="mergesort")
        out = {"app_id": [], "status": [], "first_seen": [], "needs_follow_up": []}
        for status, ts in zip(rows["status"], rows["event_ts"]):
            ts = float(ts)
            if status != prev_status:
                prev_status, first_seen, flagged = status, ts, False
            needs = (
                status == "applied"
                and not flagged
                and (ts - first_seen) >= timeout_s
            )
            if needs:
                flagged = True  # at most one alert per applied-spell
            out["app_id"].append(app_id)
            out["status"].append(status)
            out["first_seen"].append(first_seen)
            out["needs_follow_up"].append(needs)
        state.update((prev_status, first_seen, flagged))
        yield pd.DataFrame(out)

    return app_events.groupBy("app_id").applyInPandasWithState(
        track,
        outputStructType=FOLLOWUP_OUTPUT_SCHEMA,
        stateStructType=FOLLOWUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
