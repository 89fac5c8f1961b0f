"""Stateful streaming sessionization — ``applyInPandasWithState``.

The batch ``sessionization`` query (``__spark_entry__.q_sessionization``,
gate-checked against the DuckDB oracle) defines the semantics: per user,
an event more than ``gap_seconds`` after the previous one opens a new
session; a session reports (n_events, duration_s, sum_value) and sessions
are numbered 1.. per user in event order.

This module is the *streaming* analog: arbitrary custom per-key state
(open-session accumulators) carried across micro-batches through Spark's
state store — the operator class the reference (a strictly-batch system)
has no answer to.  Sessions close in two ways:

- a later event for the same user arrives past the gap → the closed
  session is emitted in that micro-batch (exactly the batch semantics);
- no event arrives at all → an **event-time timeout** fires once the
  watermark passes ``last_event + gap`` and flushes the open session.
  Event-time (not processing-time) timeouts keep the query quiescent
  between micro-batches — processing-time timeouts force a state-cleanup
  trigger on every clock tick forever, which burns cluster time on an idle
  stream (and never lets ``processAllAvailable`` return in tests).

Scale shape: state is per-user O(1) (five scalars), partitioned by the
grouping key across executors by the streaming state store; each
micro-batch shuffles only its own events by user_id.  Inside the kernel the
per-user batch slice is aggregated vectorized (cumsum segment ids + pandas
groupby), not row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = (
    "user_id LONG, session_idx LONG, n_events LONG, duration_s LONG, sum_value DOUBLE"
)
STATE_SCHEMA = "session_idx LONG, start_es LONG, last_es LONG, n LONG, sum_value DOUBLE"


def _closed_frame(rows: list[tuple]) -> pd.DataFrame:
    return pd.DataFrame(
        rows, columns=["user_id", "session_idx", "n_events", "duration_s", "sum_value"]
    )


def _session_func(gap_seconds: int):
    gap_ms = gap_seconds * 1000

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        user = key[0]
        if state.hasTimedOut:
            # watermark passed last_event + gap: flush the open session
            idx, start, last, n, sv = state.get
            state.remove()
            yield _closed_frame([(user, idx, n, last - start, round(sv, 4))])
            return

        events = pd.concat(list(pdfs), ignore_index=True)
        # event-time seconds; order matches the batch query (ts, event_id)
        es = (events["ts"].astype("int64") // 1_000_000_000).to_numpy()
        order = pd.DataFrame({"es": es, "eid": events["event_id"]}).sort_values(
            ["es", "eid"], kind="stable"
        ).index.to_numpy()
        es = es[order]
        vals = events["value"].to_numpy()[order].astype(float)

        if state.exists:
            idx, start, last, n, sv = state.get
        else:
            idx, start, last, n, sv = 0, None, None, 0, 0.0

        import numpy as np

        # sentinel forces a new session for a fresh user without int64 overflow
        first_prev = last if last is not None else int(es[0]) - gap_seconds - 1
        prev = np.concatenate(([first_prev], es[:-1]))
        is_new = (es - prev) > gap_seconds
        seg = np.cumsum(is_new)  # 0 = continues the carried-over session
        closed: list[tuple] = []
        n_segs = int(seg[-1]) if len(seg) else 0
        for s in range(0, n_segs + 1):
            m = seg == s
            if not m.any():
                continue
            seg_es, seg_vals = es[m], vals[m]
            if s == 0:
                # extends the open session from state.  Late-but-within-
                # watermark events can be OLDER than the carried state's
                # span — min/max so the session's bounds never move backward
                # (a plain assignment would shrink duration_s and set the
                # event-time timeout before true last_event + gap, closing
                # the session prematurely under a non-zero watermark).
                start = min(start, int(seg_es[0]))
                last = max(last, int(seg_es[-1]))
                n += int(m.sum())
                sv += float(seg_vals.sum())
            else:
                if n:  # close whatever was open
                    closed.append((user, idx, n, last - start, round(sv, 4)))
                idx += 1
                start = int(seg_es[0])
                last = int(seg_es[-1])
                n = int(m.sum())
                sv = float(seg_vals.sum())
        state.update((idx, start, last, n, sv))
        # the engine rejects timeout timestamps behind the current watermark
        # (possible when this batch's events for the key are all older than
        # other keys' events minus the gap) — clamp just past it
        state.setTimeoutTimestamp(
            max(last * 1000 + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        if closed:
            yield _closed_frame(closed)

    return fn


def sessionize_stream(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "0 seconds"
) -> DataFrame:
    """Streaming sessionization over an events stream with columns
    (user_id, event_id, ts TIMESTAMP, value DOUBLE, ...).  Emits one row per
    CLOSED session (append mode): (user_id, session_idx, n_events,
    duration_s, sum_value) — identical numbers to the batch gate query for
    every session it closes.  ``watermark`` is the late-data allowance;
    events older than it are dropped by the engine before the kernel, and
    open sessions flush once the watermark passes ``last_event + gap``."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_func(gap_seconds),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
