"""Custom stateful streaming operator: gap-based sessionization via
`applyInPandasWithState` (T8's true streaming form, SURVEY.md §2.8).

The reference keeps no per-key state machine of its own — its session
semantics exist only as the batch lag/cumsum rewrite (T8) — but a
streaming engine needs the stateful form: per-user open-session state
that survives micro-batches, closing a session when the inter-event gap
exceeds the threshold. Spark's native `session_window` covers the
built-in aggregations (see `operators/relational.py:session_window_agg`);
this operator is the CUSTOM seam — arbitrary per-group state transition
logic in Arrow-batched pandas, the sanctioned escape hatch when the
built-in session windows can't express the semantics (e.g. emitting the
closed session's exact last-event timestamp, or value logic beyond an
aggregate).

Semantics (identical to `operators/relational.py:sessionize`):
- events are ordered by (ts, event_id) per user;
- a new session starts when ts - prev_ts > gap;
- session_value accumulates integer cents (cross-engine determinism);
- CLOSED sessions are emitted as soon as the closing event arrives; the
  trailing open session stays in state (flushed on timeout when a
  timeout conf is enabled).

State is (start_us, last_us, n, value_cents) — four longs per user, so
state size is O(distinct active users), evictable by timeout; at 100 TB
the state store shards by the groupBy key exactly like any streaming
aggregation.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterable, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

GAP_MINUTES = 30

OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, session_value double"
)
STATE_SCHEMA = "start_us long, last_us long, n long, value_cents long"


def _close_sessions_fn(gap_us: int, use_timeout: bool = False):
    """Build the per-group state-transition function. Everything inside
    runs on executors over Arrow batches — imports stay local."""

    def close_sessions(
        key: Tuple[Any, ...],
        pdfs: Iterable["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        user_id = key[0]

        def emit(frame_rows):
            return pd.DataFrame(
                frame_rows,
                columns=[
                    "user_id",
                    "session_start",
                    "session_end",
                    "n_events",
                    "session_value",
                ],
            ).astype(
                {
                    "session_start": "datetime64[us]",
                    "session_end": "datetime64[us]",
                }
            )

        if state.hasTimedOut:
            start_us, last_us, n, cents = state.get
            state.remove()
            yield emit([(user_id, start_us, last_us, n, round(cents / 100.0, 2))])
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        ts_us = rows["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        cents = np.rint(rows["value"].to_numpy() * 100).astype("int64")

        seed = state.get if state.exists else None
        prev = np.empty_like(ts_us)
        prev[1:] = ts_us[:-1]
        prev[0] = seed[1] if seed is not None else ts_us[0]
        boundary = (ts_us - prev) > gap_us
        sid = np.cumsum(boundary)

        closed = []
        # per-session aggregates over the new rows (sid is sorted)
        first_idx = np.flatnonzero(np.r_[True, sid[1:] != sid[:-1]])
        last_idx = np.r_[first_idx[1:] - 1, len(sid) - 1]
        sums = np.add.reduceat(cents, first_idx)
        counts = np.diff(np.r_[first_idx, len(sid)])

        sessions = [
            [int(ts_us[f]), int(ts_us[l]), int(c), int(s)]
            for f, l, c, s in zip(first_idx, last_idx, counts, sums)
        ]
        if seed is not None:
            if not boundary[0]:
                # open session continues into the first new session
                sessions[0][0] = seed[0]
                sessions[0][2] += seed[2]
                sessions[0][3] += seed[3]
            else:
                # the gap closed the stored session as-is
                closed.append((user_id, seed[0], seed[1], seed[2], seed[3]))

        closed.extend(
            (user_id, s[0], s[1], s[2], s[3]) for s in sessions[:-1]
        )
        tail = sessions[-1]
        state.update((tail[0], tail[1], tail[2], tail[3]))
        if use_timeout:
            # flush the open session after one idle gap of wall time
            state.setTimeoutDuration(gap_us // 1000)

        if closed:  # empty yields trip a pandas concat FutureWarning
            yield emit(
                [
                    (u, s0, s1, n, round(vc / 100.0, 2))
                    for (u, s0, s1, n, vc) in closed
                ]
            )

    return close_sessions


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = GAP_MINUTES,
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """events (streaming or batch-tested via AvailableNow): columns
    (event_id long, ts timestamp, user_id long, value double) ->
    append-mode stream of CLOSED sessions. With
    `GroupStateTimeout.ProcessingTimeTimeout` the trailing open session
    flushes after one idle gap; with NoTimeout (deterministic tests /
    the oracle query) it stays in state."""
    gap_us = gap_minutes * 60 * 1_000_000
    return events.groupBy("user_id").applyInPandasWithState(
        _close_sessions_fn(gap_us, timeout != GroupStateTimeout.NoTimeout),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        timeout,
    )


# ---------------------------------------------------------------------------
# oracle-checked registered-query form
# ---------------------------------------------------------------------------


def stateful_sessions_query(spark, sf_dir: str) -> DataFrame:
    """Drive sessionize_stream end-to-end: stage the events table for a
    file-stream source, run the stateful operator under
    Trigger.AvailableNow with a checkpoint, and return the closed
    sessions. A single micro-batch keeps the emitted set deterministic
    (= every session except each user's trailing one); the multi-batch
    state-carry path is pinned by tests/test_stateful.py."""
    import os

    from .. import catalog
    from ..operators import artifacts

    events = catalog.load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    # the file-stream STAGING copy of the input is a per-corpus-snapshot
    # artifact (same build/probe amortization as every index fixture):
    # re-materializing an unchanged input table per invocation was one
    # full write job of pure overhead. The checkpoint and output stay
    # per-invocation scratch — the stateful computation itself (micro-
    # batch replay + state machine) runs fresh every time.
    def _stage(p: str) -> None:
        events.write.mode("overwrite").parquet(os.path.join(p, "staging"))

    staging = os.path.join(
        artifacts.materialize_dir(events, "stateful_staging", _stage),
        "staging",
    )
    run_root = artifacts.scratch_dir("stateful_sessions_")
    out = os.path.join(run_root, "out")
    ckpt = os.path.join(run_root, "ckpt")

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, value double"
    ).parquet(staging)
    q = (
        sessionize_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out).select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
        F.round("session_value", 2).alias("session_value"),
    )


STATEFUL_SESSIONS_SQL = """
WITH events_us AS (
  SELECT event_id, make_timestamp(epoch_us(ts)) AS ts, user_id, value FROM events
),
flagged AS (
  SELECT *, CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
          (PARTITION BY user_id ORDER BY ts, event_id) > 1800 * 1000000
       THEN 1 ELSE 0 END AS new_session
  FROM events_us
),
sid AS (
  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM flagged
),
sess AS (
  SELECT user_id, session_seq,
    strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
    strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
    COUNT(*) AS n_events,
    round(SUM(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS session_value
  FROM sid GROUP BY user_id, session_seq
)
SELECT user_id, session_start, session_end, n_events, session_value
FROM sess
QUALIFY session_seq < MAX(session_seq) OVER (PARTITION BY user_id)
"""
