"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

The batch engine sessionizes with a lag/cumsum window (see the
``sessionize_events`` contract query); on an unbounded stream that
needs per-key state that outlives a micro-batch. This operator keeps
one open session per user in the state store, closes it when an event
arrives more than ``gap`` after the last one, and flushes idle
sessions with an EVENT-TIME timeout (fires once the watermark passes
last_event + gap, so late data inside the watermark can still extend
a session).

State schema is plain int64 micros (no nested types) — state-store
encoding stays trivial and versioned. Emitted rows are closed sessions
only (append mode): exactly the contract a downstream Iceberg sink
wants, since closed sessions are immutable.

The reference has no streaming; this is the Spark-native analog of its
incremental-state patterns (per-character autocomplete state,
ref: EditTrie/Trie.cs:221-282, carried across calls).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total double"
)
# wall-clock micros (session tz); flat longs keep the state codec trivial
SESSION_STATE_SCHEMA = "start long, last long, n long, total double"


def _emit(uid: int, start_us: int, last_us: int, n: int, total: float) -> dict:
    return {
        "user_id": uid,
        "session_start": pd.Timestamp(start_us, unit="us"),
        "session_end": pd.Timestamp(last_us, unit="us"),
        "n_events": n,
        "total": float(total),
    }


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """(user_id, session_start, session_end, n_events, total) of CLOSED
    sessions over an event stream. A session closes when the next event
    of the user is > gap later, or when the watermark passes
    last_event + gap (event-time timeout).

    Late data (inside the watermark) that is OLDER than the open
    session's bounds extends the session backward (start = min,
    last = max) — it never moves `last` backward or shortens the
    timeout; a late event predating an already-FLUSHED session attaches
    to the open one rather than reopening the closed one (closed
    sessions are immutable, the append-mode contract)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    # State keeps wall-clock micros in the SESSION time zone (the tz
    # Arrow renders naive timestamps in, symmetric with the emitted
    # naive timestamps), but setTimeoutTimestamp compares against the
    # watermark in true epoch ms — capture the session tz at plan build
    # so the executor-side closure can convert. With any tz other than
    # UTC a naive astype('int64') timeout would be skewed by the tz
    # offset (flushing hours late, or dying on 'timeout earlier than
    # watermark' for negative offsets).
    tz = events.sparkSession.conf.get("spark.sql.session.timeZone") or "UTC"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        out: list[dict] = []
        if state.hasTimedOut:
            start, last, n, total = state.get
            out.append(_emit(uid, start, last, n, total))
            state.remove()
        else:
            batches = [pdf[[ts_col, value_col]] for pdf in pdfs]
            data = pd.concat(batches).sort_values(ts_col) if batches else None
            if data is not None and len(data):
                # Derive the epoch-micros conversion from the actual dtype
                # instead of assuming datetime64[ns]: Arrow can deliver
                # datetime64[us] (or others), and a hardcoded //1000 would
                # silently skew gaps and timeouts by 1000x.
                ts = data[ts_col]
                unit = getattr(ts.dtype, "unit", None)  # datetime64[<unit>]
                divisor = {"ns": 1_000, "us": 1, "ms": None, "s": None}.get(unit)
                if divisor is None:
                    ts = ts.dt.as_unit("us") if hasattr(ts.dt, "as_unit") else ts.astype("datetime64[us]")
                    divisor = 1
                ts_us = ts.astype("int64") // divisor
                vals = data[value_col].astype("float64")
                if state.exists:
                    start, last, n, total = state.get
                else:
                    start = last = None  # type: ignore[assignment]
                    n, total = 0, 0.0
                for t_us, v in zip(ts_us, vals):
                    t_us = int(t_us)
                    if last is not None and t_us - last > gap_us:
                        out.append(_emit(uid, start, last, n, total))
                        start, last, n, total = None, None, 0, 0.0
                    # late events must never move the bounds backward:
                    # a cross-batch event older than the stored state
                    # extends start down, not last down (a shrinking
                    # `last` would emit session_end < session_start and
                    # pull the timeout earlier than already promised)
                    start = t_us if start is None else min(start, t_us)
                    last = t_us if last is None else max(last, t_us)
                    n += 1
                    total += float(v)
                state.update((int(start), int(last), int(n), float(total)))
                # flush when the watermark passes the gap after the last
                # event; wall-clock micros -> true epoch ms via the
                # session tz (identical when tz is UTC)
                timeout_ms = (
                    pd.Timestamp(int(last) + gap_us, unit="us")
                    .tz_localize(tz, ambiguous=True, nonexistent="shift_forward")
                    .value // 1_000_000
                )
                state.setTimeoutTimestamp(timeout_ms)
        yield pd.DataFrame(
            out,
            columns=[
                "user_id", "session_start", "session_end", "n_events", "total",
            ],
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            SESSION_OUTPUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
