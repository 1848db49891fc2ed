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

MIGRATION NOTE (state semantics, 2026-08-19): state micros are TRUE
EPOCH since this revision; earlier revisions stored session-tz
wall-clock micros. The two are identical under UTC sessions (this
engine's default, session.py), but a long-running NON-UTC job resuming
a pre-revision checkpoint would misread its open sessions by the tz
offset — restart such streams from a fresh checkpoint.

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
# TRUE epoch micros; flat longs keep the state codec trivial. Epoch (not
# wall-clock) so gap/timeout arithmetic is DST-immune: a wall-clock gap
# across spring-forward reads 1h longer than the true gap (false session
# split), fall-back 1h shorter (missed split).
SESSION_STATE_SCHEMA = "start long, last long, n long, total double"


def _emit(
    uid: int, start_us: int, last_us: int, n: int, total: float, tz: str
) -> dict:
    # epoch micros -> naive wall-clock in the session tz (the shape Spark
    # expects back for a `timestamp` output column)
    def wall(us: int) -> pd.Timestamp:
        return pd.Timestamp(us, unit="us", tz="UTC").tz_convert(tz).tz_localize(None)

    return {
        "user_id": uid,
        "session_start": wall(start_us),
        "session_end": wall(last_us),
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
    # Arrow renders TIMESTAMP columns as NAIVE wall-clock in the session
    # time zone; convert to TRUE epoch micros ONCE on entry (capture the
    # session tz at plan build so the executor-side closure can convert)
    # and keep ALL state/gap/timeout arithmetic in epoch time. Wall-clock
    # arithmetic would skew across DST transitions (spring-forward
    # inflates an apparent gap by 1h -> false split; fall-back deflates
    # it -> missed split) and would feed setTimeoutTimestamp — which
    # compares against the watermark in true epoch ms — an offset value.
    # Only the EMITTED timestamps convert back to wall clock (_emit).
    tz = events.sparkSession.conf.get("spark.sql.session.timeZone") or "UTC"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        out: list[dict] = []
        if state.hasTimedOut:
            start, last, n, total = state.get
            out.append(_emit(uid, start, last, n, total, tz))
            state.remove()
        else:
            batches = [pdf[[ts_col, value_col]] for pdf in pdfs]
            data = pd.concat(batches).sort_values(ts_col) if batches else None
            if data is not None and len(data):
                # a NULL event time carries no position on the session
                # timeline — drop it. NaT is NOT caught by the watermark
                # late-row filter (NULL predicate), and downstream it
                # poisons state: NaT.astype(int64) is int64-min, which
                # corrupts session_start and crashes _emit at flush with
                # OutOfBoundsDatetime — persistently, via the checkpoint
                data = data[data[ts_col].notna()]
            if data is not None and len(data):
                # Derive the epoch-micros conversion from the actual dtype
                # instead of assuming datetime64[ns]: Arrow can deliver
                # datetime64[us] (or others), and a hardcoded //1000 would
                # silently skew gaps and timeouts by 1000x.
                ts = data[ts_col]
                unit = getattr(ts.dtype, "unit", None)  # datetime64[<unit>]
                if unit not in ("ns", "us"):
                    ts = ts.dt.as_unit("us") if hasattr(ts.dt, "as_unit") else ts.astype("datetime64[us]")
                    unit = "us"
                # naive wall-clock (session tz) -> true epoch micros; for
                # repeated fall-back wall-clock times ambiguous=True picks
                # the DST instant deterministically, spring-forward holes
                # shift forward
                ts_epoch = (
                    ts.dt.tz_localize(tz, ambiguous=True, nonexistent="shift_forward")
                    .dt.tz_convert("UTC")
                    .dt.tz_localize(None)
                )
                divisor = 1_000 if unit == "ns" else 1
                ts_us = ts_epoch.astype("int64") // divisor
                vals = data[value_col].astype("float64")
                if state.exists:
                    start, last, n, total = state.get
                else:
                    start = last = None  # type: ignore[assignment]
                    n, total = 0, 0.0
                for t_us, v in zip(ts_us, vals):
                    t_us = int(t_us)
                    if last is not None and t_us - last > gap_us:
                        out.append(_emit(uid, start, last, n, total, tz))
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
                # event; state is already true epoch micros, so the
                # epoch-ms timeout is plain integer arithmetic
                state.setTimeoutTimestamp((int(last) + gap_us) // 1_000)
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
