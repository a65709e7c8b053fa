"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY §2.8 — the Structured Streaming shape of
the batch ``evt_sessionize`` query in __spark_entry__).

A session is a maximal run of one user's events with inter-event gaps
<= ``gap``. State per user_id: the open session (start, last event time,
count) plus the user's session counter. An arriving batch's events fold
into the state; a session CLOSES — and is emitted — when the event-time
watermark passes last_ts + gap (GroupStateTimeout.EventTimeTimeout), so
late events inside the watermark still join their session. This is the
standard Spark pattern for session windows with custom state (the built-in
``F.session_window`` covers plain count/agg sessions; this operator exists
for enrichable per-session state — here it also tracks the per-user
session sequence number, which session_window cannot do).

Late-data semantics (all within the watermark; later events are dropped by
the engine):
- a late event within ``gap`` of the open session's START extends the
  session backward (start moves earlier);
- detached late events (more than ``gap`` before the open session) fold
  into late RUNS: a within-batch cluster of late events with pairwise
  gaps <= gap closes as ONE session — and merges into the open session if
  backward extension brings them within gap — matching the batch
  gap-session definition. Closed late runs are numbered at the current
  counter (sequence reflects close order under cross-batch lateness,
  arrival order otherwise) and the open session renumbers after them.
- deliberate deviation from the batch oracle: a late cluster SPLIT ACROSS
  micro-batches closes as one session per batch, because append-mode
  output emits a closed session exactly once and cannot retract it.

State lifecycle: closing a session via timeout KEEPS the (tiny) per-user
counter in state — removing it would restart session_seq at 1 and emit
duplicate (user_id, session_seq) keys. State size is therefore O(users),
not O(open sessions); user-keyed state that small is the normal trade.

Scale: state is hash-partitioned by user_id by the streaming engine.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_seq bigint, n_events bigint, "
    "session_start_epoch bigint, session_end_epoch bigint"
)
SESSION_STATE_SCHEMA = (
    "session_seq bigint, n_events bigint, start_us bigint, last_us bigint"
)

_NO_SESSION = -1  # start_us/last_us sentinel: counter kept, no open session


def fold_events(
    seq: int,
    n: int,
    start_us: int | None,
    last_us: int | None,
    ts_us: list[int],
    gap_us: int,
) -> tuple[list[tuple[int, int, int, int]], tuple[int, int, int | None, int | None]]:
    """Pure session fold (unit-testable without the streaming engine).

    ``ts_us`` must be sorted ascending. Returns (closed_sessions,
    (seq, n, start_us, last_us)) where each closed session is
    (seq, n_events, start_us, last_us).

    Detached late events (more than gap before the open session's start)
    fold into a LATE-RUN BUFFER rather than each closing as its own
    1-event session: a cluster of late events within gap of each other
    closes as ONE session, and a late run that backward-extension brings
    within gap of the open session merges into it — both matching the
    batch gap-session definition (ADVICE r2). The buffer is per-fold:
    late clusters split ACROSS batches still close separately, because a
    closed session is emitted exactly once (append mode) and cannot be
    retracted — the documented deviation from the batch oracle."""
    closed: list[tuple[int, int, int, int]] = []
    late_n, late_start, late_last = 0, None, None
    for t in ts_us:
        if start_us is None:
            seq, n, start_us, last_us = seq + 1, 1, t, t
        elif start_us - t > gap_us:
            # detached late event: fold into the late-run buffer
            if late_last is not None and t - late_last <= gap_us:
                late_n, late_last = late_n + 1, t
            else:
                if late_last is not None:
                    closed.append((seq, late_n, late_start, late_last))
                    seq += 1
                late_n, late_start, late_last = 1, t, t
        elif t < start_us:
            # late event within gap: extends the open session backward
            n += 1
            start_us = t
        elif t - last_us > gap_us:
            # a pending late run is older still: close it first so seq
            # numbers follow close order
            if late_last is not None:
                closed.append((seq, late_n, late_start, late_last))
                seq += 1
                late_start = late_last = None
            closed.append((seq, n, start_us, last_us))
            seq, n, start_us, last_us = seq + 1, 1, t, t
        else:
            n += 1
            last_us = max(last_us, t)
        # backward extension may have brought the open session within gap
        # of the buffered late run: merge them
        if late_last is not None and start_us - late_last <= gap_us:
            n += late_n
            start_us = late_start
            late_start = late_last = None
    if late_last is not None:
        closed.append((seq, late_n, late_start, late_last))
        seq += 1
    return closed, (seq, n, start_us, last_us)


def make_sessionizer(gap_seconds: int = 1800):
    """Returns the (key, pdf_iter, state) -> pdf_iter function for
    ``applyInPandasWithState``."""
    gap_us = gap_seconds * 1_000_000

    def sessionize(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, int]] = []

        if state.hasTimedOut:
            # watermark passed last_ts + gap: the open session closes; the
            # per-user counter stays in state (seq continuity)
            seq, n, start_us, last_us = state.get
            if start_us != _NO_SESSION:
                closed.append((seq, n, start_us, last_us))
            state.update((seq, 0, _NO_SESSION, _NO_SESSION))
        else:
            ts_us: list[int] = []
            for pdf in pdfs:
                ts_us.extend(
                    int(t.value // 1000)  # ns -> us
                    for t in pd.to_datetime(pdf["ts"])
                )
            ts_us.sort()
            if state.exists:
                seq, n, start_us, last_us = state.get
                if start_us == _NO_SESSION:
                    start_us = last_us = None
                    n = 0
            else:
                seq, n, start_us, last_us = 0, 0, None, None
            batch_closed, (seq, n, start_us, last_us) = fold_events(
                seq, n, start_us, last_us, ts_us, gap_us
            )
            closed.extend(batch_closed)
            if start_us is not None:
                state.update((seq, n, start_us, last_us))
                state.setTimeoutTimestamp(
                    last_us // 1000 + gap_seconds * 1000
                )
            else:
                state.update((seq, 0, _NO_SESSION, _NO_SESSION))

        yield pd.DataFrame(
            {
                "user_id": pd.Series([user_id] * len(closed), dtype="int64"),
                "session_seq": pd.Series(
                    [c[0] for c in closed], dtype="int64"
                ),
                "n_events": pd.Series([c[1] for c in closed], dtype="int64"),
                "session_start_epoch": pd.Series(
                    [c[2] // 1_000_000 for c in closed], dtype="int64"
                ),
                "session_end_epoch": pd.Series(
                    [c[3] // 1_000_000 for c in closed], dtype="int64"
                ),
            }
        )

    return sessionize


def sessionize_stream(events, gap_seconds: int = 1800, watermark: str = "30 minutes"):
    """event stream (user_id, ts, ...) -> closed-session stream.

    ``events`` must be a streaming DataFrame; output mode "append" (a
    session row appears exactly once, when it closes)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_seconds),
            SESSION_OUTPUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
