"""Gap-based sessionization lifted to Structured Streaming — the stateful
counterpart of the batch ``q_events_sessionized`` window composition
(lag → gap flag → running sum), same contract: events order by
(ts, event_id) per user, a gap > ``gap_s`` seconds opens a new session,
sessions number 0, 1, 2, … per user in order.

Spark's built-in ``session_window`` aggregation can produce the
(start, end, count) rollup, but not the stable per-user ordinal the batch
query emits (and downstream joins key on), so this is a custom stateful
operator: ``applyInPandasWithState`` keyed by user, with the event-time
watermark deciding when a session is FINAL:

* any event still able to EXTEND a session must satisfy
  ``ts − session_end <= gap`` and ``ts > watermark`` (older rows are
  dropped by the engine), so a session with
  ``session_end + gap <= watermark`` can never grow — emit exactly once;
* state per user is the ordered event buffer of NON-final sessions plus
  the next session ordinal — O(out-of-order horizon), not O(history);
* an event-time timeout at ``last_event + gap + 1`` flushes the trailing
  session of a user that never sends another event.

Batch≡stream equivalence is tested by draining the events table through
this operator and comparing against the batch window composition
(tests/test_streaming.py).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import SparkSession, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .asof import EVENTS_SCHEMA

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("start_epoch", T.LongType(), False),
        T.StructField("end_epoch", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        # ordered buffer of events in not-yet-final sessions
        T.StructField("ts_ms", T.ArrayType(T.LongType()), False),
        T.StructField("ids", T.ArrayType(T.LongType()), False),
        # ordinal the next finalized session takes
        T.StructField("next_sid", T.LongType(), False),
    ]
)


def _sessionize_fn(gap_s: int):
    # the batch query compares unix_timestamp() differences — SECOND
    # resolution, floored — so the gap test here floors ms → s too;
    # sub-second ordering can't move a session boundary (a same-second
    # pair always has gap 0) and start/end epochs are min/max, so the
    # contract matches the batch composition bit-for-bit
    gap = int(gap_s)

    def fn(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        buf_ts: list = []
        buf_ids: list = []
        next_sid = 0
        if state.exists:
            a, b, next_sid = state.get
            buf_ts, buf_ids = list(a), list(b)
        if not state.hasTimedOut:
            for pdf in pdfs:
                ts_ms = (
                    pdf["ts"].values.astype("datetime64[ms]").astype("int64")
                ).tolist()
                buf_ts.extend(int(t) for t in ts_ms)
                buf_ids.extend(int(i) for i in pdf["event_id"])
        wm = state.getCurrentWatermarkMs()

        events = sorted(zip(buf_ts, buf_ids))
        # split the ordered buffer into gap-delimited sessions
        sessions: list = []
        for t, i in events:
            if sessions and t // 1000 - sessions[-1][-1][0] // 1000 <= gap:
                sessions[-1].append((t, i))
            else:
                sessions.append([(t, i)])
        out_rows = []
        keep: list = []
        for s in sessions:
            # final iff even a same-second-as-watermark future event
            # couldn't extend it: wm_s > end_s + gap
            if not keep and wm // 1000 > s[-1][0] // 1000 + gap:
                # final: nothing arriving above the watermark can extend it
                out_rows.append(
                    (
                        user_id,
                        next_sid,
                        len(s),
                        s[0][0] // 1000,
                        s[-1][0] // 1000,
                    )
                )
                next_sid += 1
            else:
                # a later session can only be final if every earlier one is
                # (sessions are time-ordered), so keep the whole tail
                keep.extend(s)

        if not keep and not out_rows:
            state.remove()
        elif not keep:
            # counter must survive even with an empty buffer
            state.update(([], [], next_sid))
        else:
            state.update(
                ([t for t, _ in keep], [i for _, i in keep], next_sid)
            )
            state.setTimeoutTimestamp(
                max((keep[-1][0] // 1000 + gap + 1) * 1000, wm + 1)
            )
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "user_id", "session_id", "n_events",
                    "start_epoch", "end_epoch",
                ],
            )

    return fn


def stream_sessionize(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_s: int = 1800,
    watermark: str = "10 seconds",
    max_files_per_trigger: int = 2,
) -> None:
    """Drain ``input_dir`` (events-shaped parquet) and append one row per
    FINALIZED session (watermark past session_end + gap).  Sessions still
    open when the backlog drains stay in the checkpoint and emit on a
    later run (same availableNow contract as the stateful assembly)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
        .withWatermark("ts", watermark)
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_s),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
