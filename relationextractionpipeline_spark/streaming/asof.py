"""As-of join lifted to Structured Streaming — the stateful counterpart of
``operators/asof.py`` (same contract: each left event matches the latest
right event with ``ts_right <= ts_left`` on its key, greatest event_id
breaking timestamp ties).

Under streaming, both sides arrive interleaved and out of order across
micro-batches, so the join becomes a **custom stateful operator**:
``applyInPandasWithState`` keyed by the join key, with an event-time
watermark deciding when a left event's match is FINAL — a right event
that could still beat the current candidate must have event time ≤ the
left's, and once the watermark passes the left's timestamp no such row
can arrive anymore.  Hence:

* left events buffer until ``watermark >= ts_left``, then emit exactly
  once with the winning right row (or nulls — left-join semantics);
* right events buffer per key, PRUNED to the single best row at-or-below
  the watermark plus every row above it (a right row dominated by a
  later-(ts, id) right that is itself final can never win again) — state
  per key is O(out-of-order horizon), not O(history);
* an event-time timeout at the earliest pending left's timestamp flushes
  matches for keys that receive no further traffic;
* rows behind the watermark are dropped by the engine (documented
  late-data semantics — the same trade the stateful assembly makes).

Batch≡stream equivalence is tested by draining the events table through
this operator and comparing against ``operators/asof.asof_join``
(tests/test_streaming.py).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import SparkSession, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("matched_event_id", T.LongType(), True),
        T.StructField("matched_ts_ms", T.LongType(), True),
        T.StructField("matched_value", T.DoubleType(), True),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        # pending left events awaiting watermark finality
        T.StructField("l_ids", T.ArrayType(T.LongType()), False),
        T.StructField("l_ts", T.ArrayType(T.LongType()), False),
        # buffered right events (pruned)
        T.StructField("r_ids", T.ArrayType(T.LongType()), False),
        T.StructField("r_ts", T.ArrayType(T.LongType()), False),
        T.StructField("r_val", T.ArrayType(T.DoubleType()), False),
    ]
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def _asof_fn(left_type: str, right_type: str):
    def fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        l_ids: list = []
        l_ts: list = []
        r_ids: list = []
        r_ts: list = []
        r_val: list = []
        if state.exists:
            a, b, c, d, e = state.get
            l_ids, l_ts = list(a), list(b)
            r_ids, r_ts, r_val = list(c), list(d), list(e)
        if not state.hasTimedOut:
            for pdf in pdfs:
                # unit-explicit: datetime64 columns arrive as [us] or [ns]
                # depending on the Arrow path
                ts_ms = (
                    pdf["ts"].values.astype("datetime64[ms]").astype("int64")
                ).tolist()
                for i, et in enumerate(pdf["event_type"]):
                    if et == left_type:
                        l_ids.append(int(pdf["event_id"].iloc[i]))
                        l_ts.append(int(ts_ms[i]))
                    elif et == right_type:
                        r_ids.append(int(pdf["event_id"].iloc[i]))
                        r_ts.append(int(ts_ms[i]))
                        # preserve nulls: float(NaN) stored NaN where the
                        # batch asof_join emits NULL — NaN breaks IS NULL
                        # filters and the batch≡stream comparison
                        v = pdf["value"].iloc[i]
                        r_val.append(None if pd.isna(v) else float(v))
        wm = state.getCurrentWatermarkMs()

        # emit every left the watermark has finalized; keep the rest
        rights = sorted(zip(r_ts, r_ids, r_val))
        out_rows = []
        keep_ids, keep_ts = [], []
        for lid, lts in sorted(zip(l_ids, l_ts), key=lambda p: (p[1], p[0])):
            # STRICT: finalize only below the watermark.  The engine drops
            # rows strictly older than the watermark, so a right event with
            # rt == wm == lts can still arrive in a later batch — emitting
            # the left at equality would be premature and uncorrectable in
            # append mode (sessionize.py handles this boundary the same way)
            if lts >= wm:
                keep_ids.append(lid)
                keep_ts.append(lts)
                continue
            best = None
            for rt, rid, rv in rights:  # small pruned list; last eligible wins
                if rt <= lts:
                    best = (rid, rt, rv)
                else:
                    break
            out_rows.append(
                (user_id, lid, lts) + (best if best else (None, None, None))
            )

        # prune rights: among rows final under the watermark only the best
        # (max (ts, id)) can ever win again; rows above the watermark stay
        final = [r for r in rights if r[0] <= wm]
        keep_r = ([max(final)] if final else []) + [r for r in rights if r[0] > wm]
        if not keep_ids and not keep_r:
            state.remove()
        else:
            state.update(
                (
                    keep_ids,
                    keep_ts,
                    [r[1] for r in keep_r],
                    [r[0] for r in keep_r],
                    [r[2] for r in keep_r],
                )
            )
            if keep_ids:
                # flush pending lefts once event time passes them, even if
                # the key never sees another row
                state.setTimeoutTimestamp(max(min(keep_ts), wm + 1))
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "user_id", "event_id", "ts_ms",
                    "matched_event_id", "matched_ts_ms", "matched_value",
                ],
            )

    return fn


def stream_asof_join(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    left_type: str = "purchase",
    right_type: str = "view",
    watermark: str = "10 seconds",
    max_files_per_trigger: int = 2,
) -> None:
    """Drain ``input_dir`` (events-shaped parquet) and append the finalized
    as-of matches for every ``left_type`` event the watermark has passed.
    State still open when the backlog drains stays in the checkpoint and
    emits on a later run (same availableNow contract as the stateful
    assembly)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
        .where(F.col("event_type").isin(left_type, right_type))
        .withWatermark("ts", watermark)
    )
    joined = stream.groupBy("user_id").applyInPandasWithState(
        _asof_fn(left_type, right_type),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
