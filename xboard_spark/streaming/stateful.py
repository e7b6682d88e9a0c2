"""Custom stateful streaming operator via ``applyInPandasWithState`` — the
escape hatch for semantics the built-in windows can't express (SURVEY.md
§7 / the Structured Streaming model of Armbrust et al., SIGMOD 2018).

The example operator is a per-user running profile with inactivity timeout:
it maintains (event count, value sum, last seen) per user across
micro-batches and EMITS a final "session summary" row only when the user
goes quiet past the timeout — something dropDuplicates/window cannot do
because the emission is state-timeout-driven, not watermark-window-driven.
State lives in the executor state store keyed by user (scales horizontally
with keys; nothing on the driver).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen_ms", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("closed_by_timeout", T.BooleanType()),
    ]
)


def _make_update_user_profile(timeout_ms: int):
    def _update_user_profile(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, total, _ = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    # round exactly like the in-flight branch: the final
                    # timeout row must agree with its last update row
                    "total_value": [round(total, 2)],
                    "closed_by_timeout": [True],
                }
            )
            return

        n, total, last_ms = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                last_ms = max(
                    last_ms, int(pdf["ts"].max().value // 1_000_000)
                )
        state.update((n, total, last_ms))
        state.setTimeoutDuration(timeout_ms)  # close after idle period
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "closed_by_timeout": [False],
            }
        )

    return _update_user_profile


def user_profiles_stream(
    events_stream: DataFrame, timeout_ms: int = 30_000
) -> DataFrame:
    """events (ts, user_id, value) -> running per-user profile rows, with a
    timeout-closed summary row when a user goes quiet for ``timeout_ms``
    of processing time (closure factory, not a default-arg lambda — the
    timeout must bind at plan build)."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _make_update_user_profile(timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def user_counters_tws(stream, output_mode: str = "Update"):
    """Per-user lifetime counters via Spark 4's ``transformWithStateInPandas``
    — the successor API to ``applyInPandasWithState`` (explicit typed state
    variables with per-state TTL and timer support instead of one opaque
    tuple). State here is a single ValueState (n_events, total_value);
    each micro-batch emits the UPDATED counters for the keys it touched.
    State lives in the checkpoint: a restarted query resumes the counts —
    the property the pytest proves by running two availableNow passes over
    one growing directory with the same checkpoint.

    At scale this is the RocksDB state-store path: state is partitioned by
    the grouping key, and only touched keys are read per batch.

    Container gate (same honesty contract as the Kafka source): the TWS
    Python worker speaks protobuf to the JVM state server, and this
    container's google.protobuf install is broken — the pytest SKIPs here
    with that reason and runs anywhere protobuf imports; the operator code
    is the real production path either way."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql import types as T
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )

    class Counters(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "counters", "n BIGINT, total DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = 0, 0.0
            if self._state.exists():
                prev = self._state.get()
                n, total = prev[0], prev[1]
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    return (
        stream.groupBy("user_id")
        .transformWithStateInPandas(
            Counters(),
            outputStructType=out_schema,
            outputMode=output_mode,
            timeMode="None",
        )
    )
