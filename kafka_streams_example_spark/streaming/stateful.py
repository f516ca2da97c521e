"""Custom stateful streaming operators via ``applyInPandasWithState``.

The Kafka Streams analogue is the Processor API with a keyed state store —
the escape hatch the reference never needed but a general engine must
expose. State here is per-key, watermark-expired, RocksDB-backed under the
standard provider config; the handler sees Arrow batches, not rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "panel STRING, total_count LONG, total_power DOUBLE"
STATE_SCHEMA = "count LONG, power DOUBLE"


def running_panel_totals(stream_df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Cross-batch running totals per panel — state the tumbling-window
    pipeline cannot express (it forgets closed windows; this never does).

    Output stream: one row per (panel, micro-batch-with-data) holding the
    cumulative count/power so far.
    """

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        count, power = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            count += len(pdf)
            power += float(pdf["power"].sum())
        state.update((count, power))
        yield pd.DataFrame(
            {"panel": [key[0]], "total_count": [count], "total_power": [power]}
        )

    return (
        stream_df.withWatermark(ts_col, "30 seconds")
        .groupBy("panel")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


SESSION_SCHEMA = "user_id LONG, session_start_us LONG, session_end_us LONG, n_events LONG"
SESSION_STATE = "start_us LONG, last_us LONG, n LONG"


def sessionize_with_timeout(
    stream_df: DataFrame,
    gap_seconds: int = 300,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Custom sessionization with EventTimeTimeout: a session row is
    emitted ONLY when the watermark passes last-event + gap (true
    emit-on-close semantics — ``F.session_window`` can do this for simple
    aggs; this operator is the template when per-session logic outgrows
    SQL: funnels, ordered patterns, abandonment detection).

    State per key: (start, last, count) — constant size, expired by the
    engine via the registered timeout.
    """
    from collections.abc import Iterator

    import pandas as pd

    gap_us = gap_seconds * 1_000_000

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start_us": [start_us],
                    "session_end_us": [last_us + gap_us],
                    "n_events": [n],
                }
            )
            return
        ts_us, n_new = [], 0
        for pdf in pdfs:
            vals = pdf[ts_col].astype("int64")  # pandas ns
            ts_us.extend((vals // 1000).tolist())
            n_new += len(pdf)
        lo, hi = min(ts_us), max(ts_us)
        if state.exists:
            start_us, last_us, n = state.get
            # same session while inside the gap; else close the old one now
            if lo - last_us > gap_us:
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "session_start_us": [start_us],
                        "session_end_us": [last_us + gap_us],
                        "n_events": [n],
                    }
                )
                start_us, last_us, n = lo, hi, n_new
            else:
                last_us, n = max(last_us, hi), n + n_new
        else:
            start_us, last_us, n = lo, hi, n_new
        state.update((start_us, last_us, n))
        state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        return

    return (
        stream_df.withWatermark(ts_col, "10 seconds")
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


try:
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor
except ImportError:  # Spark < 4.0: transformWithState API absent
    StatefulProcessor = object  # type: ignore[assignment,misc]


class RunningTotalsProcessor(StatefulProcessor):
    """Spark 4 ``StatefulProcessor`` for per-panel running totals — the
    ``transformWithStateInPandas`` successor to the
    ``applyInPandasWithState`` operator above (same output contract as
    ``running_panel_totals``). Demonstrates the typed-state handle API:
    named ValueState with a schema, explicit exists/get/update."""

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        count, power = (
            self._totals.get() if self._totals.exists() else (0, 0.0)
        )
        for pdf in rows:
            count += len(pdf)
            power += float(pdf["power"].sum())
        self._totals.update((count, power))
        yield pd.DataFrame(
            {"panel": [key[0]], "total_count": [count], "total_power": [power]}
        )

    def close(self) -> None:
        pass


def running_panel_totals_tws(stream_df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """``running_panel_totals`` on the transformWithStateInPandas API
    (Spark >= 4.0): arbitrary per-key state with named state variables,
    timers, and TTL support — the engine's forward path for custom
    stateful operators (applyInPandasWithState stays as the stable
    fallback). Requires the RocksDB state-store provider and
    google.protobuf on the driver (the TWS state protocol is
    protobuf-encoded)."""
    return (
        stream_df.withWatermark(ts_col, "30 seconds")
        .groupBy("panel")
        .transformWithStateInPandas(
            RunningTotalsProcessor(),
            outputStructType=RUNNING_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


ATTR_SCHEMA = "user_id LONG, channel STRING, cents LONG"
ATTR_STATE = "last_sec LONG, last_type STRING"
ATTR_WINDOW_S = 1800  # same lookback as queries.events.sessionized_attribution


def last_touch_attribution(stream_df: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``sessionized_attribution`` query
    (queries/events.py): per user, every purchase credits the most recent
    non-purchase event within the 30-minute lookback ('direct' when
    none), revenue in half-up cents. The per-key state is ONE (last_sec,
    last_type) pair carried across micro-batches, so the operator
    replays the batch window semantics incrementally — the
    batch/stream parity test pins exact channel-level equality on the
    same fixture.

    Expects columns: user_id LONG, event_type STRING, sec LONG (epoch
    seconds), event_id LONG, value DOUBLE. Rows within a micro-batch
    are sorted on (sec, event_id) before replay; cross-batch order is
    the source's responsibility (event logs are time-ordered at rest).
    Production would add a state TTL (EventTimeTimeout keyed on sec);
    the test exercises NoTimeout for determinism."""
    import math

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last_sec, last_type = state.get if state.exists else (-1, "")
        out_ch: list[str] = []
        out_cents: list[int] = []
        pdf = pd.concat(list(pdfs))
        pdf = pdf.sort_values(["sec", "event_id"])
        for r in pdf.itertuples():
            if r.event_type == "purchase":
                if last_type and (r.sec - last_sec) <= ATTR_WINDOW_S:
                    out_ch.append(last_type)
                else:
                    out_ch.append("direct")
                out_cents.append(int(math.floor(r.value * 100.0 + 0.5)))
            else:
                last_sec, last_type = int(r.sec), str(r.event_type)
        state.update((last_sec, last_type))
        if not out_ch:
            return
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out_ch),
                "channel": out_ch,
                "cents": out_cents,
            }
        )

    return stream_df.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=ATTR_SCHEMA,
        stateStructType=ATTR_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
