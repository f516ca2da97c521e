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
