"""Spark 4 `transformWithStateInPandas` operators — the successor API
to `applyInPandasWithState` (windows.py keeps one of those too, so both
stateful surfaces are covered): typed per-key state handles
(ValueState/ListState/MapState), timers, and TTL managed by the engine,
with Arrow-batched pandas UDF execution.

Operator here: per-key admission quota — the crawl-politeness /
per-domain document cap every large-scale ingestion pipeline enforces
(cap what one source can contribute before it floods the corpus mix).
State is ONE (seen, admitted) pair per key, so the state store stays
O(distinct keys) regardless of throughput.

Environment note: transformWithState's Python state-server protocol is
protobuf-based, so executing it needs `google.protobuf` (optional
dependency, absent in minimal installs; the operator itself has no
import-time dependency on it). tests/test_streaming.py gates the
end-to-end run on that import; `applyInPandasWithState`
(windows.py:stateful_anomaly_counts) is the dependency-free stateful
path this repo runs everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

QUOTA_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("batch_seen", T.LongType(), False),
        T.StructField("batch_admitted", T.LongType(), False),
        T.StructField("total_seen", T.LongType(), False),
        T.StructField("total_admitted", T.LongType(), False),
    ]
)


class QuotaProcessor(StatefulProcessor):
    """Admit at most `quota` rows per key across the stream's lifetime;
    emit per-batch admission counts plus the running totals."""

    def __init__(self, quota: int) -> None:
        self._quota = quota

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "quota_totals", "total_seen BIGINT, total_admitted BIGINT"
        )

    def handleInputRows(self, key, rows, timerValues):  # noqa: N802 (API name)
        import pandas as pd

        (user_id,) = key
        total_seen, total_admitted = (
            self._state.get() if self._state.exists() else (0, 0)
        )
        batch_seen = batch_admitted = 0
        for pdf in rows:
            n = len(pdf)
            take = max(0, min(self._quota - total_admitted - batch_admitted, n))
            batch_seen += n
            batch_admitted += take
        total_seen += batch_seen
        total_admitted += batch_admitted
        self._state.update((total_seen, total_admitted))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "batch_seen": [batch_seen],
                "batch_admitted": [batch_admitted],
                "total_seen": [total_seen],
                "total_admitted": [total_admitted],
            }
        )

    def close(self) -> None:
        pass


def quota_admission(events: DataFrame, quota: int = 5) -> DataFrame:
    """Per-user lifetime admission quota over a stream of events."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=QuotaProcessor(quota),
        outputStructType=QUOTA_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
