"""[EXT E19+] Spark 4 ``transformWithStateInPandas`` — the successor to
``applyInPandasWithState`` (streaming/ref_emulation.py) with TYPED state
primitives (ValueState / ListState / MapState) and timers, replacing the
single opaque state tuple.

The operator here maintains per-user lifetime counters: total events
(ValueState) and the distinct event-type set (MapState used as a set) —
the profile-store shape of a 100 TB event pipeline, where per-key state
lives in the state store (RocksDB in production) and only updates flow.

ENVIRONMENT GATE: the transformWithState state-server protocol needs
``google.protobuf`` on the driver, which this container lacks (and
installs are off-limits), so the operator is NOT registered as a query
— tests/test_streaming.py exercises it when the dependency exists and
skips otherwise.  The applyInPandasWithState ref-emulation
(q_stream_ref_emulation) remains the registered arbitrary-state path.

Scale shape: state is partitioned by user_id across the state store's
shuffle partitions; each micro-batch touches only the keys present in
the batch, and emission is one row per touched key per batch (update
semantics).  Counters are monotone, so the replay's final value per key
is ``max`` over emissions — which is what the query wrapper takes, and
what makes the whole path oracle-checkable against the batch aggregate.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "user_id long, n_events long, n_types long"


class UserProfileProcessor(StatefulProcessor):
    """Per-user lifetime profile: event count + distinct-type count."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._n = handle.getValueState("n_events", "n long")
        self._types = handle.getMapState("types", "t string", "one int")

    def handleInputRows(self, key, rows, timerValues):
        n = self._n.get()[0] if self._n.exists() else 0
        for pdf in rows:
            n += len(pdf)
            for t in pdf["event_type"]:
                self._types.updateValue((str(t),), (1,))
        self._n.update((n,))
        n_types = sum(1 for _ in self._types.keys())
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "n_types": [n_types]}
        )

    def close(self) -> None:
        pass


def user_profile_stream(events: DataFrame) -> DataFrame:
    """Wire a streaming events frame through the stateful processor.
    ``events`` must carry (user_id, event_type)."""
    return (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            UserProfileProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
