"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no stateful streaming at all (its only out-of-order
defense is the batch MERGE newest-wins predicate,
load_to_bigquery.py:102); this module supplies the arbitrary-state
surface Structured Streaming offers beyond built-in windows — the
"custom stateful operator" slot of SURVEY.md §2.I/§2.J.

Scale notes: state lives in the state store keyed by group (RocksDB
backend in production, `spark.sql.streaming.stateStore.providerClass`);
each micro-batch touches only the groups present in the batch. The
Arrow-batched pandas transfer means per-group Python cost is vectorized,
not per-row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FIRST_SEEN_SCHEMA = (
    "user_id long, event_type string, first_event_id long, first_ts timestamp, first_value double"
)
_STATE_SCHEMA = "ts timestamp, event_id long"


def first_seen_per_key(stream: DataFrame) -> DataFrame:
    """Streaming first-occurrence dedup: for each (user_id, event_type)
    emit the earliest event (by ts, then event_id) ever seen, keeping a
    one-row (ts, event_id) watermark in group state.

    Emits only when a batch improves on the stored minimum, so the
    update stream is the streaming equivalent of the batch
    ``row_number() OVER (PARTITION BY key ORDER BY ts, event_id) = 1``
    — which is exactly the oracle used to check it.
    """

    def _first_seen(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        best = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            cand = pdf.iloc[0]
            if best is None or (cand.ts, int(cand.event_id)) < (best.ts, int(best.event_id)):
                best = cand
        if best is None:
            return
        if state.exists:
            ts0, eid0 = state.get
            if (best.ts.to_pydatetime().replace(tzinfo=None), int(best.event_id)) >= (ts0, eid0):
                return  # no improvement: emit nothing this batch
        state.update((best.ts.to_pydatetime(), int(best.event_id)))
        yield pd.DataFrame(
            [
                {
                    "user_id": int(key[0]),
                    "event_type": key[1],
                    "first_event_id": int(best.event_id),
                    "first_ts": best.ts,
                    "first_value": float(best.value),
                }
            ]
        )

    return stream.groupBy("user_id", "event_type").applyInPandasWithState(
        _first_seen, FIRST_SEEN_SCHEMA, _STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )
