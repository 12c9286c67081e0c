"""Custom stateful streaming operator: online LWW watermark filter.

``applyInPandasWithState`` keeps, per key, the highest LSN applied so
far and lets only strictly-newer events through — the streaming twin of
the batch engine's LWW dedup (reference analog: the INSERT OR IGNORE /
window-delete pair, ``db/sqlite_loader.py:56`` +
``utils/db_patch.py:60-87``, running continuously instead of post-hoc).

Use it in front of a sink that cannot do its own keyed dedup (e.g. an
append-only log), or to shrink re-delivered micro-batches before the
MERGE. State is one long per key — at 10^10 events the state store
holds |keys| longs, partitioned by the shuffle on the key columns.

The per-batch arrow transfer is vectorized (pandas batches, no per-row
Python): each group processes its rows with numpy argmax, not a loop.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

#: state schema: highest LSN seen per key
_STATE_SCHEMA = StructType([StructField("max_lsn", LongType())])


def _lww_filter_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    max_lsn = state.get[0] if state.exists else -1
    for pdf in pdfs:
        if pdf.empty:
            continue
        # keep only events newer than the stored watermark, then — if
        # several survive for this key — only the last writer
        fresh = pdf[pdf["lsn"] > max_lsn]
        if fresh.empty:
            continue
        idx = fresh["lsn"].idxmax()
        max_lsn = int(fresh["lsn"].loc[idx])
        yield fresh.loc[[idx]]
    state.update((max_lsn,))


def lww_stateful_filter(
    stream: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """events stream → per-key last-writer rows, stateful across
    micro-batches. Output schema = input schema."""
    keys = keys or ["repo", "path"]
    out_schema = stream.schema
    return (
        stream.groupBy(*keys)
        .applyInPandasWithState(
            _lww_filter_fn,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
