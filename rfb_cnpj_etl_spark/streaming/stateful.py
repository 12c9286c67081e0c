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
    # A key's micro-batch group can span SEVERAL pandas/Arrow chunks
    # (spark.sql.execution.arrow.maxRecordsPerBatch rows each), so the
    # single winner must be accumulated across the whole iterator and
    # emitted exactly once after it — one yield per chunk would leak
    # multiple rows per key per trigger into an append-only sink.
    # Total order matches the batch engine's last_writer_wins_agg:
    # (lsn, delete-priority) — on an LSN tie the delete wins.
    watermark = state.get[0] if state.exists else -1
    best: pd.DataFrame | None = None
    best_key = (watermark, -1)
    for pdf in pdfs:
        if pdf.empty:
            continue
        fresh = pdf[pdf["lsn"] > watermark]
        if fresh.empty:
            continue
        mx = int(fresh["lsn"].max())
        top = fresh[fresh["lsn"] == mx]
        if "op" in top.columns:
            dels = top[top["op"] == "delete"]
            prio = 1 if not dels.empty else 0
            row = dels.iloc[[0]] if prio else top.iloc[[0]]
        else:
            prio, row = 0, top.iloc[[0]]
        if (mx, prio) > best_key:
            best_key, best = (mx, prio), row
    if best is not None:
        state.update((best_key[0],))
        yield best
    else:
        state.update((watermark,))


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
