"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference is a batch library with no streaming (SURVEY.md §2 Table
B); this is the engine-side extension the north star asks for: a
per-conversation running aggregate that survives across micro-batches
— arbitrary keyed state, the building block for sessionization,
dedup-across-batches, or incremental conversation rollups at stream
ingestion time.

State per ``conv_id``: (n_turns, total_chars, max_turn_idx).  Each
micro-batch folds its rows into the state and emits the updated
snapshot row, so the sink always holds the latest per-conversation
rollup (output mode ``update``).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, n_turns long, total_chars long, max_turn_idx int"
)
STATE_SCHEMA = "n_turns long, total_chars long, max_turn_idx int"


def _update_conversation(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n_turns, total_chars, max_turn = state.get
    else:
        n_turns, total_chars, max_turn = 0, 0, -1
    for pdf in pdfs:
        n_turns += len(pdf)
        total_chars += int(pdf["text"].str.len().fillna(0).sum())
        if len(pdf):
            max_turn = max(max_turn, int(pdf["turn_idx"].max()))
    state.update((n_turns, total_chars, max_turn))
    yield pd.DataFrame(
        [{
            "conv_id": key[0],
            "n_turns": n_turns,
            "total_chars": total_chars,
            "max_turn_idx": max_turn,
        }]
    )


def conversation_rollup_stream(stream_df: DataFrame) -> DataFrame:
    """Keyed running rollup per conversation across micro-batches."""
    return (
        stream_df.groupBy("conv_id")
        .applyInPandasWithState(
            _update_conversation,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_rollup_to_parquet(rolled: DataFrame, out_dir: str, checkpoint_dir: str):
    """Run the rollup with a RECOVERABLE sink and drain what's available.

    ``foreachBatch`` appending snapshot rows to parquet supports
    checkpoint recovery: a restarted query with the same checkpoint
    resumes the keyed state and processes only new input (verified:
    appended files continue counts, untouched conversations are not
    re-emitted).  The in-memory sink used by tests does NOT support
    recovery — restarting on its checkpoint raises
    ``AnalysisException: This query does not support recovering…`` —
    so resumable deployments must use this (or another fault-tolerant
    sink), not ``format("memory")``.
    """
    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        rolled.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q
