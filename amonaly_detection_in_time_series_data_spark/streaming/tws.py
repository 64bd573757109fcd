"""Sequence assembly on the Spark 4.x ``transformWithStateInPandas``
API (SURVEY.md §2.11 / §7 M7 — the engine's modern stateful tier).

Same contract as ``streaming.sequences.streaming_sequences`` (the
``applyInPandasWithState`` implementation): per-key overlapping
length-L windows emitted as each new row completes one. TWS advantages
at scale: typed per-key state handles (ValueState with optional TTL),
multiple state variables per processor, timers, and RocksDB-backed
state with changelog checkpointing — the right substrate for
100 TB-scale keyed state.

Environment note: TWS Python workers require ``google.protobuf``
(Spark's state-server protocol); where it is unavailable the
``applyInPandasWithState`` implementation in streaming.sequences is the
tested, equivalent path (its parity test always runs; the TWS parity
test skips when protobuf is absent).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUT_SCHEMA = (
    "user_id bigint, start_ts timestamp, end_ts timestamp, seq array<double>"
)


class SequenceAssembler(StatefulProcessor):
    """Keeps the last L-1 (value, epoch-µs) pairs per key; emits a
    completed sequence per arriving row once the buffer is full."""

    def __init__(self, value_col: str, seq_len: int, ttl_ms: int | None = None):
        self._value_col = value_col
        self._seq_len = seq_len
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._buf = handle.getValueState(
            "buf", "vals array<double>, ts_us array<bigint>", self._ttl_ms
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if self._buf.exists():
            vals, ts_us = list(self._buf.get()[0]), list(self._buf.get()[1])
        else:
            vals, ts_us = [], []
        L = self._seq_len
        out = []
        for pdf in rows:
            pdf = pdf.sort_values(["ts", "event_id"])
            us = (pdf["ts"].astype("int64") // 1000).tolist()
            for v, t in zip(pdf[self._value_col].tolist(), us):
                vals.append(float(v) if v is not None else None)
                ts_us.append(int(t))
                if len(vals) >= L:
                    vals, ts_us = vals[-L:], ts_us[-L:]
                    out.append((user_id, ts_us[0], ts_us[-1], list(vals)))
        # L=1 guard: vals[-0:] would keep the whole history (unbounded state)
        keep = L - 1 if L > 1 else 0
        self._buf.update((vals[-keep:] if keep else [], ts_us[-keep:] if keep else []))
        yield pd.DataFrame(out, columns=["user_id", "start_us", "end_us", "seq"])

    def close(self) -> None:
        pass


def streaming_sequences_tws(
    events: DataFrame,
    value_col: str = "value",
    seq_len: int = 24,
    ttl_ms: int | None = None,
) -> DataFrame:
    """``transformWithStateInPandas`` variant of streaming sequence
    assembly. Output matches ``streaming_sequences``: (user_id,
    start_ts, end_ts, seq)."""
    from pyspark.sql import functions as F

    raw = (
        events.groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SequenceAssembler(value_col, seq_len, ttl_ms),
            outputStructType=(
                "user_id bigint, start_us bigint, end_us bigint, seq array<double>"
            ),
            outputMode="append",
            timeMode="None",
        )
    )
    return raw.select(
        "user_id",
        F.timestamp_micros("start_us").alias("start_ts"),
        F.timestamp_micros("end_us").alias("end_ts"),
        "seq",
    )
