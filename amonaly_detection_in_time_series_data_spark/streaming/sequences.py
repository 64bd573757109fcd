"""Stateful streaming sequence assembly (SURVEY.md §2.6 F5, online).

The batch operator ``operators.sequences.create_sequences`` emits every
overlapping length-L window of the feature series (stride 1). The
streaming variant reproduces that incrementally: per-key state holds the
last L-1 values; each arriving row appends and, once the buffer reaches
L, emits the completed sequence tagged with its start timestamp —
exactly the batch output when the stream is replayed in order.

State is bounded (L values + timestamps per key), so this scales to any
key cardinality; Arrow-batched ``applyInPandasWithState`` keeps the
per-key work in pandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_sequences(
    events: DataFrame,
    value_col: str = "value",
    seq_len: int = 24,
    timeout_minutes: int | None = 60,
) -> DataFrame:
    """Per-user overlapping length-``seq_len`` sequences, assembled online.

    Output: one row per completed sequence — (user_id, start_ts, end_ts,
    seq array<double>) — matching the batch ``create_sequences`` rows
    whose window is full.
    """
    import pandas as pd  # noqa: F401
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "user_id bigint, start_ts timestamp, end_ts timestamp, "
        "seq array<double>"
    )
    state_schema = "vals array<double>, tss array<timestamp>"

    def assemble(key, pdf_iter, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            vals, tss = list(state.get[0]), list(state.get[1])
        else:
            vals, tss = [], []
        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "event_id"])
            for _, r in pdf.iterrows():
                v = r[value_col]
                vals.append(float(v) if v is not None else None)
                tss.append(r["ts"])
                if len(vals) >= seq_len:
                    vals = vals[-seq_len:]
                    tss = tss[-seq_len:]
                    out.append((user_id, tss[0], tss[-1], list(vals)))
        # Keep the last L-1 rows; for L=1 keep NOTHING — vals[-0:] is the
        # whole list, which would grow per-key state without bound.
        keep = seq_len - 1 if seq_len > 1 else 0
        state.update((vals[-keep:] if keep else [], tss[-keep:] if keep else []))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(out, columns=["user_id", "start_ts", "end_ts", "seq"])

    return (
        events.withWatermark("ts", "2 hours")
        .groupBy("user_id")
        .applyInPandasWithState(
            assemble,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_minutes is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
