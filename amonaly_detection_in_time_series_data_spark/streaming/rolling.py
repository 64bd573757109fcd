"""Structured Streaming tier (SURVEY.md §2.11 — none in the reference;
the batch operators are naturally incremental per key, so the engine
exposes streaming variants).

- :func:`replay_events_stream` — replays an events parquet directory as a
  file stream (the standard backfill/replay harness; in production the
  source would be Kafka/files landing continuously).
- :func:`streaming_windowed_stats` — watermarked sliding-window mean/std
  per user: the streaming analogue of the F3 rolling aggregates, with
  late data beyond the watermark dropped (watermark-discard semantics —
  the batch reference has no late-data concept).
- :func:`streaming_zscore_flags` — stateful per-user anomaly flags via
  ``applyInPandasWithState``: keeps the last N values per user and emits
  a z-score flag per event — the exact rolling-zscore contract, online.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def replay_table_stream(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Replay any testdata table as a bounded file stream.

    The file stream source requires a directory, so the single parquet
    file is symlinked into a scratch dir. No type fixing — callers that
    need the events ns-timestamp rule use :func:`replay_events_stream`.
    """
    import tempfile

    src = os.path.join(sf_dir, f"{table}.parquet")
    stream_dir = os.path.join(
        tempfile.gettempdir(), f"{table}_stream_{abs(hash(sf_dir)) % 10**8}"
    )
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, f"{table}.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)

    schema = spark.read.parquet(src).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stream_dir)
    )


def replay_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Replay the events table as a bounded file stream.

    The testdata's ns-precision timestamp arrives as an int64 (legacy
    nanosAsLong) and is converted to TimestampType by integer division
    to µs — same rule as the batch reader (sources.readers.load_table);
    a plain cast would misread it as seconds.
    """
    stream = replay_table_stream(spark, sf_dir, "events", max_files_per_trigger)
    from pyspark.sql import types as T

    if isinstance(stream.schema["ts"].dataType, T.LongType):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def streaming_windowed_stats(
    events: DataFrame,
    window: str = "24 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window per-user value stats with event-time watermarking."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), F.col("user_id"))
        .agg(
            F.avg("value").alias("mean_value"),
            F.stddev_samp("value").alias("std_value"),
            F.count("*").alias("n"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "user_id",
            "mean_value",
            "std_value",
            "n",
        )
    )


def streaming_zscore_flags(
    events: DataFrame,
    window_rows: int = 24,
    threshold: float = 3.0,
    timeout_minutes: int | None = 60,
) -> DataFrame:
    """Online rolling z-score per user via per-key state.

    State = the last ``window_rows`` values per user (a bounded deque);
    each incoming batch is scored against the state *then* appended —
    reproducing the batch past-only frame [t-w, t-1] when events arrive
    in order. The Arrow-batched ``applyInPandasWithState`` keeps Python
    work vectorized per key-batch.
    """
    import pandas as pd  # noqa: F401 (used inside the state fn)
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "user_id bigint, event_id bigint, ts timestamp, value double, "
        "zscore double, is_anomaly int"
    )
    state_schema = "values array<double>"

    def score(key, pdf_iter, state):
        import math

        import pandas as pd

        (user_id,) = key
        buf = list(state.get[0]) if state.exists else []
        rows = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "event_id"])
            for _, r in pdf.iterrows():
                hist = buf[-window_rows:]
                n = len(hist)
                if n >= 2:
                    mu = sum(hist) / n
                    var = sum((x - mu) ** 2 for x in hist) / (n - 1)
                    sd = math.sqrt(var)
                    z = (r["value"] - mu) / sd if sd > 0 else None
                else:
                    z = None
                rows.append(
                    (
                        user_id,
                        int(r["event_id"]),
                        r["ts"],
                        float(r["value"]) if r["value"] is not None else None,
                        z,
                        int(z is not None and abs(z) > threshold),
                    )
                )
                if r["value"] is not None:
                    buf.append(float(r["value"]))
        state.update((buf[-window_rows:],))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            rows,
            columns=["user_id", "event_id", "ts", "value", "zscore", "is_anomaly"],
        )

    return (
        events.withWatermark("ts", "2 hours")
        .groupBy("user_id")
        .applyInPandasWithState(
            score,
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


def streaming_dedup(
    events: DataFrame, key_cols=("event_id",), watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup: watermarked ``dropDuplicates`` on the key.

    State = one entry per key seen within the watermark horizon, so
    state size is bounded by (arrival rate x horizon), not stream
    length — the streaming analogue of batch ``dedup_exact``/O3.
    """
    return events.withWatermark("ts", watermark).dropDuplicates(list(key_cols))


def streaming_enrich(events: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static broadcast join — each microbatch joins against the
    (broadcast) static dimension; no stream-side state at all."""
    return events.join(F.broadcast(dim), on)
