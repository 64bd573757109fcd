"""Multimodal columns (SURVEY.md §2.14): images/audio/video as opaque
``binary`` payloads with typed metadata, processed via Arrow-batched
``mapInPandas``.

The decode kernels themselves are STUBBED — image/audio libraries are not
in this environment — behind ``set_decoder``: the default
``fake_decoder`` derives deterministic metadata from the bytes (so the
Spark-side plumbing — schema, batching, partitioning — is real and
testable end-to-end), and a real decoder (PIL/ffmpeg/librosa) drops into
the same slot in production. ``strict=True`` raises NotImplementedError
instead, making the stub explicit.

Scale notes: payloads stay in executor memory one Arrow batch at a time
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch bytes);
no payload ever moves to the driver. Feature extraction emits only the
small metadata struct, so downstream stages shuffle metadata, not blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_FIELDS = (
    "width bigint, height bigint, n_channels bigint, "
    "n_frames bigint, sample_rate bigint, byte_len bigint, sha256 string"
)


def fake_decoder(payload: bytes, modality: str) -> dict:
    """Deterministic stand-in for a real media decoder. Metadata is a pure
    function of the payload bytes — reproducible across engines, which is
    what makes the plumbing oracle-checkable."""
    n = len(payload)
    meta = {
        "width": None,
        "height": None,
        "n_channels": None,
        "n_frames": None,
        "sample_rate": None,
        "byte_len": n,
        "sha256": hashlib.sha256(payload).hexdigest(),
    }
    if modality == "image":
        meta.update(width=1 + n % 640, height=1 + n % 480, n_channels=3)
    elif modality == "video":
        meta.update(
            width=1 + n % 640, height=1 + n % 480, n_channels=3, n_frames=1 + n % 32
        )
    elif modality == "audio":
        meta.update(n_channels=1 + n % 2, sample_rate=16000, n_frames=1 + n % 48000)
    return meta


_DECODER: Callable[[bytes, str], dict] = fake_decoder


def set_decoder(fn: Callable[[bytes, str], dict]) -> None:
    global _DECODER
    _DECODER = fn


def decode_media(
    df: DataFrame,
    payload_col: str = "payload",
    modality_col: str = "modality",
    strict: bool = False,
) -> DataFrame:
    """Attach a ``media`` metadata struct decoded from the binary payload.

    Runs as mapInPandas: one Arrow batch of payloads in, the same rows +
    metadata columns out. With ``strict=True`` the stub refuses to decode
    (NotImplementedError) — the honest mode until a real decoder is set.
    """
    if strict and _DECODER is fake_decoder:
        raise NotImplementedError(
            "no real media decoder installed in this environment; "
            "use set_decoder(...) or strict=False for the deterministic stub"
        )
    decoder = _DECODER
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema += ", " + DECODED_FIELDS

    meta_cols = [s.split()[0] for s in DECODED_FIELDS.split(", ")]

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                decoder(bytes(p) if p is not None else b"", m)
                for p, m in zip(pdf[payload_col], pdf[modality_col])
            ]
            for c in meta_cols:
                pdf[c] = [meta[c] for meta in metas]
            yield pdf

    return df.mapInPandas(decode_batches, schema=out_schema)


def with_binary_payload(
    df: DataFrame, source_col: str = "text", modality: str = "image"
) -> DataFrame:
    """Testdata adapter: wrap a string column as an opaque binary payload
    plus modality tag (the testdata ships no real media bytes)."""
    return df.withColumn("payload", F.encode(F.col(source_col), "UTF-8")).withColumn(
        "modality", F.lit(modality)
    )
