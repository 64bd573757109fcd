"""Pure-stdlib WAV (RIFF/WAVE PCM) codec for the multimodal decode slot.

Public knowledge only: the RIFF container (Microsoft/IBM 1991 spec,
as documented in every audio-format reference) over ``struct``. The
sibling of :mod:`.png` — together they upgrade the multimodal tier's
image AND audio decode kernels from "deterministic stub" to REAL
decodes for the two formats the standard library can carry end-to-end.

Scope is honest and explicit: uncompressed integer PCM (format tag 1),
8-bit unsigned or 16-bit signed little-endian, any channel count.
Compressed/float formats raise rather than pretending. The kernel runs
inside the Arrow-batched ``mapInPandas`` plumbing of
:mod:`.multimodal` — per-payload pure-Python work, no cross-row state.

:func:`wav_encode` is the minimal matching encoder used to build
deterministic test fixtures without any audio library.
"""

from __future__ import annotations

import hashlib
import struct

__all__ = ["wav_decode", "wav_encode", "wav_decoder"]


def wav_decode(payload: bytes) -> dict:
    """Decode a PCM WAV: returns ``{n_channels, sample_rate, bit_depth,
    n_frames, samples}`` where ``samples`` is the interleaved list of
    integer sample values (channel-major within each frame). Raises
    ``ValueError`` on anything that is not a well-formed integer-PCM
    RIFF/WAVE."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("wav: not a RIFF/WAVE payload")
    riff_size = struct.unpack("<I", payload[4:8])[0]
    if riff_size + 8 > len(payload):
        raise ValueError("wav: truncated payload (RIFF size exceeds data)")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            raise ValueError(f"wav: truncated {cid!r} chunk")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("wav: fmt chunk too short")
            (audio_format, n_channels, sample_rate, _byte_rate,
             block_align, bit_depth) = struct.unpack("<HHIIHH", body[:16])
            if audio_format != 1:
                raise ValueError(
                    f"wav: only integer PCM (format 1) supported, got {audio_format}"
                )
            if bit_depth not in (8, 16):
                raise ValueError(f"wav: only 8/16-bit PCM supported, got {bit_depth}")
            if n_channels < 1:
                raise ValueError("wav: zero channels")
            expect_align = n_channels * (bit_depth // 8)
            if block_align != expect_align:
                raise ValueError(
                    f"wav: block_align {block_align} != channels*bytes {expect_align}"
                )
            fmt = (n_channels, sample_rate, bit_depth, block_align)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("wav: missing fmt chunk")
    if data is None:
        raise ValueError("wav: missing data chunk")
    n_channels, sample_rate, bit_depth, block_align = fmt
    if len(data) % block_align != 0:
        raise ValueError("wav: data length not a multiple of the frame size")
    n_frames = len(data) // block_align
    if bit_depth == 16:
        samples = list(struct.unpack(f"<{n_frames * n_channels}h", data))
    else:  # 8-bit WAV is unsigned
        samples = list(data)
    return {
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "bit_depth": bit_depth,
        "n_frames": n_frames,
        "samples": samples,
    }


def wav_encode(
    samples, n_channels: int = 1, sample_rate: int = 16000, bit_depth: int = 16
) -> bytes:
    """Minimal PCM WAV encoder (test fixtures): ``samples`` is the
    interleaved integer list; its length must be a multiple of
    ``n_channels``."""
    if bit_depth not in (8, 16):
        raise ValueError(f"wav_encode: only 8/16-bit PCM, got {bit_depth}")
    if n_channels < 1:
        raise ValueError("wav_encode: need at least one channel")
    samples = list(samples)
    if len(samples) % n_channels != 0:
        raise ValueError("wav_encode: sample count not a multiple of channels")
    if bit_depth == 16:
        data = struct.pack(f"<{len(samples)}h", *samples)
    else:
        data = bytes(samples)
    block_align = n_channels * (bit_depth // 8)
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, bit_depth
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def wav_decoder(payload: bytes, modality: str) -> dict:
    """Real decode kernel for ``..multimodal.decode_media``'s slot
    (``set_decoder(wav_decoder)``): audio payloads are actually parsed —
    channel count, sample rate and frame count come from the RIFF
    chunks, not a hash of the bytes. Non-audio modalities report
    byte-level metadata only; an audio payload that is not a PCM WAV
    raises (a real decoder does not guess)."""
    meta = {
        "width": None,
        "height": None,
        "n_channels": None,
        "n_frames": None,
        "sample_rate": None,
        "byte_len": len(payload),
        "sha256": hashlib.sha256(payload).hexdigest(),
    }
    if modality == "audio":
        d = wav_decode(payload)
        meta.update(
            n_channels=d["n_channels"],
            sample_rate=d["sample_rate"],
            n_frames=d["n_frames"],
        )
    return meta
