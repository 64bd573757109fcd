"""Pure-stdlib GIF codec (GIF87a/89a) for the multimodal tier.

Public knowledge only: the GIF specification (CompuServe GIF89a, 1990)
over ``struct`` — no image library. This gives ``sample_frames`` a REAL
multi-frame decode path the way :mod:`.png` did for still images and
:mod:`.wav` for audio: header + logical-screen parse, global/local color
tables, a from-scratch variable-code-width LZW decoder (the GIF variant:
little-endian bit packing, CLEAR/EOI codes, 3..12-bit codes, 4096-entry
table), frame compositing honoring disposal methods 0-3 and the GCE
transparency index, and 4-pass de-interlacing.

Scope is honest and explicit: everything a legal GIF can contain is
either decoded or raises — there is no guessing path. The matching
:func:`gif_encode` (with a from-scratch LZW encoder) builds
deterministic animated fixtures for the tests without any image library.

The kernels run inside the Arrow-batched ``mapInPandas`` plumbing of
:mod:`.multimodal` — per-payload pure-Python work, no cross-row state,
so the 100 TB story is unchanged (batch-parallel, payloads never leave
the executor).
"""

from __future__ import annotations

import hashlib
import struct

__all__ = [
    "gif_decode",
    "gif_encode",
    "gif_decoder",
    "GIF87A",
    "GIF89A",
]

GIF87A = b"GIF87a"
GIF89A = b"GIF89a"

_MAX_CODE = 4096  # 12-bit LZW table bound (GIF spec)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: little-endian bit packing, CLEAR resets the
    table, EOI terminates, code width grows 1 bit whenever the table
    fills the current width (up to 12)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"lzw: bad minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    nbits = len(data) * 8
    pos = 0
    code_size = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    prev: bytes | None = None
    out = bytearray()
    while True:
        if pos + code_size > nbits:
            raise ValueError("lzw: code stream ended without EOI")
        byte_i = pos >> 3
        window = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (window >> (pos & 7)) & ((1 << code_size) - 1)
        pos += code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError(f"lzw: first code {code} out of range")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise ValueError(f"lzw: code {code} out of range")
            if len(table) < _MAX_CODE:
                table.append(prev + entry[:1])
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
        out += entry
        prev = entry


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """The matching encoder (fixture generator). Emits CLEAR up front,
    EOI at the end; on table overflow it freezes the dictionary
    (spec-legal "deferred clear").

    Code-width bookkeeping SIMULATES the decoder: the decoder appends
    one table entry per data code read after the first (it is one
    behind the encoder's dictionary) and widens when ITS table fills
    the current width — including on the FINAL data code, where the
    encoder's own dictionary no longer grows but the decoder's still
    does, so EOI can need the wider code. Tracking ``dec_table``
    explicitly instead of deriving width from the compression
    dictionary is what keeps the two sides aligned at that boundary
    (the naive derivation is off by one exactly there — caught by the
    roundtrip property tests)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"lzw: bad minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    acc_bits = 0
    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, acc_bits
        acc |= code << acc_bits
        acc_bits += code_size
        while acc_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            acc_bits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    dec_table = clear + 2  # the decoder's table size, simulated
    first = True
    emit(clear)

    def after_data_emit() -> None:
        nonlocal dec_table, code_size, first
        if first:
            first = False  # decoder does not append on its first code
            return
        if dec_table < _MAX_CODE:
            dec_table += 1
            if dec_table == (1 << code_size) and code_size < 12:
                code_size += 1

    w = b""
    for b in indices:
        if b >= clear:
            raise ValueError(f"lzw: index {b} exceeds code space {clear}")
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        after_data_emit()
        if next_code < _MAX_CODE:
            table[wc] = next_code
            next_code += 1
        w = bytes([b])
    if w:
        emit(table[w])
        after_data_emit()
    emit(eoi)
    if acc_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _read_color_table(payload: bytes, pos: int, n: int) -> tuple[list, int]:
    end = pos + 3 * n
    if end > len(payload):
        raise ValueError("gif_decode: truncated color table")
    tab = [tuple(payload[i : i + 3]) for i in range(pos, end, 3)]
    return tab, end


def _read_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("gif_decode: truncated data sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(payload):
            raise ValueError("gif_decode: truncated data sub-block")
        out += payload[pos : pos + n]
        pos += n


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: list, height: int) -> list:
    ordered = [None] * height
    it = iter(rows)
    for start, step in _INTERLACE_PASSES:
        for r in range(start, height, step):
            ordered[r] = next(it)
    return ordered


def gif_decode(payload: bytes) -> dict:
    """Decode a GIF to composited full-canvas RGB frames.

    Returns ``{width, height, n_frames, frames, delays_cs}``: ``frames``
    is one ``bytes`` buffer of ``height * width * 3`` RGB bytes per
    animation frame (partial frames composited onto the logical screen
    honoring disposal methods 0/1 keep, 2 restore-background, 3
    restore-previous, and the transparency index), ``delays_cs`` the
    per-frame GCE delays in centiseconds (0 when absent).

    Raises ``ValueError`` on malformed input (bad signature, truncated
    blocks, out-of-range LZW codes or palette indices, missing color
    table). The initial canvas and disposal-2 fills use the logical
    screen's background color (black when no global table carries one).
    """
    if payload[:6] not in (GIF87A, GIF89A):
        raise ValueError("gif_decode: not a GIF (bad signature)")
    if len(payload) < 13:
        raise ValueError("gif_decode: truncated logical screen descriptor")
    width, height = struct.unpack("<HH", payload[6:10])
    packed, bg_index, _aspect = payload[10], payload[11], payload[12]
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(payload, pos, 2 << (packed & 0x07))
    bg_rgb = gct[bg_index] if gct and bg_index < len(gct) else (0, 0, 0)

    canvas = bytearray(bytes(bg_rgb) * (width * height))
    frames: list[bytes] = []
    delays: list[int] = []
    # pending graphic-control state (applies to the NEXT image block)
    transparent: int | None = None
    disposal = 0
    delay_cs = 0

    while True:
        if pos >= len(payload):
            raise ValueError("gif_decode: missing trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("gif_decode: truncated extension")
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                data, pos = _read_subblocks(payload, pos)
                if len(data) != 4:
                    raise ValueError("gif_decode: bad graphic control block")
                flags = data[0]
                delay_cs = struct.unpack("<H", data[1:3])[0]
                disposal = (flags >> 2) & 0x07
                transparent = data[3] if flags & 0x01 else None
            else:  # application / comment / plain text: skip
                _, pos = _read_subblocks(payload, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"gif_decode: unknown block 0x{block:02x}")

        # image descriptor
        if pos + 9 > len(payload):
            raise ValueError("gif_decode: truncated image descriptor")
        left, top, fw, fh = struct.unpack("<HHHH", payload[pos : pos + 8])
        ipacked = payload[pos + 8]
        pos += 9
        if left + fw > width or top + fh > height:
            raise ValueError("gif_decode: frame rect outside logical screen")
        if ipacked & 0x80:
            palette, pos = _read_color_table(payload, pos, 2 << (ipacked & 0x07))
        elif gct is not None:
            palette = gct
        else:
            raise ValueError("gif_decode: frame has no color table")
        if pos >= len(payload):
            raise ValueError("gif_decode: missing LZW minimum code size")
        min_code = payload[pos]
        pos += 1
        data, pos = _read_subblocks(payload, pos)
        indices = _lzw_decode(data, min_code)
        if len(indices) < fw * fh:
            raise ValueError("gif_decode: LZW output shorter than frame")
        rows = [indices[r * fw : (r + 1) * fw] for r in range(fh)]
        if ipacked & 0x40:
            rows = _deinterlace(rows, fh)

        saved = bytes(canvas) if disposal == 3 else None
        for r, row in enumerate(rows):
            base = ((top + r) * width + left) * 3
            for c, idx in enumerate(row):
                if transparent is not None and idx == transparent:
                    continue
                if idx >= len(palette):
                    raise ValueError(
                        f"gif_decode: palette index {idx} out of range"
                    )
                canvas[base + 3 * c : base + 3 * c + 3] = bytes(palette[idx])
        frames.append(bytes(canvas))
        delays.append(delay_cs)

        # prepare the canvas for the next frame per THIS frame's disposal
        if disposal == 2:  # restore rect to background
            for r in range(fh):
                base = ((top + r) * width + left) * 3
                canvas[base : base + 3 * fw] = bytes(bg_rgb) * fw
        elif disposal == 3:  # restore to pre-frame canvas
            canvas = bytearray(saved)
        transparent = None
        disposal = 0
        delay_cs = 0

    if not frames:
        raise ValueError("gif_decode: no image data")
    return {
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "frames": frames,
        "delays_cs": delays,
    }


def gif_encode(
    width: int,
    height: int,
    frames: list,
    palette: list,
    delays_cs: list | None = None,
    transparent_index: int | None = None,
    disposals: list | None = None,
    interlace: bool = False,
) -> bytes:
    """Minimal GIF89a encoder — the deterministic animated-fixture
    generator for the decoder's tests. ``frames`` are full-canvas index
    buffers (``height * width`` bytes each) over one global ``palette``
    of (r, g, b) tuples; per-frame delay/disposal and one transparency
    index are written as GCE blocks; ``interlace=True`` writes rows in
    the 4-pass interlaced order (same pixels, permuted storage)."""
    n_entries = max(2, len(palette))
    size_field = max(0, (n_entries - 1).bit_length() - 1)
    table_n = 2 << size_field
    if len(palette) > table_n:
        size_field += 1
        table_n = 2 << size_field
    if table_n > 256:
        raise ValueError("gif_encode: palette exceeds 256 entries")
    min_code = max(2, (table_n - 1).bit_length())

    out = bytearray()
    out += GIF89A
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | size_field, 0, 0])  # GCT flag + bg index 0
    for i in range(table_n):
        out += bytes(palette[i]) if i < len(palette) else b"\x00\x00\x00"

    for k, frame in enumerate(frames):
        if len(frame) != width * height:
            raise ValueError("gif_encode: frame index buffer size mismatch")
        delay = (delays_cs or [0] * len(frames))[k]
        disp = (disposals or [0] * len(frames))[k]
        flags = (disp & 0x07) << 2
        tr = 0
        if transparent_index is not None:
            flags |= 0x01
            tr = transparent_index
        out += bytes([0x21, 0xF9, 4, flags])
        out += struct.pack("<H", delay)
        out += bytes([tr, 0])
        out += b"\x2C" + struct.pack("<HHHH", 0, 0, width, height)
        out += bytes([0x40 if interlace else 0x00])
        rows = [frame[r * width : (r + 1) * width] for r in range(height)]
        if interlace:
            stored = []
            for start, step in _INTERLACE_PASSES:
                stored.extend(rows[r] for r in range(start, height, step))
            rows = stored
        data = _lzw_encode(b"".join(bytes(r) for r in rows), min_code)
        out += bytes([min_code])
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


def gif_decoder(payload: bytes, modality: str) -> dict:
    """Real decode kernel for :func:`..multimodal.decode_media`'s slot:
    video payloads are actually decoded — dimensions and frame count
    come from the composited animation, not a hash of the bytes. Other
    modalities report byte-level metadata only; a video payload that is
    not a GIF raises (a real decoder does not guess)."""
    meta = {
        "width": None,
        "height": None,
        "n_channels": None,
        "n_frames": None,
        "sample_rate": None,
        "byte_len": len(payload),
        "sha256": hashlib.sha256(payload).hexdigest(),
    }
    if modality == "video":
        d = gif_decode(payload)
        meta.update(
            width=d["width"],
            height=d["height"],
            n_channels=3,
            n_frames=d["n_frames"],
        )
    return meta
