"""Pure-stdlib WAV codec: roundtrip, format guards, and the real-decode
path through the multimodal Arrow plumbing (the audio sibling of
tests/test_png.py)."""

from __future__ import annotations

import math
import struct

import pytest

from amonaly_detection_in_time_series_data_spark.sources.wav import (
    wav_decode,
    wav_decoder,
    wav_encode,
)


def _sine(n=480, rate=16000, freq=440.0, amp=12000):
    return [int(amp * math.sin(2 * math.pi * freq * i / rate)) for i in range(n)]


class TestWavCodec:
    def test_roundtrip_16bit_mono(self):
        s = _sine()
        d = wav_decode(wav_encode(s, n_channels=1, sample_rate=16000))
        assert d["n_channels"] == 1
        assert d["sample_rate"] == 16000
        assert d["bit_depth"] == 16
        assert d["n_frames"] == len(s)
        assert d["samples"] == s  # bit-exact roundtrip

    def test_roundtrip_16bit_stereo_and_8bit(self):
        left = _sine(100)
        right = [-x for x in left]
        inter = [v for pair in zip(left, right) for v in pair]
        d = wav_decode(wav_encode(inter, n_channels=2, sample_rate=44100))
        assert d["n_channels"] == 2
        assert d["n_frames"] == 100
        assert d["samples"] == inter
        u8 = [((x >> 8) + 128) & 0xFF for x in left]
        d8 = wav_decode(wav_encode(u8, bit_depth=8, sample_rate=8000))
        assert d8["bit_depth"] == 8
        assert d8["samples"] == u8

    def test_odd_data_length_padding(self):
        # 8-bit mono with an odd sample count exercises the RIFF
        # word-alignment pad byte
        u8 = [1, 2, 3]
        d = wav_decode(wav_encode(u8, bit_depth=8))
        assert d["samples"] == u8

    def test_guards(self):
        s = _sine(50)
        good = wav_encode(s)
        with pytest.raises(ValueError, match="RIFF"):
            wav_decode(b"nope" + good[4:])
        with pytest.raises(ValueError, match="truncated"):
            wav_decode(good[:-10])
        # non-PCM format tag
        bad = bytearray(good)
        fmt_at = good.index(b"fmt ") + 8
        bad[fmt_at : fmt_at + 2] = struct.pack("<H", 3)  # IEEE float
        with pytest.raises(ValueError, match="PCM"):
            wav_decode(bytes(bad))
        with pytest.raises(ValueError, match="channel"):
            wav_encode(s, n_channels=0)
        with pytest.raises(ValueError, match="multiple"):
            wav_encode([1, 2, 3], n_channels=2)

    def test_decoder_slot_metadata(self):
        s = _sine(320, rate=22050)
        payload = wav_encode(s, sample_rate=22050)
        meta = wav_decoder(payload, "audio")
        assert meta["n_channels"] == 1
        assert meta["sample_rate"] == 22050
        assert meta["n_frames"] == 320
        assert meta["byte_len"] == len(payload)
        # non-audio modality: byte metadata only, no parse attempted
        other = wav_decoder(b"whatever", "image")
        assert other["n_frames"] is None and other["byte_len"] == 8


class TestRealDecoderDispatch:
    def test_strict_decode_all_modalities(self, spark):
        """strict=True + real_decoder: PNG images, PCM WAV audio, AND
        animated-GIF video (r9) are actually decoded through the Arrow
        mapInPandas plumbing — every stdlib-expressible format real;
        other modalities fall through to byte metadata."""
        from amonaly_detection_in_time_series_data_spark.sources.gif import gif_encode
        from amonaly_detection_in_time_series_data_spark.sources.multimodal import (
            decode_media,
            fake_decoder,
            real_decoder,
            set_decoder,
        )
        from amonaly_detection_in_time_series_data_spark.sources.png import png_encode

        px = bytes((x * 7 + y * 3) % 256 for y in range(9) for x in range(12 * 3))
        gif = gif_encode(
            5, 4, [bytes(20), bytes([1] * 20), bytes([2] * 20)],
            [(0, 0, 0), (255, 0, 0), (0, 255, 0)],
        )
        rows = [
            (1, png_encode(12, 9, px, n_channels=3), "image"),
            (2, wav_encode(_sine(240), sample_rate=16000), "audio"),
            (3, gif, "video"),
            (4, b"opaque tabular bytes", "tabular"),
        ]
        df = spark.createDataFrame(
            rows, "doc_id bigint, payload binary, modality string"
        )
        set_decoder(real_decoder)
        try:
            got = {
                r["doc_id"]: (
                    r["width"], r["height"], r["n_channels"],
                    r["sample_rate"], r["n_frames"],
                )
                for r in decode_media(df, strict=True).collect()
            }
        finally:
            set_decoder(fake_decoder)
        assert got[1] == (12, 9, 3, None, None)
        assert got[2] == (None, None, 1, 16000, 240)
        assert got[3] == (5, 4, 3, None, 3)
        assert got[4] == (None, None, None, None, None)

    def test_wrong_format_raises_in_executor(self, spark):
        from amonaly_detection_in_time_series_data_spark.sources.multimodal import (
            decode_media,
            fake_decoder,
            real_decoder,
            set_decoder,
        )

        df = spark.createDataFrame(
            [(1, b"not a wav", "audio")],
            "doc_id bigint, payload binary, modality string",
        )
        set_decoder(real_decoder)
        try:
            with pytest.raises(Exception, match="RIFF"):
                decode_media(df, strict=True).collect()
        finally:
            set_decoder(fake_decoder)
