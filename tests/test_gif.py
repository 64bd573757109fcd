"""Pure-stdlib GIF codec (sources.gif) + its multimodal integration.

Contract under test:
1. the LZW pair roundtrips exactly, including code-width growth past
   512/1024 entries and the 4096-entry table overflow (CLEAR reset);
2. encode -> decode roundtrips full animations bit-exactly (palette
   applied, multi-frame);
3. compositing honors disposal 0/2/3, the transparency index, and
   4-pass interlacing (fixtures permute rows with an independent
   forward implementation);
4. corruption and malformed inputs raise, not guess;
5. decode_media(strict) with real_decoder and sample_frames(strict)
   with real_frame_sampler perform REAL decodes inside the Arrow
   mapInPandas plumbing — frame count/fingerprints come from the
   composited animation, not byte-length arithmetic.
"""

from __future__ import annotations

import hashlib
import random

import pytest

from amonaly_detection_in_time_series_data_spark.sources.gif import (
    _lzw_decode,
    _lzw_encode,
    gif_decode,
    gif_decoder,
    gif_encode,
)

PALETTE4 = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]


def _rgb(frame_indices, palette):
    return b"".join(bytes(palette[i]) for i in frame_indices)


class TestLzw:
    @pytest.mark.parametrize("min_code", [2, 3, 8])
    def test_roundtrip_random(self, min_code):
        rng = random.Random(min_code)
        space = 1 << min_code
        data = bytes(rng.randrange(space) for _ in range(5000))
        assert _lzw_decode(_lzw_encode(data, min_code), min_code) == data

    def test_roundtrip_code_width_growth_and_overflow(self):
        # low-entropy long input drives the table through every width
        # up to 12 bits and past 4096 entries (CLEAR + rebuild)
        rng = random.Random(1)
        data = bytes(
            rng.choice((0, 0, 0, 1, 1, 2)) for _ in range(200_000)
        )
        enc = _lzw_encode(data, 2)
        assert _lzw_decode(enc, 2) == data

    def test_kwkwk_case(self):
        # the code == len(table) branch: aaa...a forces it immediately
        data = b"\x00" * 50
        assert _lzw_decode(_lzw_encode(data, 2), 2) == data

    def test_truncated_stream_raises(self):
        enc = _lzw_encode(b"\x00\x01\x02\x03" * 10, 2)
        with pytest.raises(ValueError, match="EOI"):
            _lzw_decode(enc[: len(enc) // 2], 2)

    def test_out_of_range_index_raises(self):
        with pytest.raises(ValueError, match="exceeds code space"):
            _lzw_encode(b"\x07", 2)


class TestGifCodec:
    def test_single_frame_roundtrip(self):
        rng = random.Random(3)
        w, h = 13, 9
        frame = bytes(rng.randrange(4) for _ in range(w * h))
        payload = gif_encode(w, h, [frame], PALETTE4)
        d = gif_decode(payload)
        assert (d["width"], d["height"], d["n_frames"]) == (w, h, 1)
        assert d["frames"][0] == _rgb(frame, PALETTE4)

    def test_animation_roundtrip_with_delays(self):
        rng = random.Random(4)
        w, h = 8, 8
        frames = [
            bytes(rng.randrange(4) for _ in range(w * h)) for _ in range(5)
        ]
        payload = gif_encode(w, h, frames, PALETTE4, delays_cs=[10, 20, 30, 40, 50])
        d = gif_decode(payload)
        assert d["n_frames"] == 5
        assert d["delays_cs"] == [10, 20, 30, 40, 50]
        for k in range(5):
            assert d["frames"][k] == _rgb(frames[k], PALETTE4)

    def test_transparency_composites_over_previous(self):
        # frame 2 is all-transparent: the composited frame must equal
        # frame 1 (disposal 0 keeps the canvas)
        w, h = 4, 4
        f1 = bytes([1] * (w * h))
        f2 = bytes([3] * (w * h))  # index 3 declared transparent
        payload = gif_encode(
            w, h, [f1, f2], PALETTE4, transparent_index=3
        )
        d = gif_decode(payload)
        assert d["frames"][1] == d["frames"][0] == _rgb(f1, PALETTE4)

    def test_disposal_2_restores_background(self):
        # disposal 2 after frame 1 clears to the background (index 0);
        # an all-transparent frame 2 then shows pure background
        w, h = 4, 4
        f1 = bytes([2] * (w * h))
        f2 = bytes([3] * (w * h))
        payload = gif_encode(
            w, h, [f1, f2], PALETTE4,
            transparent_index=3, disposals=[2, 0],
        )
        d = gif_decode(payload)
        assert d["frames"][0] == _rgb(bytes([2] * (w * h)), PALETTE4)
        assert d["frames"][1] == _rgb(bytes([0] * (w * h)), PALETTE4)

    def test_disposal_3_restores_previous(self):
        # frame 2 overwrites with disposal 3; frame 3 (all transparent)
        # must show frame 1's canvas again, not frame 2's
        w, h = 4, 4
        f1 = bytes([1] * (w * h))
        f2 = bytes([2] * (w * h))
        f3 = bytes([3] * (w * h))
        payload = gif_encode(
            w, h, [f1, f2, f3], PALETTE4,
            transparent_index=3, disposals=[0, 3, 0],
        )
        d = gif_decode(payload)
        assert d["frames"][1] == _rgb(f2, PALETTE4)
        assert d["frames"][2] == d["frames"][0] == _rgb(f1, PALETTE4)

    def test_interlaced_roundtrip(self):
        # encoder stores the 4-pass row permutation; the decoder must
        # reassemble the ORIGINAL row order — distinct row values make
        # any permutation error visible
        w, h = 3, 11
        frame = bytes((r % 4) for r in range(h) for _ in range(w))
        plain = gif_decode(gif_encode(w, h, [frame], PALETTE4))
        inter = gif_decode(
            gif_encode(w, h, [frame], PALETTE4, interlace=True)
        )
        assert inter["frames"][0] == plain["frames"][0] == _rgb(frame, PALETTE4)

    def test_malformed_raise(self):
        w, h = 4, 4
        good = gif_encode(w, h, [bytes(w * h)], PALETTE4)
        with pytest.raises(ValueError, match="signature"):
            gif_decode(b"NOTAGIF" + good)
        with pytest.raises(ValueError, match="trailer|truncated"):
            gif_decode(good[:-2])
        # palette index out of range: 2-entry palette, index 3 used
        bad = gif_encode(w, h, [bytes([3] * (w * h))], [(0, 0, 0), (1, 1, 1)])
        with pytest.raises(ValueError, match="palette index|exceeds"):
            gif_decode(bad)

    def test_gif_decoder_kernel(self):
        w, h = 6, 5
        payload = gif_encode(w, h, [bytes(w * h), bytes([1] * (w * h))], PALETTE4)
        meta = gif_decoder(payload, "video")
        assert (meta["width"], meta["height"], meta["n_frames"]) == (w, h, 2)
        assert meta["n_channels"] == 3
        assert meta["byte_len"] == len(payload)
        # non-video modalities report bytes only
        meta2 = gif_decoder(payload, "tabular")
        assert meta2["width"] is None and meta2["byte_len"] == len(payload)
        with pytest.raises(ValueError):
            gif_decoder(b"not a gif", "video")


class TestSparkIntegration:
    def _payloads_df(self, spark):
        rng = random.Random(9)
        rows = []
        for i in range(6):
            w, h = 4 + i, 3 + i
            frames = [
                bytes(rng.randrange(4) for _ in range(w * h))
                for _ in range(2 + i)
            ]
            rows.append((i, gif_encode(w, h, frames, PALETTE4), "video"))
        return spark.createDataFrame(
            rows, "doc_id long, payload binary, modality string"
        ), rows

    def test_decode_media_strict_real_video_decode(self, spark):
        from amonaly_detection_in_time_series_data_spark.sources.multimodal import (
            decode_media,
            fake_decoder,
            real_decoder,
            set_decoder,
        )

        df, rows = self._payloads_df(spark)
        set_decoder(real_decoder)
        try:
            out = {
                r["doc_id"]: r
                for r in decode_media(df, strict=True).collect()
            }
        finally:
            set_decoder(fake_decoder)
        for i, payload, _ in rows:
            d = gif_decode(payload)
            r = out[i]
            assert (r["width"], r["height"], r["n_frames"]) == (
                d["width"], d["height"], d["n_frames"],
            )

    def test_sample_frames_strict_real_gif_frames(self, spark):
        from amonaly_detection_in_time_series_data_spark.sources.multimodal import (
            fake_frame_sampler,
            real_frame_sampler,
            sample_frames,
            set_frame_sampler,
        )

        df, rows = self._payloads_df(spark)
        # strict on the stub refuses
        with pytest.raises(NotImplementedError, match="frame sampler"):
            sample_frames(df, stride=2, strict=True)
        set_frame_sampler(real_frame_sampler)
        try:
            got = sorted(
                tuple(r)
                for r in sample_frames(df, stride=2, strict=True).collect()
            )
        finally:
            set_frame_sampler(fake_frame_sampler)
        expected = []
        for i, payload, _ in rows:
            d = gif_decode(payload)
            for k in range(0, d["n_frames"], 2):
                expected.append(
                    (i, k, hashlib.sha256(d["frames"][k]).hexdigest())
                )
        assert got == sorted(expected)
        # real fingerprints: sha of composited RGB, not of payload bytes
        stub_like = {
            hashlib.sha256(p + b":" + str(k).encode()).hexdigest()
            for _, p, _ in rows
            for k in range(0, 40, 2)
        }
        assert not ({sha for _, _, sha in got} & stub_like)
