"""Z-order clustering (operators.zorder): Morton-key correctness and
the layout property it exists for — tight per-file min/max on EVERY
z-ordered dimension, so file-level stats prune scans for predicates on
ANY of them (not just the lead sort column).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from amonaly_detection_in_time_series_data_spark.operators.zorder import (
    grid_bucket,
    zorder_cluster,
    zorder_key,
)


def _morton_py(vals, bits):
    key = 0
    k = len(vals)
    for i, v in enumerate(vals):
        v = max(0, min((1 << bits) - 1, v))
        for b in range(bits):
            key |= ((v >> b) & 1) << (b * k + i)
    return key


class TestMortonKey:
    def test_matches_python_reference(self, spark):
        rng = random.Random(4)
        rows = [
            (rng.randrange(-5, 300), rng.randrange(-5, 300)) for _ in range(200)
        ]
        df = spark.createDataFrame(rows, "x long, y long")
        got = df.select(
            "x", "y", zorder_key(["x", "y"], bits=8).alias("z")
        ).collect()
        for r in got:
            assert r["z"] == _morton_py([r["x"], r["y"]], 8), (r["x"], r["y"])

    def test_three_dims_and_clamp(self, spark):
        df = spark.createDataFrame(
            [(0, 0, 0), (7, 7, 7), (999, -3, 4)], "a long, b long, c long"
        )
        got = [
            r["z"]
            for r in df.select(zorder_key(["a", "b", "c"], bits=3).alias("z"))
            .collect()
        ]
        assert got[0] == 0
        assert got[1] == (1 << 9) - 1  # all 9 interleaved bits set
        assert got[2] == _morton_py([7, 0, 4], 3)  # clamped to [0, 7]

    def test_locality_unit_step(self, spark):
        # a unit step in one dimension changes the key by a bounded
        # amount relative to a unit step in raw concatenated encoding:
        # the z-curve's defining property is bit-interleaving, pinned
        # here structurally — x's bits occupy even positions
        df = spark.createDataFrame([(x, 0) for x in range(16)], "x long, y long")
        got = [
            r["z"]
            for r in df.select(zorder_key(["x", "y"], 4).alias("z"))
            .orderBy("x")
            .collect()
        ]
        for x, z in enumerate(got):
            assert z == _morton_py([x, 0], 4)
            assert z & 0b1010101010 == 0 or True  # y bits all zero:
            assert z == sum(((x >> b) & 1) << (2 * b) for b in range(4))

    def test_validation(self, spark):
        with pytest.raises(ValueError, match="63"):
            zorder_key(["a", "b"], bits=32)
        with pytest.raises(ValueError, match="at least one"):
            zorder_key([], bits=8)
        with pytest.raises(ValueError, match="hi > lo"):
            grid_bucket("v", 5.0, 5.0)

    def test_grid_bucket_mapping(self, spark):
        df = spark.createDataFrame(
            [(0.0,), (31.9,), (64.0,), (100.0,)], "v double"
        )
        got = [
            r["b"]
            for r in df.select(grid_bucket("v", 0.0, 64.0, 8).alias("b")).collect()
        ]
        assert got[0] == 0
        assert got[1] == int(31.9 / 64.0 * 256)
        assert got[2] == 256  # clamped later by zorder_key
        assert got[3] > 256


class TestZorderLayout:
    def _file_spans(self, spark, path, col):
        df = spark.read.parquet(path)
        return {
            r["f"]: (r["lo"], r["hi"])
            for r in df.groupBy(F.input_file_name().alias("f"))
            .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
            .collect()
        }

    def test_second_dimension_prunes(self, spark, tmp_path):
        # Uniform 2-D data, 16 files. Layout A: sorted by x only.
        # Layout B: z-ordered on (x, y). A box predicate on y overlaps
        # EVERY file of layout A (y spans the full range in each file)
        # but only a fraction of layout B's files.
        rng = random.Random(7)
        rows = [
            (rng.randrange(0, 256), rng.randrange(0, 256)) for _ in range(40_000)
        ]
        df = spark.createDataFrame(rows, "x long, y long")

        a_path = str(tmp_path / "by_x")
        (
            df.repartitionByRange(16, "x")
            .sortWithinPartitions("x")
            .write.mode("overwrite")
            .parquet(a_path)
        )
        b_path = str(tmp_path / "zorder")
        zorder_cluster(df, ["x", "y"], n_files=16, bits=8).write.mode(
            "overwrite"
        ).parquet(b_path)

        lo, hi = 100, 115  # a ~6% slice of y
        a_spans = self._file_spans(spark, a_path, "y")
        b_spans = self._file_spans(spark, b_path, "y")
        assert len(a_spans) >= 14 and len(b_spans) >= 14
        a_hit = sum(1 for s_lo, s_hi in a_spans.values() if s_lo <= hi and s_hi >= lo)
        b_hit = sum(1 for s_lo, s_hi in b_spans.values() if s_lo <= hi and s_hi >= lo)
        # x-sorted layout: y spans ~[0,255] in every file -> all hit
        assert a_hit == len(a_spans)
        # z-order: only files whose z-range crosses the y-slice hit
        assert b_hit <= len(b_spans) // 2, (b_hit, len(b_spans))

        # ...and the z-layout still prunes on x too (both dims tight)
        a_x = self._file_spans(spark, a_path, "x")
        b_x = self._file_spans(spark, b_path, "x")
        bx_hit = sum(1 for s_lo, s_hi in b_x.values() if s_lo <= 115 and s_hi >= 100)
        # headroom: repartitionByRange samples with an rdd.id-derived
        # seed, so file boundaries shift by ~one file depending on how
        # many RDDs the session created before this test — 9/16 was
        # observed in a full-suite run where isolation gives 8/16
        assert bx_hit <= (len(b_x) * 5) // 8, (bx_hit, len(b_x))

    def test_cluster_preserves_rows(self, spark):
        rows = [(i % 50, (i * 7) % 50) for i in range(5_000)]
        df = spark.createDataFrame(rows, "x long, y long")
        out = zorder_cluster(df, ["x", "y"], n_files=8, bits=6)
        assert out.columns == ["x", "y"]
        assert sorted(map(tuple, out.collect())) == sorted(rows)
