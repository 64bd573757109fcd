"""Small-file compaction / clustered re-layout (operators.maintenance).

Contract under test:
1. content preservation — exact multiset of rows survives the rewrite;
2. file-count reduction to the byte-budget target;
3. range clustering — with ``sort_by``, every output file covers a
   DISJOINT key range (read back from the parquet footers), which is
   precisely the property that makes footer min/max stats prune whole
   files for later key filters.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from amonaly_detection_in_time_series_data_spark.operators.maintenance import (
    compact_files,
    data_file_stats,
)


def _fragmented_input(spark, sf_dir, path, n_files=64):
    from amonaly_detection_in_time_series_data_spark.sources.readers import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.repartition(n_files).write.mode("overwrite").parquet(path)
    return docs


class TestCompactFiles:
    def test_compacts_preserves_content_and_clusters(self, spark, sf_dir, tmp_path):
        src = str(tmp_path / "frag")
        dst = str(tmp_path / "compact")
        docs = _fragmented_input(spark, sf_dir, src, n_files=64)

        before = data_file_stats(spark, src)
        assert before["n_files"] == 64

        # fractional MB target: sf0.001 documents is ~a few hundred KB,
        # so this lands on a handful of output files (>1, <64)
        stats = compact_files(
            spark, src, dst, target_file_mb=0.02, sort_by=["doc_id"]
        )
        assert stats["in_files"] == 64
        assert stats["out_files"] == stats["target_files"] < 64

        # 1. content: exact multiset of rows survives
        got = spark.read.parquet(dst)
        assert got.count() == docs.count()
        key = F.md5(F.concat_ws("\x1f", F.col("doc_id"), F.col("text")))
        h = lambda d: d.select(
            F.sha2(F.concat_ws("", F.sort_array(F.collect_list(key))), 256)
        ).first()[0]
        assert h(got) == h(docs)

        # 3. clustering: footer min/max ranges of doc_id are disjoint
        # across output files -> a doc_id filter can skip whole files
        ranges = []
        for f in glob.glob(os.path.join(dst, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            lo = min(
                md.row_group(i).column(0).statistics.min
                for i in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(i).column(0).statistics.max
                for i in range(md.num_row_groups)
            )
            ranges.append((lo, hi))
        assert len(ranges) == stats["out_files"] > 1
        ranges.sort()
        for (_, prev_hi), (nxt_lo, _) in zip(ranges, ranges[1:]):
            assert prev_hi <= nxt_lo, "output files overlap in doc_id range"

    def test_round_robin_without_sort(self, spark, sf_dir, tmp_path):
        src = str(tmp_path / "frag2")
        dst = str(tmp_path / "compact2")
        _fragmented_input(spark, sf_dir, src, n_files=16)
        stats = compact_files(spark, src, dst, target_file_mb=1024)
        assert stats["out_files"] == 1
        assert (
            spark.read.parquet(dst).count()
            == spark.read.parquet(src).count()
        )

    def test_zorder_clusters_both_dimensions(self, spark, tmp_path):
        """Z-order vs linear sort on a 2-D uniform grid: the linear
        sort gives perfect x clustering but every file spans the FULL y
        range; the z-order key keeps per-file footer min/max spans
        small in BOTH dimensions — the property that lets either-column
        filters prune files."""
        import itertools

        rows = [
            (float(x), float(y))
            for x, y in itertools.product(range(128), range(128))
        ]
        src = str(tmp_path / "grid")
        spark.createDataFrame(rows, "x double, y double").repartition(
            8
        ).write.mode("overwrite").parquet(src)

        def spans(dst):
            out = {}
            for col_idx, col in ((0, "x"), (1, "y")):
                tot = 0.0
                files = glob.glob(os.path.join(dst, "*.parquet"))
                for f in files:
                    md = pq.ParquetFile(f).metadata
                    st = [
                        md.row_group(i).column(col_idx).statistics
                        for i in range(md.num_row_groups)
                    ]
                    tot += max(s.max for s in st) - min(s.min for s in st)
                out[col] = tot / len(files) / 127.0  # avg span / full range
            return out

        lin = str(tmp_path / "lin")
        compact_files(spark, src, lin, sort_by=["x"], n_files=16)
        zor = str(tmp_path / "zor")
        stats = compact_files(
            spark, src, zor, zorder_by=["x", "y"], n_files=16
        )
        assert stats["out_files"] == 16

        s_lin, s_zor = spans(lin), spans(zor)
        # linear: x tight, y spans ~everything
        assert s_lin["x"] < 0.2 and s_lin["y"] > 0.9
        # z-order: BOTH dimensions tight (16 files ~ 4x4 quadrants;
        # range boundaries straddle quadrant edges, hence the slack)
        assert s_zor["x"] < 0.5 and s_zor["y"] < 0.5
        # content preserved
        assert (
            spark.read.parquet(zor).count()
            == spark.read.parquet(src).count()
            == 128 * 128
        )

    def test_refuses_in_place(self, spark, tmp_path):
        with pytest.raises(ValueError, match="out_path"):
            compact_files(spark, str(tmp_path / "x"), str(tmp_path / "x/"))

    def test_refuses_empty_input(self, spark, tmp_path):
        empty = tmp_path / "empty"
        empty.mkdir()
        with pytest.raises(ValueError, match="no data files"):
            compact_files(spark, str(empty), str(tmp_path / "out"))


class TestSkippingScan:
    """file_stats_index + skipping_scan: plan-time file pruning from a
    persisted min/max index — correctness is a superset guarantee (the
    pruned scan filtered == the full scan filtered, on ANY layout), and
    the payoff only appears on clustered layouts."""

    def _grid(self, spark, tmp_path, name, **compact_kw):
        import itertools

        rows = [
            (float(x), float(y))
            for x, y in itertools.product(range(128), range(128))
        ]
        src = str(tmp_path / f"{name}_src")
        spark.createDataFrame(rows, "x double, y double").repartition(
            8
        ).write.mode("overwrite").parquet(src)
        dst = str(tmp_path / name)
        compact_files(spark, src, dst, n_files=16, **compact_kw)
        return dst

    def test_zorder_prunes_both_columns_and_matches_full_scan(
        self, spark, tmp_path
    ):
        from amonaly_detection_in_time_series_data_spark.operators.maintenance import (
            file_stats_index,
            skipping_scan,
        )

        dst = self._grid(spark, tmp_path, "zor", zorder_by=["x", "y"])
        idx = file_stats_index(spark, dst, ["x", "y"]).localCheckpoint()
        ranges = {"x": (10.0, 30.0), "y": (100.0, 120.0)}
        df, st = skipping_scan(spark, idx, ranges)
        assert st["files_total"] == 16
        # a 21x21 corner of a 128x128 grid in 16 z-ordered files: the
        # overwhelming majority of files cannot intersect
        assert st["files_kept"] <= 6
        full = (
            spark.read.parquet(dst)
            .filter(
                (F.col("x").between(10.0, 30.0))
                & (F.col("y").between(100.0, 120.0))
            )
            .collect()
        )
        assert sorted(map(tuple, df.collect())) == sorted(map(tuple, full))
        assert len(full) == 21 * 21

    def test_random_layout_keeps_everything_but_stays_correct(
        self, spark, tmp_path
    ):
        from amonaly_detection_in_time_series_data_spark.operators.maintenance import (
            file_stats_index,
            skipping_scan,
        )

        dst = self._grid(spark, tmp_path, "rnd")  # round-robin layout
        idx = file_stats_index(spark, dst, ["x"])
        df, st = skipping_scan(spark, idx, {"x": (10.0, 30.0)})
        # every round-robin file spans ~the full range: no pruning win,
        # but no correctness loss either
        assert st["files_kept"] == st["files_total"] == 16
        assert df.count() == 21 * 128

    def test_open_bounds_all_null_files_and_empty_result(
        self, spark, tmp_path
    ):
        from amonaly_detection_in_time_series_data_spark.operators.maintenance import (
            file_stats_index,
            skipping_scan,
        )

        path = str(tmp_path / "nulls")
        spark.createDataFrame(
            [(1.0, "a")], "v double, tag string"
        ).write.mode("overwrite").parquet(path)
        spark.createDataFrame(
            [(None, "b"), (None, "c")], "v double, tag string"
        ).coalesce(1).write.mode("append").parquet(path)
        idx = file_stats_index(spark, path, ["v"]).localCheckpoint()
        assert idx.count() == 2

        # all-null file is skipped (range predicates are null-rejecting)
        df, st = skipping_scan(spark, idx, {"v": (0.0, None)})
        assert st == {"files_total": 2, "files_kept": 1}
        assert [r["tag"] for r in df.collect()] == ["a"]

        # pruned to nothing: schema survives, zero rows
        df2, st2 = skipping_scan(spark, idx, {"v": (None, -5.0)})
        assert st2["files_kept"] == 0
        assert df2.columns == ["v", "tag"] and df2.count() == 0

        with pytest.raises(ValueError, match="both bounds open"):
            skipping_scan(spark, idx, {"v": (None, None)})

    def test_null_count_pruning(self, spark, tmp_path):
        """IS NULL / IS NOT NULL prune on the index's null counts: the
        null-free file cannot hold IS NULL rows, the all-null file
        cannot hold IS NOT NULL rows, and a mixed file survives both."""
        from amonaly_detection_in_time_series_data_spark.operators.maintenance import (
            file_stats_index,
            skipping_scan,
        )

        path = str(tmp_path / "mix")
        spark.createDataFrame(
            [(1.0, "full")], "v double, tag string"
        ).write.mode("overwrite").parquet(path)
        spark.createDataFrame(
            [(None, "allnull")], "v double, tag string"
        ).coalesce(1).write.mode("append").parquet(path)
        spark.createDataFrame(
            [(2.0, "mixed"), (None, "mixed")], "v double, tag string"
        ).coalesce(1).write.mode("append").parquet(path)
        idx = file_stats_index(spark, path, ["v"]).localCheckpoint()
        assert idx.count() == 3

        df, st = skipping_scan(spark, idx, is_null=["v"])
        assert st == {"files_total": 3, "files_kept": 2}
        assert sorted(r["tag"] for r in df.collect()) == ["allnull", "mixed"]

        df2, st2 = skipping_scan(spark, idx, not_null=["v"])
        assert st2 == {"files_total": 3, "files_kept": 2}
        assert sorted(r["tag"] for r in df2.collect()) == ["full", "mixed"]

        # composes with a range: v >= 2 AND NOT NULL -> only the mixed file
        df3, st3 = skipping_scan(
            spark, idx, {"v": (2.0, None)}, not_null=["v"]
        )
        assert st3["files_kept"] == 1
        assert [r["tag"] for r in df3.collect()] == ["mixed"]

        with pytest.raises(ValueError, match="at least one predicate"):
            skipping_scan(spark, idx)

    def test_property_skipping_is_always_a_superset(self, spark, tmp_path):
        """Hypothesis: for ANY data layout and ANY range predicate, the
        pruned scan filtered equals the full scan filtered — pruning
        may only ever skip files that cannot match."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st
        from amonaly_detection_in_time_series_data_spark.operators.maintenance import (
            file_stats_index,
            skipping_scan,
        )

        counter = [0]

        @settings(
            max_examples=8, deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(
            vals=st.lists(
                st.one_of(st.integers(min_value=-100, max_value=100),
                          st.none()),
                min_size=1, max_size=40,
            ),
            n_files=st.integers(min_value=1, max_value=6),
            lo=st.one_of(st.integers(min_value=-120, max_value=120), st.none()),
            hi=st.one_of(st.integers(min_value=-120, max_value=120), st.none()),
            clustered=st.booleans(),
        )
        def check(vals, n_files, lo, hi, clustered):
            if lo is None and hi is None:
                lo = 0
            counter[0] += 1
            path = str(tmp_path / f"prop_{counter[0]}")
            df = spark.createDataFrame([(v,) for v in vals], "v int")
            if clustered:
                df = df.repartitionByRange(n_files, "v")
            else:
                df = df.repartition(n_files)
            df.write.mode("overwrite").parquet(path)
            idx = file_stats_index(spark, path, ["v"])
            pruned, st_ = skipping_scan(spark, idx, {"v": (lo, hi)})
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (F.col("v") >= lo)
            if hi is not None:
                cond = cond & (F.col("v") <= hi)
            full = spark.read.parquet(path).filter(cond)
            assert sorted(
                r["v"] for r in pruned.collect()
            ) == sorted(r["v"] for r in full.collect())
            assert st_["files_kept"] <= st_["files_total"]

        check()


class TestIncrementalIndex:
    """file_stats_index_update: a persisted index maintained at
    O(touched files) per batch must equal the from-scratch rebuild
    after ANY sequence of appends and partition rewrites, and
    skipping_scan over it must stay exact."""

    @staticmethod
    def _norm(df):
        return sorted(tuple(r) for r in df.collect())

    def test_incremental_equals_full_rebuild_with_rewrites(
        self, spark, tmp_path
    ):
        from amonaly_detection_in_time_series_data_spark.operators.maintenance import (
            file_stats_index,
            file_stats_index_update,
            skipping_scan,
        )

        table = str(tmp_path / "t")
        index = str(tmp_path / "t_index")
        # three append batches, each its own partition
        for b in range(3):
            rows = [(b, float(b * 100 + i)) for i in range(50)]
            (
                spark.createDataFrame(rows, "p int, v double")
                .write.mode("overwrite")
                .partitionBy("p")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(table)
            )
            idx = file_stats_index_update(spark, table, ["v"], index)
        # partition rewrite (CoW merge shape): p=1 gets NEW files, the
        # old ones disappear — update must drop their index rows
        rows = [(1, float(1000 + i)) for i in range(20)]
        (
            spark.createDataFrame(rows, "p int, v double")
            .repartition(2)
            .write.mode("overwrite")
            .partitionBy("p")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(table)
        )
        idx = file_stats_index_update(spark, table, ["v"], index)
        full = file_stats_index(spark, table, ["v"])
        assert self._norm(idx) == self._norm(full)
        # and skipping over the incrementally-maintained index is exact
        pruned, st = skipping_scan(spark, idx, {"v": (1000.0, 1010.0)})
        want = (
            spark.read.parquet(table)
            .filter(F.col("v").between(1000.0, 1010.0))
        )
        assert sorted(r["v"] for r in pruned.collect()) == sorted(
            r["v"] for r in want.collect()
        )
        assert st["files_kept"] < st["files_total"]

    def test_ingest_sink_keeps_index_in_lockstep(self, spark, tmp_path):
        from amonaly_detection_in_time_series_data_spark.operators.ingest import (
            incremental_ingest_sink,
        )
        from amonaly_detection_in_time_series_data_spark.operators.maintenance import (
            file_stats_index,
        )

        store = str(tmp_path / "store")
        out = str(tmp_path / "out")
        index = str(tmp_path / "out_index")
        sink = incremental_ingest_sink(
            store, out, stats_index_path=index, stats_cols=["doc_id"],
            n_hashes=8, n_bands=4,
        )
        b0 = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog today"),
             (2, "an entirely different document about spark engines")],
            "doc_id long, text string",
        )
        b1 = spark.createDataFrame(
            [(3, "the quick brown fox jumps over the lazy dog today"),
             (4, "yet another novel text with its own fresh content")],
            "doc_id long, text string",
        )
        sink(b0, 0)
        sink(b1, 1)
        idx = spark.read.parquet(index)
        full = file_stats_index(spark, out, ["doc_id"])
        assert self._norm(idx) == self._norm(full)
