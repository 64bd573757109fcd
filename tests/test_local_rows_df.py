"""local_rows_df (r14): bounded driver-local tables as pure-JVM literal
plans — value-identical to createDataFrame, but with NO Python-RDD scan
(``Scan ExistingRDD`` / applySchemaToPythonRDD) in the executed plan, so
repeat actions over a broadcast of the table never re-run
defaultParallelism Python-worker tasks (measured ~1 s/action at 32 slots
before the change)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from amonaly_detection_in_time_series_data_spark.sources.readers import (
    local_rows_df,
)

NESTED = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("n", T.LongType()),
        T.StructField(
            "cand",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("recv", T.TimestampType()),
                        T.StructField("s", T.LongType()),
                    ]
                )
            ),
        ),
    ]
)


def _nested_rows():
    d = datetime.datetime(2024, 1, 2, 3, 4, 5)
    return [
        (d, 0, []),
        (d + datetime.timedelta(hours=1), 5, [(d, 7)]),
        (None, None, [(d, 1), (d + datetime.timedelta(days=1), 2)]),
    ]


def test_values_match_createdataframe_nested(spark):
    rows = _nested_rows()
    lit = local_rows_df(spark, rows, NESTED)
    ref = spark.createDataFrame(rows, NESTED)
    assert [f.name for f in lit.schema.fields] == [f.name for f in NESTED.fields]
    assert [f.dataType for f in lit.schema.fields] == [
        f.dataType for f in NESTED.fields
    ]
    assert sorted(map(tuple, lit.collect()), key=str) == sorted(
        map(tuple, ref.collect()), key=str
    )


def test_flat_atomic_array_fast_path(spark):
    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("v", T.ArrayType(T.DoubleType())),
        ]
    )
    rows = [(0, [1.0, 2.5]), (1, []), (2, [0.0]), (3, None)]
    lit = local_rows_df(spark, rows, schema)
    ref = spark.createDataFrame(rows, schema)
    assert sorted(map(tuple, lit.collect()), key=str) == sorted(
        map(tuple, ref.collect()), key=str
    )


def test_no_python_rdd_scan_in_plan(spark):
    df = local_rows_df(spark, _nested_rows(), NESTED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan
    # the createDataFrame control DOES carry the Python-RDD scan
    ref = spark.createDataFrame(_nested_rows(), NESTED)
    ref_plan = ref._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in ref_plan


def test_fallback_past_literal_bound(spark):
    schema = T.StructType([T.StructField("a", T.LongType())])
    rows = [(i,) for i in range(10)]
    df = local_rows_df(spark, rows, schema, max_literal_rows=5)
    assert sorted(r.a for r in df.collect()) == list(range(10))
    # empty input -> empty LocalRelation, still typed
    empty = local_rows_df(spark, [], schema)
    assert empty.count() == 0 and empty.schema == schema


def test_arity_mismatch_raises(spark):
    import pytest

    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    with pytest.raises(ValueError, match="arity"):
        local_rows_df(spark, [(1, "x", "extra")], schema)
    with pytest.raises(ValueError, match="arity"):
        local_rows_df(spark, [(1,)], schema)
    # dict rows map by field NAME (createDataFrame semantics), and a
    # missing field fails loudly instead of shipping keys as values
    df = local_rows_df(spark, [{"b": "x", "a": 1}], schema)
    assert [tuple(r) for r in df.collect()] == [(1, "x")]
    with pytest.raises(ValueError, match="missing"):
        local_rows_df(spark, [{"a": 1}], schema)


def test_broadcast_join_values_unchanged(spark):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("tag", T.StringType()),
        ]
    )
    rows = [(0, "a"), (1, "b"), (2, None)]
    big = spark.range(100).select((F.col("id") % 4).alias("k"), "id")
    lit = big.join(F.broadcast(local_rows_df(spark, rows, schema)), "k", "left")
    ref = big.join(
        F.broadcast(spark.createDataFrame(rows, schema)), "k", "left"
    )
    assert sorted(map(tuple, lit.collect())) == sorted(map(tuple, ref.collect()))
