"""PySpark-native time-series anomaly-detection analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference repo
``debanjanofficial/Amonaly-detection-in-Time-Series-Data`` (a pandas+torch
batch pipeline; see SURVEY.md). Every operator is expressed as a
logical-plan-building transformation on ``pyspark.sql.DataFrame`` so that
Catalyst performs projection pruning, predicate pushdown, and whole-stage
codegen; shuffles are standardized on the series key so all window
operators share one exchange.

Layout:
    session     SparkSession factory (AQE, UTC timezone, arrow)
    sources     readers/writers (CSV with reference semantics, parquet)
    functions   scalar/column expressions (cleaning, time features, text, vectors)
    operators   DataFrame -> DataFrame transforms (dedup, missing, features,
                scaling, sequences, anomaly, relational, similarity)
    plans       composed end-to-end pipelines
    streaming   Structured Streaming variants
"""

__version__ = "0.1.0"
