"""Type-coercion operators (SURVEY.md §2.3, C1-C4).

All pure Column expressions — they stay inside whole-stage codegen; no
Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# C1 — the reference's explicit timestamp format '%b %d, %Y %I:%M %p'
# (reference: src/preprocessing.py:18), e.g. 'Apr 01, 2016 12:00 AM'.
REF_TIMESTAMP_FORMAT = "MMM dd, yyyy hh:mm a"


def parse_timestamp_ref(col: Column | str, fmt: str = REF_TIMESTAMP_FORMAT) -> Column:
    """C1: parse with explicit format, falling back to permissive inference
    with invalid -> NULL (pandas NaT).

    Reference semantics (src/preprocessing.py:10-49): primary strict parse
    with ``format=...``; on failure, ``pd.to_datetime(errors='coerce')``.
    ``try_to_timestamp`` is the Spark-native errors='coerce'.
    """
    s = F.col(col).cast("string") if isinstance(col, str) else col.cast("string")
    return F.coalesce(F.try_to_timestamp(s, F.lit(fmt)), F.try_to_timestamp(s))


def clean_numeric_ref(col: Column | str) -> Column:
    """C2 (bug-compatible): the reference's locale numeric clean, verbatim
    semantics including its German-format mangling.

    Reference (src/preprocessing.py:99-122): on string input
      1. ``,`` -> ``.``                 (:105)
      2. strip all chars outside [0-9.] (:109) — kills '-' signs
      3. single-pass collapse ``(\\.\\d*)\\.`` -> ``$1`` (:111)
      4. to_numeric(errors='coerce')    (:114)

    Verified quirks this reproduces exactly (SURVEY.md §2.3):
      '1.234,5' -> 1.2345 (NOT 1234.5); '-' -> NULL; '7.8.9' -> 7.89;
      '-5,1' -> 5.1 (sign stripped).
    """
    s = F.col(col).cast("string") if isinstance(col, str) else col.cast("string")
    s = F.regexp_replace(s, ",", ".")
    s = F.regexp_replace(s, "[^0-9.]", "")
    s = F.regexp_replace(s, r"(\.\d*)\.", r"$1")
    return s.try_cast("double")


def clean_numeric_de(col: Column | str) -> Column:
    """C2 (corrected): proper German-locale numeric parse — the engine's
    default. Thousands '.' dropped, decimal ',' -> '.', sign preserved,
    non-numeric markers ('-', '') -> NULL.

    '1.234,5' -> 1234.5; '-5,1' -> -5.1; '-' -> NULL.
    """
    s = F.col(col).cast("string") if isinstance(col, str) else col.cast("string")
    s = F.trim(s)
    s = F.regexp_replace(s, r"\.", "")
    s = F.regexp_replace(s, ",", ".")
    return s.try_cast("double")
