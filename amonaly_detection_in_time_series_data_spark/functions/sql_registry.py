"""SQL-surface registration: expose the engine's core per-row functions
as SQL scalar functions (Spark 4 ``CREATE FUNCTION ... RETURN <expr>``),
so a pure-``spark.sql`` user gets the same text/cleaning surface the
DataFrame API offers — with IDENTICAL semantics, because each SQL body
is the same Catalyst expression the Column helpers build (these are SQL
macros inlined by the analyzer, not Python UDFs; they stay inside
whole-stage codegen and cost nothing extra at 100 TB).

Names are prefixed ``eng_`` to avoid shadowing builtins.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (signature, return type, SQL body). Bodies mirror
# functions.text / functions.cleaning expression-for-expression; the
# parity is pinned in tests/test_operators.py::TestSqlRegistry.
_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    "eng_tokenize": (
        "(x STRING)",
        "ARRAY<STRING>",
        r"filter(split(lower(trim(x)), '\\s+'), t -> t <> '')",
    ),
    "eng_token_count": (
        "(x STRING)",
        "INT",
        r"size(regexp_extract_all(x, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0))",
    ),
    "eng_punct_ratio": (
        "(x STRING)",
        "DOUBLE",
        r"length(regexp_replace(x, '[A-Za-z0-9\\s]', '')) / nullif(length(x), 0)",
    ),
    "eng_redact_pii": (
        "(x STRING)",
        "STRING",
        # chain mirrors functions.text.PII_PATTERNS order
        r"""regexp_replace(regexp_replace(regexp_replace(regexp_replace(x,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>'),
            'https?://[^\\s]+', '<URL>'),
            '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IPV4>'),
            '\\+?\\d[\\d\\- ]{7,14}\\d', '<PHONE>')""",
    ),
    "eng_clean_numeric": (
        "(x STRING)",
        "DOUBLE",
        # corrected German-locale parse (functions.cleaning
        # clean_numeric_de): trim, drop thousands dots, comma -> decimal
        r"""try_cast(replace(replace(trim(x), '.', ''), ',', '.') AS DOUBLE)""",
    ),
    "eng_minmax": (
        "(x DOUBLE, lo DOUBLE, hi DOUBLE)",
        "DOUBLE",
        "CASE WHEN hi = lo THEN 0.0D ELSE (x - lo) / (hi - lo) END",
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every engine SQL function (idempotent,
    ``CREATE OR REPLACE TEMPORARY FUNCTION``). Returns the names."""
    for name, (sig, ret, body) in _FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
            f"RETURNS {ret} RETURN {body}"
        )
    return list(_FUNCTIONS)
