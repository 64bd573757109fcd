"""Vector math over ``array<float|double>`` columns — pure Catalyst
expressions (``zip_with`` + ``aggregate``), no UDFs, so similarity math
runs JVM-side inside codegen.

Used by operators.similarity for brute-force and LSH-bucketed kNN over the
``embeddings`` table (SURVEY.md §2.14).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def nested_double_literal(values) -> Column:
    """Nested float list -> ONE Catalyst array literal via a single SQL
    expression string. ``F.lit(nested_list)`` builds every scalar as its
    own JVM Literal through py4j — a few thousand round trips for a
    plane/component matrix, seconds of pure query-CONSTRUCTION time
    (measured in the multi-table LSH path). One parsed string is one
    round trip. repr() of a Python float round-trips exactly, so no
    precision is lost.

    Values must be finite and every (nested) list non-empty — repr(inf)
    is not valid SQL and a bare ``array()`` is untyped; both are
    rejected eagerly so misuse fails with a clear message instead of an
    opaque downstream parse error."""
    import math

    def fmt(x) -> str:
        if isinstance(x, (list, tuple)):
            if not x:
                raise ValueError(
                    "nested_double_literal: empty array (untyped in SQL)"
                )
            return "array(" + ",".join(fmt(v) for v in x) + ")"
        f = float(x)
        if not math.isfinite(f):
            raise ValueError(
                f"nested_double_literal: non-finite value {f!r} has no "
                "SQL double literal form"
            )
        return repr(f) + "D"

    return F.expr(fmt(values))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns (computed in double)."""
    prods = F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_to_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


def l2_normalize(a: Column) -> Column:
    """Unit-normalize; a zero vector stays zero (no NaN propagation)."""
    n = l2_norm(a)
    return F.when(
        n > 0, F.transform(a, lambda x: x.cast("double") / n)
    ).otherwise(_to_double(a))


def truncate_embedding(a: Column, dims: int, renormalize: bool = True) -> Column:
    """Matryoshka-style truncation (Kusupati et al. 2022): keep the
    first ``dims`` components and re-unit-normalize, so downstream
    cosine math stays calibrated. The cheap way to trade recall for
    bytes in the ANN ladder — truncate at ingest, re-rank survivors on
    the full vector. Pure ``slice``/``transform`` exprs, map-only.
    """
    t = F.slice(a, 1, dims)
    return l2_normalize(t) if renormalize else t
