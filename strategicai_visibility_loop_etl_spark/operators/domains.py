"""Domain blocklist / allowlist filtering for crawl corpora.

The first gate of every real crawl pipeline (the reference's own
domain is SEO crawl data — etl_merge.py:474-514 normalizes hosts for
exactly this kind of slicing): drop or keep documents by the host of
their URL, where a list entry matches the exact host and, by default,
every subdomain of it (standard blocklist semantics: ``example.com``
matches ``a.b.example.com``).

Scale shape: the list is a model-sized broadcast dim. Each document's
host expands map-side into its dot-suffix chain (≤ 8 entries, a pure
array expression), explodes, and broadcast-joins the list — no
corpus shuffle to FIND matches. The matched hosts then anti-join (or
semi-join, allowlist mode) back against the corpus on the host key;
AQE broadcasts that side when the matched set is small (the typical
case — a blocklist hits a fraction of the corpus), and degrades to a
plain shuffle join only when most of the corpus matches.

Null/path-only URLs have no host: blocklist mode KEEPS them (nothing
to match), allowlist mode DROPS them (strict).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import host_suffixes, url_host

_HOST = "__df_host"


def _list_df(spark, domains: Iterable[str] | DataFrame, col: str) -> DataFrame:
    if isinstance(domains, DataFrame):
        return domains.select(F.lower(F.trim(F.col(col))).alias("__dom"))
    rows = sorted({d.strip().lower().lstrip(".") for d in domains if d and d.strip()})
    return spark.createDataFrame([(d,) for d in rows], "__dom string")


def _matched_hosts(
    hosted: DataFrame, dim: DataFrame, include_subdomains: bool
) -> DataFrame:
    """Hosts of ``hosted`` that hit the list — may contain duplicates
    (one per matching row); anti/semi join semantics don't care."""
    if include_subdomains:
        keyed = hosted.select(
            F.col(_HOST), F.explode(host_suffixes(F.col(_HOST))).alias("__dom")
        )
    else:
        keyed = hosted.select(F.col(_HOST), F.col(_HOST).alias("__dom"))
    return keyed.join(F.broadcast(dim), "__dom").select(_HOST)


def domain_filter(
    df: DataFrame,
    blocklist: Iterable[str] | DataFrame | None = None,
    allowlist: Iterable[str] | DataFrame | None = None,
    url_col: str = "url",
    domain_col: str | None = None,
    include_subdomains: bool = True,
    list_col: str = "domain",
) -> DataFrame:
    """Filter ``df`` by domain block/allow lists.

    Exactly one of ``blocklist`` / ``allowlist`` modes may be active
    at a time per call semantics below; passing both applies the
    allowlist FIRST, then the blocklist (carve exceptions out of an
    allowed set). Lists are iterables of domain strings or a
    DataFrame with ``list_col``.

    ``domain_col`` names a column that already holds a bare host
    (e.g. the documents table's ``source``); otherwise the host is
    extracted from ``url_col`` with :func:`url_host`.
    """
    if blocklist is None and allowlist is None:
        raise ValueError("domain_filter needs a blocklist or an allowlist")
    spark = df.sparkSession
    host = (
        F.lower(F.trim(F.col(domain_col).cast("string")))
        if domain_col
        else url_host(F.col(url_col))
    )
    out = df.withColumn(_HOST, host)
    if allowlist is not None:
        dim = _list_df(spark, allowlist, list_col)
        allowed = _matched_hosts(out, dim, include_subdomains)
        out = out.join(allowed, _HOST, "left_semi")
    if blocklist is not None:
        dim = _list_df(spark, blocklist, list_col)
        blocked = _matched_hosts(out, dim, include_subdomains)
        out = out.join(blocked, _HOST, "left_anti")
    return out.drop(_HOST)
