"""Source-specific loaders: Screaming Frog / GSC / GA4 → canonical frames.

Counterpart of reference etl_merge.py:527-653. Each loader: robust
ingest → fuzzy column resolution (+ URL autodetect fallback) → canonical
projection → URL normalization → typed coercion. All transformations
are native column expressions; the only driver-side work is schema
resolution and the bounded autodetect sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import os

from ..functions.numeric import normalize_ctr, to_double_nocomma, to_long
from ..functions.urls import looks_url_like, url_normalize_df
from ..operators.governance import write_autodetect_log
from .readers import load_table_any
from .resolve import autodetect_url_column, coalesce_columns, resolve_columns

FROG_FIELDS = [
    "url", "status_code", "title", "meta_description",
    "click_depth", "inlinks", "word_count", "schema_types",
]
GSC_FIELDS = ["url", "clicks", "impressions", "ctr", "position"]
GA4_FIELDS = ["url", "users", "sessions", "engaged_sessions", "avg_engagement_time"]

# GA4 junk row markers (reference etl_merge.py:645).
GA4_JUNK = ("(not set)", "(other)", "other", "not set")


def _resolve_with_autodetect(
    df: DataFrame, fields: list[str], source_name: str = ""
) -> dict[str, str | None]:
    mapping = resolve_columns(df, fields)
    auto = None
    if mapping.get("url") is None:
        auto = autodetect_url_column(df)
        if auto:
            mapping["url"] = auto
    if source_name:
        # Row count is an extra full scan in Spark (the reference gets it
        # free from an in-memory frame); opt in via env, else log -1.
        rows = df.count() if os.getenv("ETL_AUTODETECT_LOG_COUNT", "").strip() else -1
        write_autodetect_log(source_name, mapping, auto, rows)
    return mapping


def load_frog(
    spark: SparkSession,
    path: str,
    site_base: str | None = None,
    strip_all_query: bool = False,
) -> DataFrame:
    """Screaming Frog crawl export → canonical crawl frame (the spine)."""
    raw = load_table_any(spark, path)
    out = coalesce_columns(raw, _resolve_with_autodetect(raw, FROG_FIELDS, "screaming_frog"))
    out = url_normalize_df(out, "url", None, site_base, strip_all_query)
    for c in ("status_code", "click_depth", "inlinks", "word_count"):
        out = out.withColumn(c, to_long(F.col(c)))
    return out


def load_gsc(
    spark: SparkSession,
    path: str,
    site_base: str | None = None,
    strip_all_query: bool = False,
) -> DataFrame:
    """GSC performance export → canonical search frame (pre-aggregation)."""
    raw = load_table_any(spark, path)
    out = coalesce_columns(raw, _resolve_with_autodetect(raw, GSC_FIELDS, "gsc"))
    out = out.filter(looks_url_like(F.col("url")))
    out = url_normalize_df(out, "url", None, site_base, strip_all_query)
    for c in ("clicks", "impressions", "position"):
        out = out.withColumn(c, to_double_nocomma(F.col(c)))
    # CTR percent-vs-fraction heuristic is a global decision → two-pass.
    out = normalize_ctr(out, "ctr")
    return out


def load_ga4(
    spark: SparkSession,
    path: str,
    site_base: str | None = None,
    strip_all_query: bool = False,
) -> DataFrame:
    """GA4 pages/screens export → canonical analytics frame (pre-aggregation)."""
    raw = load_table_any(spark, path)
    out = coalesce_columns(raw, _resolve_with_autodetect(raw, GA4_FIELDS, "ga4"))
    out = out.withColumn("url", F.trim(F.col("url")))
    out = out.filter(
        looks_url_like(F.col("url")) & ~F.lower(F.col("url")).isin(*GA4_JUNK)
    )
    out = url_normalize_df(out, "url", None, site_base, strip_all_query)
    for c in ("users", "sessions", "engaged_sessions", "avg_engagement_time"):
        out = out.withColumn(c, to_double_nocomma(F.col(c)))
    return out
