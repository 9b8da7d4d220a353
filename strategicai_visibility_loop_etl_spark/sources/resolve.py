"""Fuzzy column resolution + URL-column autodetection.

Counterpart of reference etl_merge.py:115-283. Column resolution is a
*metadata* operation — it looks only at ``df.columns`` (driver-side,
O(#columns)) and never scans data. URL autodetection samples a bounded
number of rows (``df.limit(n)`` → small collect), exactly the kind of
driver-side peek that is safe at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Canonical fields the merged dataset tries to produce, with defaults
# for missing sources (reference etl_merge.py:115-132).
CANON_FIELDS: dict[str, str | None] = {
    "url": None,
    "status_code": None,
    "title": "",
    "meta_description": "",
    "click_depth": None,
    "inlinks": None,
    "word_count": None,
    "schema_types": "",
    "clicks": None,
    "impressions": None,
    "ctr": None,
    "position": None,
    "users": None,
    "sessions": None,
    "engaged_sessions": None,
    "avg_engagement_time": None,
}

# Cross-tool header synonyms, slugged (reference etl_merge.py:135-159).
SYNONYMS: dict[str, set[str]] = {
    "url": {
        "url", "address", "page", "pageurl", "landingpage", "pagelocation",
        "pagepath", "pagepathquerystring", "pagepath+querystring", "toppages",
        "landingpagequerystring", "pagepathandscreenclass",
    },
    "status_code": {"statuscode", "status", "httpstatus"},
    "title": {"title", "title1", "pagetitle"},
    "meta_description": {"metadescription", "metadescription1", "description"},
    "click_depth": {"crawldepth", "depth", "clickdepth"},
    "inlinks": {"inlinks", "inboundlinks"},
    "word_count": {"wordcount", "words"},
    "schema_types": {"structureddata", "schematypes", "schema", "structuredcontent"},
    "clicks": {"clicks", "gscclicks", "totalclicks"},
    "impressions": {"impressions", "gscimpressions", "totalimpressions"},
    "ctr": {"ctr", "gscctr"},
    "position": {"position", "avgposition", "gscposition", "avgpos"},
    "users": {"users", "totalusers", "activeusers"},
    "sessions": {"sessions"},
    "engaged_sessions": {"engagedsessions"},
    "avg_engagement_time": {
        "avgengagementtime", "averagesessionduration", "averageengagementtime",
    },
}


def slug(name: str) -> str:
    """Lowercase + strip non-alphanumerics, for fuzzy header matching."""
    return "".join(ch for ch in str(name or "").lower() if ch.isalnum())


def resolve_columns(df: DataFrame, wanted: list[str]) -> dict[str, str | None]:
    """canonical name → actual column name (or None), via slug + synonyms."""
    existing = {slug(c): c for c in df.columns}
    out: dict[str, str | None] = {}
    for canon in wanted:
        found = existing.get(slug(canon))
        if found is None:
            for syn in SYNONYMS.get(canon, set()):
                if slug(syn) in existing:
                    found = existing[slug(syn)]
                    break
        out[canon] = found
    return out


def autodetect_url_column(df: DataFrame, sample_rows: int = 50) -> str | None:
    """Find the column whose sampled values look most like URLs.

    Single bounded job: ``limit(sample_rows)`` collected once, all
    columns scored from the same sample (vs one scan per column).
    """
    cols = [c for c in df.columns if slug(c) and not str(c).strip().startswith("#")]
    if not cols:
        return None
    # One bounded job: collect the sample, score all columns driver-side.
    rows = df.select(*cols).limit(sample_rows).collect()
    if not rows:
        return None

    def _url_like(v: object) -> bool:
        s = str(v or "").strip().lower()
        return s.startswith(("http://", "https://", "/"))

    hits = {c: sum(1 for r in rows if _url_like(r[c])) for c in cols}
    n = len(rows)

    # Prefer URL-synonym headers whose values actually look like URLs.
    url_slugs = {slug(s) for s in SYNONYMS["url"] | {"url"}}
    for c in cols:
        if slug(c) in url_slugs and hits[c] >= max(3, int(n * 0.1)):
            return c
    best = max(cols, key=lambda c: hits[c])
    return best if hits[best] >= 3 else None


def coalesce_columns(df: DataFrame, mapping: dict[str, str | None]) -> DataFrame:
    """Project canonical columns, substituting defaults for missing ones."""
    exprs = []
    for canon, src in mapping.items():
        if src is not None:
            exprs.append(F.col(src).cast("string").alias(canon))
        else:
            default = CANON_FIELDS.get(canon)
            exprs.append(F.lit(default).cast("string").alias(canon))
    return df.select(*exprs)
