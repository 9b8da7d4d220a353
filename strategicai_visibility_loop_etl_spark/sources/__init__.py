from .readers import load_table_any
from .resolve import slug, resolve_columns, autodetect_url_column, coalesce_columns, SYNONYMS, CANON_FIELDS
from .loaders import load_frog, load_gsc, load_ga4

__all__ = [
    "load_table_any",
    "slug",
    "resolve_columns",
    "autodetect_url_column",
    "coalesce_columns",
    "SYNONYMS",
    "CANON_FIELDS",
    "load_frog",
    "load_gsc",
    "load_ga4",
]
