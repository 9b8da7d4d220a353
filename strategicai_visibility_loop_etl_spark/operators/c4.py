"""C4-style structural page cleaning (Raffel et al. 2020, §2.2).

The C4 pipeline's line/page rules are the canonical first-pass
structural filter of web-crawl training corpora — entirely
string-shape rules, so in Spark they compile to ONE codegen
projection per document: higher-order array expressions over the
page's line array, no explode, no shuffle, no Python. At 100 TB this
stage is embarrassingly parallel and I/O-bound by design.

Rules implemented (same order and semantics as the paper):

* line-level — keep a line only if it ends in a terminal punctuation
  mark (``. ! ? "``), has at least ``min_words_per_line`` words, and
  does not contain the word "javascript" (case-insensitive);
* page-level — drop the whole page if it contains "lorem ipsum", a
  curly brace ``{``, or any word from the configurable ``bad_words``
  policy list; drop pages whose RETAINED lines carry fewer than
  ``min_sentences`` sentence-terminal marks.

The reference repo has no corpus-cleaning stage (its domain is SEO
exports, etl_merge.py end to end); this operator is part of the
beyond-reference training-data surface, alongside the Gopher
repetition metrics and perplexity filters in ``textprep``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import flet

_TERMINAL_RE = '[.!?"]$'
_SENTENCE_MARKS = "[.!?]"


def _line_words(line: Column) -> Column:
    return F.filter(F.split(line, r"\s+"), lambda w: F.length(w) > 0)


def _c4_line_stats(
    text: Column, min_words_per_line: int
) -> Column:
    """struct(n_lines, n_lines_kept, n_sentences, clean) for one page.

    Both array builds are ``flet``-bound (evaluated once per row): the
    line split/trim/filter and the rule chain (a regex per line) would
    otherwise re-run for every field that references them — measured
    ~4× the whole operator's cost before the binding was added.
    """
    lines_expr = F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )

    def stats(lines: Column) -> Column:
        kept_expr = F.filter(
            lines,
            lambda l: l.rlike(_TERMINAL_RE)
            & (F.size(_line_words(l)) >= min_words_per_line)
            & ~F.lower(l).contains("javascript"),
        )
        return flet(
            kept_expr,
            lambda kept: F.named_struct(
                F.lit("n_lines"), F.size(lines),
                F.lit("n_lines_kept"), F.size(kept),
                F.lit("n_sentences"),
                F.aggregate(
                    kept,
                    F.lit(0),
                    lambda acc, l: acc
                    + (
                        F.length(l)
                        - F.length(F.regexp_replace(l, _SENTENCE_MARKS, ""))
                    ),
                ),
                F.lit("clean"), F.array_join(kept, "\n"),
            ),
        )

    return flet(lines_expr, stats)


def _c4_drop_reason(
    page: Column,
    n_sentences: Column,
    min_sentences: int,
    bad_words: tuple[str, ...],
) -> Column:
    """First matching page-level drop reason, NULL when kept."""
    low = F.lower(page)
    if bad_words:
        alt = "|".join(re.escape(w.lower()) for w in bad_words)
        # no lookahead — the oracle replays this in RE2 (DuckDB)
        has_bad = low.rlike(rf"(?:^|\s)(?:{alt})[.!?]*(?:\s|$)")
    else:
        has_bad = F.lit(False)
    return (
        F.when(low.contains("lorem ipsum"), F.lit("lorem_ipsum"))
        .when(page.contains("{"), F.lit("brace"))
        .when(has_bad, F.lit("bad_words"))
        .when(n_sentences < min_sentences, F.lit("too_few_sentences"))
    )


def c4_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    bad_words: tuple[str, ...] = (),
) -> DataFrame:
    """Apply the C4 line/page rules; one row out per row in.

    Returns ``id_col`` plus: ``kept`` (page survives), ``drop_reason``
    (first matching of ``lorem_ipsum``/``brace``/``bad_words``/
    ``too_few_sentences``, NULL when kept), ``n_lines`` (non-empty
    input lines), ``n_lines_kept``, ``n_sentences`` (terminal marks in
    retained lines), and ``clean_text`` (retained lines re-joined;
    NULL when the page is dropped).

    Pure codegen: the page never leaves its partition and no data
    moves — callers filter on ``kept`` and select ``clean_text``.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    staged = df.select(
        F.col(id_col),
        text.alias("__pg"),
        _c4_line_stats(text, min_words_per_line).alias("__s"),
    )
    s = F.col("__s")
    reason = _c4_drop_reason(
        F.col("__pg"), s["n_sentences"], min_sentences, bad_words
    )
    return staged.select(
        F.col(id_col),
        reason.isNull().alias("kept"),
        reason.alias("drop_reason"),
        s["n_lines"].alias("n_lines"),
        s["n_lines_kept"].alias("n_lines_kept"),
        s["n_sentences"].alias("n_sentences"),
        F.when(reason.isNull(), s["clean"]).alias("clean_text"),
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    bad_words: tuple[str, ...] = (),
) -> DataFrame:
    """Pipeline form of the C4 rules: drop failing pages, rewrite
    ``text_col`` to the retained lines, keep every other column.
    Still one codegen projection + a filter on the same scan — no
    join back, no shuffle (contrast report-shaped
    ``c4_quality_filter``, which returns stats for ALL pages)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    staged = df.withColumns(
        {
            "__c4s": _c4_line_stats(text, min_words_per_line),
            "__c4pg": text,
        }
    )
    reason = _c4_drop_reason(
        F.col("__c4pg"),
        F.col("__c4s")["n_sentences"],
        min_sentences,
        bad_words,
    )
    return (
        staged.filter(reason.isNull())
        .withColumn(text_col, F.col("__c4s")["clean"])
        .drop("__c4s", "__c4pg")
    )


def synth_pages(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_line: int = 6,
) -> DataFrame:
    """Deterministic page scaffolding for structureless corpora (the
    qx13 pattern: manufacture the defect, then verify the repair).

    Re-segments each document's single-line text into pseudo-lines of
    ``words_per_line`` words and stamps line endings / C4-rule
    violations from pure integer arithmetic on (doc_id, line index,
    line word count) — trivially replayable in any SQL engine, no
    string hashing:

    * ``m = (id·131 + i·37 + w·17) mod 10`` picks the line ending:
      0-6 → ``.``, 7 → ``!``, 8 → ``?``, 9 → none (line fails the
      terminal-punctuation rule);
    * ``(id·7 + i) mod 13 == 0`` truncates the line to 3 words (fails
      the min-words rule);
    * ``(id + i) mod 17 == 1`` appends " javascript required" before
      the ending (fails the javascript rule);
    * ``id mod 97 == 3`` appends a "lorem ipsum" line,
      ``id mod 89 == 5`` a ``{`` line, ``id mod 101 == 7`` a
      policy-word line ("badtoken") — page-level drops.

    Output: (``id_col``, ``page``) — newline-joined pseudo-lines.
    """
    from ..functions.text import normalized_text

    toks_expr = F.filter(
        F.split(
            normalized_text(F.coalesce(F.col(text_col), F.lit(""))), " "
        ),
        lambda t: F.length(t) >= 1,
    )
    did = F.col(id_col).cast("long")
    wpl = F.lit(words_per_line)

    # flet-bound: build_line's slices reference the token array inside
    # a per-line lambda — unbound, tokenization would re-run per LINE.
    def build_body(toks: Column) -> Column:
        n_lines = F.ceil(F.size(toks) / wpl).cast("int")
        idx = F.when(
            n_lines >= 1, F.sequence(F.lit(0), n_lines - 1)
        ).otherwise(F.array().cast("array<int>"))

        def build_line(i: Column) -> Column:
            base = F.slice(toks, i * wpl + 1, words_per_line)
            trunc = (did * 7 + i) % 13 == 0
            words = F.when(trunc, F.slice(base, 1, 3)).otherwise(base)
            w = F.size(words)
            line = F.array_join(words, " ")
            line = F.when(
                (did + i) % 17 == 1,
                F.concat(line, F.lit(" javascript required")),
            ).otherwise(line)
            m = (did * 131 + i.cast("long") * 37 + w * 17) % 10
            end = (
                F.when(m <= 6, F.lit("."))
                .when(m == 7, F.lit("!"))
                .when(m == 8, F.lit("?"))
                .otherwise(F.lit(""))
            )
            return F.concat(line, end)

        return F.array_join(F.transform(idx, build_line), "\n")

    body = flet(toks_expr, build_body)
    extras = F.concat(
        F.when(did % 97 == 3, F.lit("\nlorem ipsum dolor sit amet.")).otherwise(
            F.lit("")
        ),
        F.when(did % 89 == 5, F.lit("\nconfig = { enabled: true }.")).otherwise(
            F.lit("")
        ),
        F.when(did % 101 == 7, F.lit("\nthis line has badtoken inside it.")).otherwise(
            F.lit("")
        ),
    )
    return df.select(did.alias(id_col), F.concat(body, extras).alias("page"))
