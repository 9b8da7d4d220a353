"""Declarative data-quality expectations (a Deequ-lite gate).

Every production pipeline fronts its tables with a validation gate —
null checks, key uniqueness, value ranges, accepted sets, referential
integrity — and fails the run (or quarantines the batch) on
violations. This module is that gate as plain relational plans: all
row-level rules fold into ONE conditional-sum aggregate over a single
scan; uniqueness adds a count-distinct to the same aggregate;
foreign-key rules each add one anti-join COUNT against their
reference table (the reference side is dimension-sized in practice —
AQE broadcasts it). Nothing here collects data: the report is
rules-sized.

Rule forms (dicts, declarative so configs can carry them):

    {"rule": "not_null",        "col": c}
    {"rule": "unique",          "col": c}
    {"rule": "in_range",        "col": c, "min": x, "max": y}  (either bound optional)
    {"rule": "accepted_values", "col": c, "values": [...]}
    {"rule": "matches_regex",   "col": c, "pattern": r"..."}   (Java/RE2 subset)
    {"rule": "foreign_key",     "col": c, "ref": DataFrame, "ref_col": rc}

Report: (rule_id, rule, col, n_rows, n_violations, passed) — one row
per rule, ``rule_id`` is the rule's position (stable, so reports diff
cleanly across runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _violation_expr(rule: dict):
    kind = rule["rule"]
    c = F.col(rule["col"])
    if kind == "not_null":
        return c.isNull()
    if kind == "in_range":
        bad = F.lit(False)
        if rule.get("min") is not None:
            bad = bad | (c < F.lit(rule["min"]))
        if rule.get("max") is not None:
            bad = bad | (c > F.lit(rule["max"]))
        return c.isNotNull() & bad
    if kind == "accepted_values":
        return c.isNotNull() & ~c.isin(list(rule["values"]))
    if kind == "matches_regex":
        return c.isNotNull() & ~c.rlike(rule["pattern"])
    raise ValueError(f"unknown row-level rule: {kind!r}")


def validate_expectations(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate ``rules`` against ``df``; see module doc for forms.

    NULL semantics follow the declarative-validation convention:
    ``not_null`` is the only rule a NULL violates — range/set/regex
    rules skip NULLs (compose with ``not_null`` when both are meant).
    ``unique`` counts every row beyond the first of a duplicated
    value (NULLs participate as a group). ``foreign_key`` counts rows
    whose non-null value has no match in the reference column.
    """
    spark = df.sparkSession
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, r in enumerate(rules):
        kind = r["rule"]
        if kind == "unique":
            aggs.append(F.count(r["col"]).alias(f"__c{i}"))
            aggs.append(F.countDistinct(r["col"]).alias(f"__d{i}"))
            aggs.append(
                F.sum(F.col(r["col"]).isNull().cast("long")).alias(f"__nn{i}")
            )
        elif kind == "foreign_key":
            continue  # joins handled below
        else:
            aggs.append(
                F.sum(_violation_expr(r).cast("long")).alias(f"__v{i}")
            )
    row = df.agg(*aggs)

    reports = []
    for i, r in enumerate(rules):
        kind = r["rule"]
        if kind == "unique":
            # non-null dup extras + all-but-one of the null group
            viol = (F.col(f"__c{i}") - F.col(f"__d{i}")) + F.greatest(
                F.col(f"__nn{i}") - 1, F.lit(0)
            )
        elif kind == "foreign_key":
            # lazy: the anti-join count rides the plan as a 1-row
            # frame (no driver-side action inside the API)
            missing = (
                df.select(F.col(r["col"]).alias("__k"))
                .filter(F.col("__k").isNotNull())
                .join(
                    r["ref"].select(F.col(r["ref_col"]).alias("__k")).distinct(),
                    "__k",
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).alias("__m"))
            )
            reports.append(
                row.crossJoin(F.broadcast(missing)).select(
                    F.lit(i).alias("rule_id"),
                    F.lit(kind).alias("rule"),
                    F.lit(r["col"]).alias("col"),
                    F.col("__n").cast("long").alias("n_rows"),
                    F.col("__m").cast("long").alias("n_violations"),
                    (F.col("__m") == 0).alias("passed"),
                )
            )
            continue
        else:
            viol = F.col(f"__v{i}")
        reports.append(
            row.select(
                F.lit(i).alias("rule_id"),
                F.lit(r["rule"]).alias("rule"),
                F.lit(r["col"]).alias("col"),
                F.col("__n").cast("long").alias("n_rows"),
                viol.cast("long").alias("n_violations"),
                (viol == 0).alias("passed"),
            )
        )
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out.orderBy("rule_id")


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, out_decimals: int = 6
) -> DataFrame:
    """Per-column profile — the table summary that seeds an
    expectation suite (profile once, turn the observed ranges/null
    rates into ``validate_expectations`` rules). One aggregate over
    one scan for ALL columns. Output: (col, n_rows, n_nulls,
    n_distinct, min_num, max_num, mean, min_str, max_str) — numeric
    columns fill the ``_num``/``mean`` side, everything else the
    ``_str`` side (typed columns, not a stringified union: numeric
    rendering differs across engines and would break hash parity).
    n_distinct is exact (count_distinct — swap approx_count_distinct
    at 100 TB, same plan shape).
    """
    from ..functions.numeric import round_c  # noqa: PLC0415

    cols = cols or df.columns
    numeric = {
        c
        for c, t in df.dtypes
        if t in ("tinyint", "smallint", "int", "bigint", "float", "double")
        or t.startswith("decimal")
    }
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"__null{i}"))
        aggs.append(F.countDistinct(col).alias(f"__dist{i}"))
        if c in numeric:
            aggs.append(F.min(col.cast("double")).alias(f"__min{i}"))
            aggs.append(F.max(col.cast("double")).alias(f"__max{i}"))
            aggs.append(
                F.sum(col.cast("decimal(28,6)")).alias(f"__sum{i}")
            )
        else:
            aggs.append(F.min(col.cast("string")).alias(f"__min{i}"))
            aggs.append(F.max(col.cast("string")).alias(f"__max{i}"))
    row = df.agg(*aggs)
    reports = []
    for i, c in enumerate(cols):
        is_num = c in numeric
        nn = F.col("__n") - F.col(f"__null{i}")
        null_d = F.lit(None).cast("double")
        null_s = F.lit(None).cast("string")
        mean = (
            F.when(
                nn > 0,
                round_c(F.col(f"__sum{i}").cast("double") / nn, out_decimals),
            )
            if is_num
            else null_d
        )
        reports.append(
            row.select(
                F.lit(c).alias("col"),
                F.col("__n").cast("long").alias("n_rows"),
                F.col(f"__null{i}").cast("long").alias("n_nulls"),
                F.col(f"__dist{i}").cast("long").alias("n_distinct"),
                (F.col(f"__min{i}") if is_num else null_d).alias("min_num"),
                (F.col(f"__max{i}") if is_num else null_d).alias("max_num"),
                mean.alias("mean"),
                (null_s if is_num else F.col(f"__min{i}")).alias("min_str"),
                (null_s if is_num else F.col(f"__max{i}")).alias("max_str"),
            )
        )
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    target_rows: int = 1_000_000,
    top_k: int = 10,
) -> DataFrame:
    """Join/shuffle-key skew diagnosis: the measurement that decides
    whether a key needs salting (``salted_join``,
    `operators/relational.py`) or AQE skew-split before a 100 TB
    shuffle.  Returns the ``top_k`` heaviest keys with corpus-wide
    context:

      (key, cnt, share_ppm, salt_factor, n_rows, n_keys, skew_ratio)

    - ``share_ppm``: the key's share of all rows, integer ppm
      (floor division — exact, no doubles).
    - ``salt_factor``: ``ceil(cnt / target_rows)`` via integer
      arithmetic — the number of salt buckets that caps each
      sub-partition at ``target_rows`` rows.
    - ``skew_ratio``: heaviest key over mean rows-per-key; > ~4 is
      the usual act-on-it threshold.

    Scale shape: one hash aggregate over the keys, a 1-row global
    aggregate, and a global top-k that compiles to
    TakeOrderedAndProject (heap per partition + driver merge of k
    rows — no global sort, no full-table collect).  Reference has no
    analog; this is the planning companion of capability row 41.
    """
    if target_rows <= 0 or top_k <= 0:
        raise ValueError("key_skew_profile needs target_rows > 0, top_k > 0")
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("cnt")
    )
    tot = counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("key")).limit(top_k)
    from ..functions.numeric import round_c

    return (
        top.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "cnt",
            F.expr("cnt * 1000000 DIV n_rows").cast("bigint").alias(
                "share_ppm"
            ),
            F.expr(f"(cnt + {int(target_rows)} - 1) DIV {int(target_rows)}")
            .cast("bigint")
            .alias("salt_factor"),
            "n_rows",
            "n_keys",
            round_c(
                F.col("max_cnt").cast("double")
                / (
                    F.col("n_rows").cast("double")
                    / F.col("n_keys").cast("double")
                ),
                6,
            ).alias("skew_ratio"),
        )
        .orderBy(F.col("cnt").desc(), F.col("key"))
    )


def fd_violations(
    df: DataFrame,
    lhs_cols: list[str],
    rhs_col: str,
) -> DataFrame:
    """Functional-dependency audit: report every ``lhs_cols``
    combination that maps to MORE than one distinct ``rhs_col`` value
    — the data-quality check behind "is this column derivable from
    that key?" (candidate-key discovery, denormalization drift, dim
    tables whose attribute silently forked). The gate companion to
    :func:`validate_expectations`: expectations check VALUES, this
    checks STRUCTURE.

    Output per violating combination: the lhs columns,
    ``n_distinct_rhs``, ``n_rows``, and the min/max conflicting rhs
    values as witnesses (enough to eyeball the fork without a second
    scan). NULL rhs values are excluded from the distinct count
    (SQL's countDistinct convention — an unknown value is not
    evidence of a fork); NULL lhs combinations group as themselves.

    Scale shape: ONE hash aggregate on the lhs key (count-distinct
    expands to the standard two-phase partial aggregate) + a filter.
    No window, no self-join.
    """
    return (
        df.groupBy(*lhs_cols)
        .agg(
            F.countDistinct(rhs_col).alias("n_distinct_rhs"),
            F.count(F.lit(1)).alias("n_rows"),
            F.min(rhs_col).alias("rhs_min"),
            F.max(rhs_col).alias("rhs_max"),
        )
        .filter(F.col("n_distinct_rhs") > 1)
        .orderBy(F.desc("n_distinct_rhs"), *lhs_cols)
    )


def cramers_v(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Cramér's V association between two categorical columns — the
    profiling question "are these columns redundant / dependent?"
    that :func:`fd_violations` answers only in the exact-dependency
    limit and Pearson r can't answer for categories at all:
    ``V = sqrt(chi2 / (n · min(r−1, c−1)))`` over the full
    contingency table, 0 = independent, 1 = one determines the
    other.

    Exactness: observed cells and margins are exact counts; each
    expected cell is one double expression in fixed order
    (``row·col/n``), chi2 sums the per-cell terms as 12dp-rounded
    DECIMAL (order-free), one sqrt at the end. NULLs in either
    column are excluded (the countDistinct convention).

    Scale shape: one (a, b) hash aggregate (cells ≤ r·c, model-sized
    for real categorical columns), two margin aggregates joined back,
    a 1-row broadcast total. Output: one row — (n, n_rows, n_cols,
    chi2, v).
    """
    from ..functions.numeric import round_c  # noqa: PLC0415

    base = df.filter(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    ).select(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
    obs = base.groupBy("a", "b").agg(F.count(F.lit(1)).alias("o"))
    ra = obs.groupBy("a").agg(F.sum("o").alias("ra"))
    cb = obs.groupBy("b").agg(F.sum("o").alias("cb"))
    tot = obs.agg(
        F.sum("o").alias("n"),
        F.countDistinct("a").alias("n_rows"),
        F.countDistinct("b").alias("n_cols"),
    )
    # the FULL r x c grid: unobserved combinations contribute
    # (0 - e)^2 / e — dropping them understates chi2 exactly when the
    # association is strongest (a perfect-determination table is half
    # zero cells). The grid is margins x margins: model-sized for real
    # categorical columns, broadcast accordingly.
    cells = (
        ra.crossJoin(F.broadcast(cb))
        .join(obs, ["a", "b"], "left")
        .select(
            "a",
            "b",
            "ra",
            "cb",
            F.coalesce("o", F.lit(0).cast("long")).alias("o"),
        )
    )
    term = (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "n",
            "n_rows",
            "n_cols",
            round_c(
                (
                    F.col("o").cast("double")
                    - F.col("ra").cast("double")
                    * F.col("cb").cast("double")
                    / F.col("n").cast("double")
                )
                * (
                    F.col("o").cast("double")
                    - F.col("ra").cast("double")
                    * F.col("cb").cast("double")
                    / F.col("n").cast("double")
                )
                / (
                    F.col("ra").cast("double")
                    * F.col("cb").cast("double")
                    / F.col("n").cast("double")
                ),
                12,
            ).alias("__t"),
        )
    )
    mind = F.least(F.col("n_rows") - 1, F.col("n_cols") - 1)
    return term.groupBy("n", "n_rows", "n_cols").agg(
        F.sum(F.col("__t").cast("decimal(38,12)"))
        .cast("double")
        .alias("chi2")
    ).select(
        "n",
        "n_rows",
        "n_cols",
        round_c(F.col("chi2"), 6).alias("chi2"),
        F.when(
            mind > 0,
            round_c(
                F.sqrt(
                    F.col("chi2")
                    / (F.col("n").cast("double") * mind.cast("double"))
                ),
                6,
            ),
        ).alias("v"),
    )


def log_templates(
    df: DataFrame,
    text_col: str,
) -> DataFrame:
    """Log-template mining (Drain-lite): collapse free-text log/event
    lines onto their structural templates by masking the variable
    parts — UUIDs → ``<uuid>``, 0x-hex → ``<hex>``, digit runs →
    ``<n>`` — then one hash aggregate per template. The observability
    profiler for machine-generated text: "what KINDS of lines is this
    pipeline emitting, and at what rates" (the line-level analog of
    the column profiler, row 130, and the upstream question before
    boilerplate excision targets the hot templates).

    Output: (template, n_lines, n_distinct_lines, example) — example
    is the MIN raw line (deterministic witness). NULL lines are
    excluded.

    Every mask pattern sits in the Java-and-RE2-common subset (ASCII
    classes, ``\\b`` word boundaries, no lookaround), so a SQL twin
    replays the masking character-for-character. One projection + one
    hash aggregate; template cardinality is the small side by
    construction (that is the point of templates).
    """
    s = F.col(text_col).cast("string")
    t = F.regexp_replace(
        s,
        r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
        r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
        "<uuid>",
    )
    t = F.regexp_replace(t, r"\b0x[0-9a-fA-F]+\b", "<hex>")
    t = F.regexp_replace(t, r"[0-9]+", "<n>")
    t = F.trim(F.regexp_replace(t, r"[ \t]+", " "))
    return (
        df.filter(s.isNotNull())
        .select(t.alias("template"), s.alias("__line"))
        .groupBy("template")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.countDistinct("__line").alias("n_distinct_lines"),
            F.min("__line").alias("example"),
        )
        .orderBy(F.desc("n_lines"), "template")
    )


# Benford first-digit probabilities log10(1 + 1/d), evaluated ONCE in
# Python so both engines embed the SAME literals (the decay-weights
# tabulation trick) -- log10 never runs in either plan.
BENFORD_P = [
    0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514,
]


def benford_audit(
    df,
    value_col: str,
    group_cols: list[str] | None = None,
    out_decimals: int = 6,
):
    """Benford's-law first-digit audit per group — the classic
    fabricated-or-truncated-numbers tripwire for ingested numeric
    feeds (Nigrini's forensic-accounting standard, equally effective
    on synthetic-data tells): naturally occurring multi-magnitude
    quantities put digit d first with probability log10(1 + 1/d);
    capped, defaulted or invented values don't. Reports chi-square
    against the Benford expectation and the mean absolute deviation
    (MAD — Nigrini's conformity bands: < 0.006 close, > 0.015
    nonconformity) per group.

    First-digit extraction never touches float FORMATTING (engine-
    specific): |x| is brought into BIGINT range by ONE power-of-10
    magnitude branch (x*1e18 below 9, x*1e6 below 9e12, x as-is below
    9e18, x/1e12 below 9e30 — a naive x*1e6 cast OVERFLOWS under
    ANSI mode at |x| >= ~9.2e12 and killed the whole audit), rounded
    to an exact BIGINT whose integer-string head is the digit —
    identical in any engine. Values outside [5e-19, 9e30) in
    magnitude (including zero — no leading digit) are excluded and
    simply don't count toward n. The power-of-10 scaling is binary-
    inexact, so a value within ~1 ulp of a digit boundary may read as
    the neighboring digit — deterministically, and identically in
    both engines. The digit grid always covers 1-9 (zero-count digits
    still contribute their expected mass — the cramers_v zero-cell
    lesson).

    One hash aggregate over the corpus + a 9-row broadcast grid;
    chi-square and MAD terms round to 9dp and sum as DECIMAL —
    order- and engine-exact.
    """
    from pyspark.sql import functions as F

    from ..functions.numeric import round_c

    gcols = list(group_cols or [])
    ax = F.abs(F.col(value_col).cast("double"))
    scaled = (
        F.when(ax < F.lit(9e0), ax * F.lit(1e18))
        .when(ax < F.lit(9e12), ax * F.lit(1e6))
        .when(ax < F.lit(9e18), ax)
        .when(ax < F.lit(9e30), ax / F.lit(1e12))
    )  # ELSE NULL: beyond the supported magnitude window, excluded
    m = F.round(scaled, 0).cast("long")
    base = (
        df.filter(F.col(value_col).isNotNull())
        .select(*gcols, m.alias("__m"))
        .filter(F.col("__m") > 0)
        .select(
            *gcols,
            F.substring(F.col("__m").cast("string"), 1, 1)
            .cast("int")
            .alias("__d"),
        )
    )
    counts = base.groupBy(*gcols, "__d").agg(
        F.count(F.lit(1)).cast("long").alias("__o")
    )
    totals = counts.groupBy(*gcols).agg(F.sum("__o").cast("long").alias("__n"))
    spine = totals.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("__d"),
        F.element_at(
            F.array(*[F.lit(p) for p in BENFORD_P]), F.col("id").cast("int")
        ).alias("__p"),
    )
    grid = (
        totals.crossJoin(F.broadcast(spine))
        .join(counts, [*gcols, "__d"], "left")
        .select(
            *gcols,
            "__n",
            "__p",
            F.coalesce(F.col("__o"), F.lit(0)).alias("__o"),
        )
    )
    o = F.col("__o").cast("double")
    exp = F.col("__n").cast("double") * F.col("__p")
    chi_t = round_c((o - exp) * (o - exp) / exp, 9).cast("decimal(28,9)")
    mad_t = round_c(
        F.abs(o / F.col("__n").cast("double") - F.col("__p")), 9
    ).cast("decimal(28,9)")
    out = grid.groupBy(*gcols).agg(
        F.max("__n").alias("n"),
        round_c(F.sum(chi_t).cast("double"), out_decimals).alias("chi2"),
        round_c(
            F.sum(mad_t).cast("double") / F.lit(9.0), out_decimals
        ).alias("mad"),
    )
    return out.orderBy(*gcols) if gcols else out


def schema_drift(
    old_df,
    new_df,
    numeric_cols: list[str] | None = None,
    out_decimals: int = 6,
):
    """Schema + column-statistics drift between two snapshots of a
    table — the ingestion tripwire in front of every downstream
    operator (a silently added/dropped/retyped column, a null-rate
    jump, or a mean shift is how upstream breakage usually arrives):
    one row per column across BOTH snapshots with

        status   added | removed | type_changed | kept
        null_frac (old/new, exact counts, 6 dp)
        mean      (old/new + shift, for ``numeric_cols`` — exact
                   decimal sums, the datasheet discipline)

    ``numeric_cols`` defaults to the numeric columns present in both
    schemas. Schema comparison is metadata-only (driver-side dtypes —
    the resolve.py convention: no data moves for it); statistics cost
    ONE conditional-sum hash aggregate per side, regardless of column
    count (the expectation-gate shape).

    Wide tables note: the stats pass widens the aggregate row, not
    the plan — at 100 TB this is two table scans total.
    """
    from pyspark.sql import functions as F

    from ..functions.numeric import round_c

    old_types = dict(old_df.dtypes)
    new_types = dict(new_df.dtypes)
    all_cols = sorted(set(old_types) | set(new_types))
    if numeric_cols is None:
        # exact names + decimal prefix: a bare startswith("int") would
        # also match interval types.
        exact = {"int", "bigint", "smallint", "tinyint", "double", "float"}

        def _is_num(t: str) -> bool:
            return t in exact or t.startswith("decimal")

        numeric_cols = [
            c
            for c in all_cols
            if c in old_types
            and c in new_types
            and _is_num(old_types[c])
            and _is_num(new_types[c])
        ]

    def _stats(df, cols, types):
        aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
        for c in cols:
            if c in types:
                aggs.append(
                    F.sum(F.col(c).isNull().cast("long")).alias(f"__nul_{c}")
                )
            if c in numeric_cols:
                aggs.append(
                    F.sum(
                        round_c(F.col(c).cast("double"), 6).cast(
                            "decimal(28,6)"
                        )
                    ).alias(f"__sum_{c}")
                )
        return df.agg(*aggs)

    so = _stats(old_df, all_cols, old_types)
    sn = _stats(new_df, all_cols, new_types)
    joined = so.crossJoin(sn.select(
        F.col("__n").alias("__n2"),
        *[
            F.col(f"__nul_{c}").alias(f"__nul2_{c}")
            for c in all_cols
            if c in new_types
        ],
        *[
            F.col(f"__sum_{c}").alias(f"__sum2_{c}")
            for c in numeric_cols
        ],
    ))

    rows = []
    for c in all_cols:
        if c in old_types and c not in new_types:
            status = "removed"
        elif c not in old_types:
            status = "added"
        elif old_types[c] != new_types[c]:
            status = "type_changed"
        else:
            status = "kept"
        old_nf = (
            round_c(
                F.col(f"__nul_{c}").cast("double")
                / F.col("__n").cast("double"),
                out_decimals,
            )
            if c in old_types
            else F.lit(None).cast("double")
        )
        new_nf = (
            round_c(
                F.col(f"__nul2_{c}").cast("double")
                / F.col("__n2").cast("double"),
                out_decimals,
            )
            if c in new_types
            else F.lit(None).cast("double")
        )
        if c in numeric_cols:
            om = round_c(
                F.col(f"__sum_{c}").cast("double")
                / (F.col("__n") - F.col(f"__nul_{c}")).cast("double"),
                out_decimals,
            )
            nm = round_c(
                F.col(f"__sum2_{c}").cast("double")
                / (F.col("__n2") - F.col(f"__nul2_{c}")).cast("double"),
                out_decimals,
            )
            shift = round_c(nm - om, out_decimals)
        else:
            om = nm = shift = F.lit(None).cast("double")
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(status).alias("status"),
                F.lit(old_types.get(c)).alias("old_type"),
                F.lit(new_types.get(c)).alias("new_type"),
                old_nf.alias("old_null_frac"),
                new_nf.alias("new_null_frac"),
                om.alias("old_mean"),
                nm.alias("new_mean"),
                shift.alias("mean_shift"),
            )
        )
    return (
        joined.select(F.explode(F.array(*rows)).alias("__r"))
        .select("__r.*")
        .orderBy("column")
    )
