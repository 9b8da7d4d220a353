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
