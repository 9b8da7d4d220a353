"""Half-tie rounding discipline, pinned mechanically.

Spark's ``F.round(x, n)`` rounds the double's shortest decimal
representation; DuckDB rounds DOUBLE as ``round(x * 10^n) / 10^n``.
The two disagree whenever ``x * 10^n`` lands on (or the repr
straddles) a .5 boundary — a class that produced FOUR live hash
divergences across the r13/r14 decade sweeps (unigram LM scores,
hashed-scorer weights, qx11/qx19 .5 ties, a percentile-cut ulp).
The fix is ``round_c`` (``functions/numeric.py``) / the registry's
``_rd`` wrapper, which reproduce the multiply-form bit-for-bit.

r13 migrated every scale>0 ``F.round`` in the package by grep; r14
found four more surviving in ``__spark_entry__.py`` because the grep
never covered it.  This test closes the class the same way the
scale-cap audit does: AST-walk BOTH the package and the registry —
any ``F.round(col, n)`` with a literal ``n > 0`` outside ``round_c``
itself fails.  Scale-0 calls stay legal (``F.round(y, 0)`` equals
C ``round(y)`` for |y| < 2^53 — exact at ties, used by the int8
quantizer and the histogram bucketer).
"""

from __future__ import annotations

import ast
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
PKG = REPO / "strategicai_visibility_loop_etl_spark"

#: the one legal scale>0 F.round: round_c's own multiply-form body
#: (F.round(col * p, 0) is scale-0 anyway, so nothing needs a pass
#: here — kept as a table so a justified exception has a home).
ALLOWED: set[tuple[str, int]] = set()


def _scaled_round_calls(path: Path) -> list[tuple[str, int, str]]:
    """(file, line, why) for every ``<anything>.round(col, n)`` whose
    scale is a literal n > 0 OR non-literal (unauditable — a variable
    scale must route through round_c), regardless of what the
    functions module is called locally — plus any alias-import of
    pyspark's ``round`` (``from pyspark.sql.functions import round``)
    which would dodge attribute matching entirely."""
    tree = ast.parse(path.read_text())
    rel = str(path.relative_to(REPO))
    hits = []
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            if node.module and node.module.startswith("pyspark"):
                for alias in node.names:
                    if alias.name == "round":
                        hits.append(
                            (rel, node.lineno,
                             "direct import of pyspark round — use "
                             "F.round(… , 0) or round_c")
                        )
            continue
        if not isinstance(node, ast.Call):
            continue
        f = node.func
        if not (isinstance(f, ast.Attribute) and f.attr == "round"):
            continue
        scale = None
        has_scale = False
        if len(node.args) >= 2:
            has_scale = True
            if isinstance(node.args[1], ast.Constant):
                scale = node.args[1].value
        for kw in node.keywords:
            if kw.arg == "scale":
                has_scale = True
                if isinstance(kw.value, ast.Constant):
                    scale = kw.value.value
        if not has_scale:
            continue  # .round(col) — scale 0 default, exact at ties
        if (rel, node.lineno) in ALLOWED:
            continue
        if scale is None:
            hits.append(
                (rel, node.lineno,
                 "non-literal scale — a parametric scale must go "
                 "through round_c")
            )
        elif isinstance(scale, int) and scale > 0:
            hits.append((rel, node.lineno, f"scale={scale}"))
    return hits


def test_no_scaled_f_round_outside_round_c():
    files = sorted(PKG.rglob("*.py")) + [REPO / "__spark_entry__.py"]
    offenders = []
    for p in files:
        offenders.extend(_scaled_round_calls(p))
    assert not offenders, (
        "scale>0 round sites found — these diverge from DuckDB "
        "round() at .5 ties (four live divergences across the "
        "r13/r14 decades); use round_c / _rd instead:\n"
        + "\n".join(f"  {f}:{ln} ({why})" for f, ln, why in offenders)
    )


def test_round_c_is_the_multiply_form():
    """round_c must stay the multiply-form (F.round(col * p, 0) / p);
    its known exactness argument (|y| < 2^53) is what the whole
    discipline leans on."""
    src = (PKG / "functions" / "numeric.py").read_text()
    assert "F.round(col * p, 0) / p" in src


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-q"])
