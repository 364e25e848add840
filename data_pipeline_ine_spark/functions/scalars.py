"""Scalar column functions (SURVEY.md §2.7 F1-F3, F6).

All JVM-side Catalyst expressions (whole-stage codegen) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def let_(value: Column, body) -> Column:
    """Let-binding for Catalyst expressions: evaluate ``value`` ONCE per row
    and expose it to ``body`` as a bound lambda variable.

    Implemented as ``transform(array(value), v -> body(v))[1]`` — the value
    sits in the higher-order function's *input* position (evaluated once),
    and every reference inside ``body`` is a lambda-variable read, i.e. a
    memory access, never a re-evaluation.

    Why this exists: referencing a non-trivial sub-expression inside a
    lambda body inlines the whole expression tree there, and the lambda
    re-evaluates it per element — e.g. a minhash signature referencing its
    shingle array from inside ``transform(seeds, ...)`` recomputes the
    shingling per seed (8×), and project-staging doesn't help because
    CollapseProject/column-pruning can re-inline single-use aliases. This
    binding is robust to all of that: measured 60×+ speedups on the
    simhash/minhash fingerprint paths.
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def sanitize_name(col: Column | str, max_len: int = 100) -> Column:
    """F1 — filesystem-safe snake_case name.

    Reference: ``steps/step1_scraper.py:50-54`` (strip non-word chars,
    collapse whitespace to ``_``, truncate to 100).
    """
    c = F.col(col) if isinstance(col, str) else col
    # (?U): Java regex \w is ASCII-only by default; the reference's Python
    # \w is Unicode-aware and keeps accented letters ("caída", "Año")
    cleaned = F.regexp_replace(c, r"(?U)[^\w\s-]", "")
    underscored = F.regexp_replace(F.trim(cleaned), r"\s+", "_")
    return F.substring(F.lower(underscored), 1, max_len)


def strip_suffix(col: Column | str, suffix: str = ".csv") -> Column:
    """F2 — remove a trailing suffix (``Path.stem`` analog).

    Reference: ``steps/step4_filter_stations.py:54``.
    """
    c = F.col(col) if isinstance(col, str) else col
    import re

    return F.regexp_replace(c, re.escape(suffix) + "$", "")


def view_name(col: Column | str, prefix: str = "v_") -> Column:
    """F6 — ``v_`` view-naming convention.

    Reference: ``steps/step5_create_views.py:475``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit(prefix), c)
