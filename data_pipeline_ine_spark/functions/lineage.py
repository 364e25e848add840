"""In-query lineage cuts with a plan-audit escape hatch.

A multi-consumer intermediate inside one declared query (a survivor
set referenced by four downstream joins, a gate stack consumed by
several aggregates) re-executes its ENTIRE upstream subtree once per
reference unless the lineage is cut — ``localCheckpoint(eager=False)``
materializes it exactly once, inside the timed query, nothing carried
across runs. The cost of the cut is opacity: a checkpointed frame
explains as ``Scan ExistingRDD``, which blinds plan-quality tests and
the plan-lint tooling to the real upstream topology (ADVICE r12: the
curation_v3 plan pin had become vacuous — it only inspected the
post-checkpoint tail).

``cut()`` is therefore the ONE entry point for perf-motivated lazy
lineage cuts, governed by ``CHECKPOINTS_DISABLED`` exactly like
``operators/similarity.py::GRAPH_MEMO_DISABLED``: audit paths (plan
tests, tools/plan_lint.py, tools/gen_plans_md.py) flip it to build the
full lazy compute plan; runtime and bench keep the cut.

Do NOT route correctness-bearing checkpoints through here: the
two-pass rank/cumsum boundary checkpoints (``operators/sampling.py``)
pin ONE sampled set of range boundaries for two consuming branches —
removing them changes results, not just plans — and the iterative
graph loops need their per-round EAGER checkpoints (the r12 negative
result: lazy cuts there re-execute the recursive chain from every
concurrent broadcast-subtree job).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

# Plan-audit hook (see module docstring). Mutable module global so the
# audit tools can set it; prefer the scoped context manager in
# long-lived processes.
CHECKPOINTS_DISABLED = False


@contextmanager
def checkpoints_disabled():
    """Scoped audit hook: ``cut()`` becomes the identity for the
    duration of the ``with`` block (so ``explain`` shows the full
    upstream plan), restoring the previous value even on error."""
    global CHECKPOINTS_DISABLED
    prev = CHECKPOINTS_DISABLED
    CHECKPOINTS_DISABLED = True
    try:
        yield
    finally:
        CHECKPOINTS_DISABLED = prev


def cut(df: DataFrame) -> DataFrame:
    """Lazy in-query lineage cut: materialize ``df`` once at first use
    and let every later reference reuse the stored rows, unless the
    plan-audit flag asks for the pure lazy plan."""
    if CHECKPOINTS_DISABLED:
        return df
    return df.localCheckpoint(eager=False)
