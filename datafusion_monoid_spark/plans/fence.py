"""Pin an expensive computed column to its plan position.

Catalyst's predicate pushdown + projection collapse substitute alias
DEFINITIONS into downstream operators.  Usually that is exactly right
(filters reach the scan); for an EXPENSIVE computed column it can be
catastrophic: a predicate over the column is rewritten to contain the
full defining expression and then sinks below the exchanges that
provide parallelism.  Measured on ``stratified_sample_mix`` at sf1: the
sampling predicate — with the whole tokenize + language-ID chain
inlined — was pushed beneath the round-robin repartition to the
single-file parquet scan, running every tokenization on ONE core:
19-24 s per run vs ~1.1 s steady-state with the column pinned.

Non-solutions, measured: a dropped non-deterministic dummy column
(column pruning erases it before pushdown runs, restoring determinism)
and a non-deterministic no-op disjunct in the predicate (the chain
still landed in the scan filter).  The reliable barrier is an
AGGREGATION: Catalyst cannot substitute an alias through a grouping
boundary, so everything below ``groupBy(key).agg(first(...))`` is
evaluated exactly once, where it stands, and downstream operators see
plain attributes.

``pin_columns`` is that barrier.  It requires ``key_col`` to be UNIQUE
per row (a primary key), making ``first()`` over the 1-row groups a
semantic no-op; the cost is one shuffle of the (already projected,
narrow) output — negligible next to the recomputation it prevents.
Use it when (a) a column is expensive to compute (tokenization, model
scores, heavy regex) AND (b) downstream logic filters or joins on it.
Do NOT use it on cheap columns — it blocks pushdown, which is normally
the optimization you want.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pin_columns(df: DataFrame, key_col: str) -> DataFrame:
    """Optimizer barrier: evaluate ``df``'s computed columns HERE.

    ``key_col`` must be unique per row (e.g. ``doc_id``); every other
    column is carried with ``first()`` over the resulting 1-row groups,
    so values are unchanged while the aggregation boundary stops alias
    substitution and predicate pushdown cold."""
    others = [c for c in df.columns if c != key_col]
    return df.groupBy(key_col).agg(
        *[F.first(c).alias(c) for c in others])
