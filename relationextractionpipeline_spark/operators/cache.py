"""Tracked persist() scope for operators whose returned DataFrames are built
on cached intermediates.

Several operators persist an intermediate that BOTH feeds multiple join
branches of the returned (lazy) DataFrame — the persist is what keeps an
expensive sketch/assignment UDF from re-running per branch (see the
persist-scope notes at each site).  Because the result is lazy, the operator
itself can never unpersist: the cache must outlive the caller's action.  The
contract is therefore **caller-owns-scope**:

* operators register each persist here via ``track(df)``;
* a caller that has materialized its results calls ``release_all()`` (or
  ``spark.catalog.clearCache()``) to free executor storage — bench.py and
  tools/check_parity.py do this after every query; a long-lived service
  should do it per request batch.

Without release, a session running many queries accumulates storage memory
(the executor-storage leak flagged in round 3).  ``localCheckpoint()`` sites
(connected components, canonicalize) are NOT tracked: a checkpoint's blocks
ARE its data (unpersisting one invalidates the DataFrame), so their scope is
the result's lifetime — Spark's ContextCleaner frees them when the last
reference is garbage-collected.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame

_TRACKED: List[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """persist() a DataFrame and register it for ``release_all()``."""
    df.persist()
    _TRACKED.append(df)
    return df


def release_all() -> int:
    """Unpersist every tracked DataFrame (non-blocking); returns how many.

    Safe to call at any time: already-materialized results stay valid (they
    recompute from lineage if re-used), only the cached blocks are freed.
    """
    n = len(_TRACKED)
    for df in _TRACKED:
        try:
            df.unpersist(False)
        except Exception:  # session already stopped — nothing to free
            pass
    _TRACKED.clear()
    return n
