"""Mergeable frequency sketches: Count-Min over arbitrary keys.

The 100 TB counting primitive the exact ``groupBy(key).count()`` path
can't provide when the key space itself is corpus-sized (distinct tokens,
URLs, n-grams): a Count-Min sketch (Cormode & Muthukrishnan 2005) bounds
the SHUFFLED state at ``d × w`` counters per map task regardless of input
size — partial sketches from every partition merge by cell-wise addition,
which is exactly what a Spark map-side-combined ``groupBy(i, bucket)``
does.  Estimates are biased high (``est ≥ true``; with prob ≥ 1-δ,
``est ≤ true + εN`` for ``w = ⌈e/ε⌉``, ``d = ⌈ln 1/δ⌉``).

Everything is deterministic and engine-portable: row hashes derive from
the shared md5 primitive (``sampling.hash_bucket`` — first 8 hex chars of
``md5(key || ':' || salt)``), so a DuckDB oracle replays the sketch
bit-for-bit.  No UDFs — the d bucket indices per row come from one
``posexplode`` over an array of native Columns.

No reference analog (the reference counts nothing at scale); part of the
training-data operator family (heavy-hitter token/doc frequency without a
corpus-sized shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from relationextractionpipeline_spark.operators.sampling import hash_bucket

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 1024


def _bucket(col, row: int, width: int, salt: str):
    """Row ``row``'s bucket for ``col``: shared-md5 hash under a
    row-specific salt, mod the sketch width."""
    return F.pmod(
        hash_bucket(col, f"{salt}:{row}"), F.lit(int(width))
    ).cast("int")


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    salt: str = "cms",
) -> DataFrame:
    """Build the Count-Min sketch table for ``df[key_col]``.

    Output: (``row``, ``bucket``, ``cnt``) — at most ``depth × width``
    rows TOTAL (the sketch), produced by one map-side-combined aggregate:
    each input row explodes to its ``depth`` (row, bucket) cells, and the
    per-partition combiner collapses them to ≤ depth×width partials
    before the exchange.  The shuffle therefore carries
    O(tasks × depth × width) rows however large the input is — the
    sketch's entire point.  Sketches built on disjoint inputs with the
    same (depth, width, salt) merge by summing ``cnt`` per cell
    (``cms_merge``).
    """
    key = F.col(key_col)
    cells = df.select(
        F.posexplode(
            F.array(*[_bucket(key, i, width, salt) for i in range(depth)])
        ).alias("row", "bucket")
    )
    return cells.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width, salt): cell-wise
    count addition — the mergeability that makes the sketch a distributed
    aggregate rather than a single-pass structure."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    key_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    salt: str = "cms",
) -> DataFrame:
    """Point-query the sketch for every row of ``items``: the estimate is
    the MIN over the item's ``depth`` cells (an absent cell counts 0,
    which can only happen for keys never inserted).  ``items`` keeps all
    its columns plus ``est`` — the classic use joins a candidate set
    (e.g. an exact small-scale top-k, or a stream of lookups) against a
    sketch built over data too wide to count exactly.

    Plan shape: items explode ×depth → equi-join the (row, bucket)-keyed
    sketch (dimension-sized: ≤ depth×width rows, broadcast) → min-agg
    back to one row per item.  Never a corpus-sized shuffle.
    """
    key = F.col(key_col)
    probes = items.select(
        "*",
        F.posexplode(
            F.array(*[_bucket(key, i, width, salt) for i in range(depth)])
        ).alias("row", "bucket"),
    )
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    others = [c for c in items.columns]
    return (
        joined.groupBy(*others)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


# ---------------------------------------------------------------------------
# K-Minimum-Values distinct-count sketch (Bar-Yossef et al. 2002): keep the
# k smallest distinct hash values; the k-th smallest fixes the estimate
# (k-1) * 2^32 / h_k.  All integer math — unlike HLL's float harmonic mean,
# the estimate itself is bit-replayable in SQL, so the DuckDB gate covers
# the whole sketch, not just its registers.
# ---------------------------------------------------------------------------

KMV_HASH_SPACE = 1 << 32


def kmv_sketch(
    df: DataFrame, key_col: str, k: int = 256, salt: str = "kmv"
) -> DataFrame:
    """The k smallest DISTINCT shared-md5 hash values of ``df[key_col]``
    (column ``h``).  Plan: hash → distinct (map-side combined) →
    sort+limit, which Spark executes as per-partition top-k merged on the
    driver (TakeOrdered) — never a global sort of the key space.
    Sketches over disjoint inputs merge by union → distinct → re-take the
    k smallest (``kmv_merge``)."""
    h = df.select(hash_bucket(F.col(key_col), salt).alias("h")).distinct()
    return h.orderBy("h").limit(int(k))


def kmv_merge(k: int, *sketches: DataFrame) -> DataFrame:
    """Merge KMV sketches built with the same salt: the k smallest of the
    union of survivors (a KMV sketch is a uniform sample of the distinct
    hash space, so the merged bound is exact)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy("h").limit(int(k))


def kmv_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: one row,
    (``n_kept``, ``est``).  If the sketch holds fewer than k hashes the
    count is EXACT (every distinct value is present); otherwise
    ``est = (k-1) * 2^32 div h_k`` with h_k the largest kept hash —
    integer division, identical in Spark and SQL."""
    agg = sketch.agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("h_k")
    )
    return agg.select(
        "n_kept",
        F.when(F.col("n_kept") < F.lit(int(k)), F.col("n_kept"))
        .otherwise(
            F.expr(f"CAST({(int(k) - 1) * KMV_HASH_SPACE} AS BIGINT) div h_k")
        )
        .alias("est"),
    )
