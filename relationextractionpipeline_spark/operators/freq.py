"""Mergeable sketches over corpus-sized key spaces: Count-Min (point
frequency), KMV and HyperLogLog (distinct count).

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

from pyspark.sql import DataFrame, Window, functions as F

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
    # regroup on a synthetic row id, not on items' columns: grouping by
    # the columns collapsed duplicate lookup rows, broke on an existing
    # 'cnt'/'row'/'bucket' column, and was illegal for map-typed columns
    tagged = items.withColumn("_cms_rid", F.monotonically_increasing_id())
    probes = tagged.select(
        "*",
        F.posexplode(
            F.array(*[_bucket(key, i, width, salt) for i in range(depth)])
        ).alias("_cms_row", "_cms_bucket"),
    )
    joined = probes.join(
        F.broadcast(
            sketch.select(
                F.col("row").alias("_cms_row"),
                F.col("bucket").alias("_cms_bucket"),
                F.col("cnt").alias("_cms_cnt"),
            )
        ),
        ["_cms_row", "_cms_bucket"],
        "left",
    )
    return (
        joined.groupBy("_cms_rid")
        .agg(
            *[F.first(c).alias(c) for c in items.columns],
            F.min(F.coalesce(F.col("_cms_cnt"), F.lit(0))).alias("est"),
        )
        .drop("_cms_rid")
    )


# ---------------------------------------------------------------------------
# K-Minimum-Values distinct-count sketch (Bar-Yossef et al. 2002): keep the
# k smallest distinct hash values; the k-th smallest fixes the estimate
# (k-1) * 2^32 / h_k.  All integer math — unlike HLL's float harmonic mean,
# the estimate itself is bit-replayable in SQL, so the DuckDB gate covers
# the whole sketch, not just its registers.
# ---------------------------------------------------------------------------

KMV_HASH_SPACE = 1 << 32

# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (Flajolet et al. 2007): m = 2^b registers
# each holding the max leading-zero rank seen in its bucket's hash suffix.
# Registers merge by cell-wise MAX — a map-side-combined groupBy — so the
# shuffled state is ≤ m rows per map task regardless of input size, and
# sketches over disjoint inputs union exactly (the property KMV pays k
# hashes for, HLL gets in m 5-bit registers).  Complements KMV: same
# distinct-count question, register-based instead of sample-based, with the
# standard-error knob σ ≈ 1.04/√m.
#
# Determinism: the hash is the shared md5 primitive; the rank is integer
# bit-length math (length(bin(w))), and the harmonic-mean denominator is
# accumulated as an exact INTEGER (Σ 2^(HLL_W_BITS+1−rho) in scaled units) —
# shuffle order cannot perturb one bit, and the float estimate derives from
# that single integer scalar with an expression written identically in the
# DuckDB oracle.
# ---------------------------------------------------------------------------

HLL_B = 8  # 2^8 = 256 registers
HLL_W_BITS = 32 - HLL_B  # hash bits left for the rank after bucketing


def _hll_cells(key, b: int, salt: str):
    """(bucket, rho) Columns for one key value — shared by the global and
    grouped sketch builders so the register math cannot drift."""
    w_bits = 32 - int(b)
    h = hash_bucket(key, salt)
    w = F.pmod(h, F.lit(1 << w_bits)).cast("long")
    rho = (
        F.when(w == 0, F.lit(w_bits + 1))
        .otherwise(F.lit(w_bits + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    bucket = (h.cast("long") / F.lit(1 << w_bits)).cast("long")
    return bucket, rho


def hll_sketch(
    df: DataFrame, key_col: str, b: int = HLL_B, salt: str = "hll"
) -> DataFrame:
    """Register table (``bucket``, ``rho``) for ``df[key_col]``: bucket =
    top ``b`` hash bits, rho = 1-based position of the leftmost 1 in the
    remaining ``32-b`` bits (``32-b+1`` when they are all zero), register =
    MAX rho per bucket.  ≤ 2^b rows total, one map-side-combined
    aggregate — the shuffle carries O(tasks × 2^b) rows however large the
    input is."""
    bucket, rho = _hll_cells(F.col(key_col), b, salt)
    cells = df.select(bucket.alias("bucket"), rho.alias("rho"))
    return cells.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_sketch_grouped(
    df: DataFrame,
    key_col: str,
    group_cols: list,
    b: int = HLL_B,
    salt: str = "hll",
) -> DataFrame:
    """Per-group register table (``*group_cols``, ``bucket``, ``rho``) —
    the grouped-cardinality pattern (distinct subjects per predicate,
    distinct users per tool, …): one map-side-combined aggregate whose
    state is ≤ 2^b registers PER GROUP, so a billion-row group costs the
    same shuffle as a hundred-row one.  Same cell math as the global
    sketch; groups merge by register MAX exactly like sketches do."""
    bucket, rho = _hll_cells(F.col(key_col), b, salt)
    cells = df.select(
        *group_cols, bucket.alias("bucket"), rho.alias("rho")
    )
    return cells.groupBy(*group_cols, "bucket").agg(
        F.max("rho").alias("rho")
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (b, salt): cell-wise register
    MAX — the union sketch is bit-identical to sketching the concatenated
    inputs, which is what makes HLL a distributed aggregate."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate_grouped(
    sketch: DataFrame, group_cols: list, b: int = HLL_B
) -> DataFrame:
    """Per-group distinct-count estimates from a grouped register table:
    (``*group_cols``, ``n_used``, ``v_zero``, ``s_scaled``, ``est``) —
    identical estimate expressions to :func:`hll_estimate` (exact-integer
    scaled harmonic sum, small-range linear counting, BIGINT floor), one
    group-keyed aggregate."""
    m = 1 << int(b)
    w_bits = 32 - int(b)
    scale = 1 << (w_bits + 1)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_used"),
        F.sum(F.expr(f"CAST(shiftleft(1, {w_bits + 1} - rho) AS BIGINT)"))
        .alias("s_present"),
    )
    v_zero = F.lit(m) - F.col("n_used")
    s_scaled = F.coalesce(F.col("s_present"), F.lit(0)) + v_zero * F.lit(scale)
    raw = (
        F.lit(alpha) * F.lit(float(m)) * F.lit(float(m)) * F.lit(float(scale))
        / s_scaled.cast("double")
    )
    lin = F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (v_zero > 0), lin).otherwise(raw)
    return agg.select(
        *group_cols,
        F.col("n_used").cast("long").alias("n_used"),
        v_zero.cast("long").alias("v_zero"),
        s_scaled.cast("long").alias("s_scaled"),
        F.floor(est).cast("long").alias("est"),
    )


def hist_sketch(
    df: DataFrame, col: str, lo: float, hi: float, n_bins: int = 128
) -> DataFrame:
    """Fixed-range equi-width histogram sketch of ``df[col]``: ≤ ``n_bins``
    (``bucket``, ``cnt``) rows from one map-side-combined aggregate —
    the mergeable approximate-quantiles path for 100 TB (the exact
    rank-based quantiles pay a value-keyed shuffle; this pays an
    ``n_bins``-bounded one).  Out-of-range values clamp into the edge
    buckets, so the sketch never drops rows — quantile estimates beyond
    [lo, hi] degrade to the range edges rather than silently missing
    mass.  NULL values are EXCLUDED (missing data is not minimum-value
    mass: without the filter, greatest(null, 0) clamped every null into
    bucket 0 and dragged quantiles toward ``lo``).  Disjoint-input
    sketches merge by bucket-wise addition (``hist_merge``)."""
    width = (float(hi) - float(lo)) / int(n_bins)
    b = F.floor((F.col(col).cast("double") - F.lit(float(lo))) / F.lit(width))
    b = F.least(
        F.greatest(b.cast("int"), F.lit(0)), F.lit(int(n_bins) - 1)
    )
    return (
        df.where(F.col(col).isNotNull())
        .select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(*sketches: DataFrame) -> DataFrame:
    """Merge histogram sketches built with identical (lo, hi, n_bins):
    bucket-wise count addition."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    sketch: DataFrame,
    qs: list,
    lo: float,
    hi: float,
    n_bins: int = 128,
) -> DataFrame:
    """Quantile estimates from a histogram sketch: for each ``q`` the first
    bucket whose cumulative count reaches ``ceil(q·N)``, linearly
    interpolated within the bucket.

    Everything downstream of the sketch is bin-bounded: the cumulative sum
    is a single-partition window over ≤ ``n_bins`` rows, the probe join is
    a constant-key broadcast equi-join of ``len(qs) × n_bins`` rows, and
    exactly one row survives per ``q`` (``cum ≥ target > cum − cnt``).
    Estimates are doubles derived from integer counts with one shared
    expression, so a DuckDB oracle replays them bit-for-bit.

    Output: (``q``, ``target_rank``, ``bucket``, ``est``).
    """
    width = (float(hi) - float(lo)) / int(n_bins)
    w = Window.orderBy("bucket")
    cum = sketch.select(
        "bucket",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.lit(1).alias("_k"),
    )
    total = sketch.agg(
        F.sum("cnt").alias("total"), F.lit(1).alias("_k")
    )
    probes = total.select(
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
        "total",
        "_k",
    ).select(
        "q",
        F.ceil(F.col("q") * F.col("total")).alias("target_rank"),
        "_k",
    )
    hit = probes.join(F.broadcast(cum), "_k").where(
        (F.col("cum") >= F.col("target_rank"))
        & (F.col("cum") - F.col("cnt") < F.col("target_rank"))
    )
    est = F.lit(float(lo)) + (
        F.col("bucket")
        + (F.col("target_rank") - (F.col("cum") - F.col("cnt")))
        .cast("double")
        / F.col("cnt").cast("double")
    ) * F.lit(width)
    return hit.select(
        "q", "target_rank", "bucket", F.round(est, 6).alias("est")
    )


def hll_estimate(sketch: DataFrame, b: int = HLL_B) -> DataFrame:
    """Distinct-count estimate from an HLL register table: one row,
    (``m``, ``n_used``, ``v_zero``, ``s_scaled``, ``est``).

    The harmonic mean is kept exact-integer: each present register
    contributes ``2^(w_bits+1-rho)`` and each empty register ``2^(w_bits+1)``
    to ``s_scaled`` (= 2^(w_bits+1) · Σ 2^-rho), so the raw estimate
    ``alpha·m²·2^(w_bits+1) / s_scaled`` is a float derived from ONE
    integer — no float accumulation anywhere.  Small-range correction
    (Flajolet §4): linear counting ``m·ln(m/V)`` when the raw estimate is
    below 2.5·m and empty registers remain.  The estimate floors to BIGINT
    (decimal rounding of doubles differs between engines — NOTES.md)."""
    m = 1 << int(b)
    w_bits = 32 - int(b)
    scale = 1 << (w_bits + 1)
    # alpha_m for m >= 128 (Flajolet et al. 2007, fig. 3) — written as the
    # same literal arithmetic the SQL oracle uses so the doubles agree
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = sketch.agg(
        F.count(F.lit(1)).alias("n_used"),
        F.sum(F.expr(f"CAST(shiftleft(1, {w_bits + 1} - rho) AS BIGINT)"))
        .alias("s_present"),
    )
    v_zero = F.lit(m) - F.col("n_used")
    s_scaled = F.coalesce(F.col("s_present"), F.lit(0)) + v_zero * F.lit(scale)
    raw = (
        F.lit(alpha) * F.lit(float(m)) * F.lit(float(m)) * F.lit(float(scale))
        / s_scaled.cast("double")
    )
    lin = F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (v_zero > 0), lin).otherwise(raw)
    return agg.select(
        F.lit(m).alias("m"),
        F.col("n_used").cast("long").alias("n_used"),
        v_zero.cast("long").alias("v_zero"),
        s_scaled.cast("long").alias("s_scaled"),
        F.floor(est).cast("long").alias("est"),
    )


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
