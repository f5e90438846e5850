"""As-of (point-in-time) join — match each left row to the most recent
right row at-or-before its timestamp, per key.

The classic event-pipeline operator Spark lacks natively (feature lookups
"as of" a label timestamp, last-touch attribution, slowly-changing-dimension
resolution).  The naive formulation is a range join (``l.ts >= r.ts``)
whose candidate set is quadratic per key; the scalable formulation used
here is the union-and-carry-forward pattern:

1. union both sides with a side marker (right rows sort BEFORE left rows
   at equal timestamps, so ``ts_right == ts_left`` matches — inclusive
   as-of semantics);
2. one window per key ordered by (ts, side, right-side tiebreak), carrying
   the right payload forward with ``last(..., ignorenulls=True)`` over ONE
   struct holding the whole right row — per-column carry would stitch a
   chimera row whenever the winning right row has a null payload column
   (the older row's non-null value survives the newer row's null);
3. keep only left rows.

Cost: ONE hash shuffle on the key (the same shuffle an equi-join would
pay) plus a per-key sort — no range-join candidate explosion, no
broadcast requirement on either side, and AQE's skew handling applies to
the single Exchange.  At 10^12-row scale a hot key degrades to a big
sorted partition rather than a quadratic blow-up.

Determinism: among right rows sharing a timestamp the LAST one under
``right_order`` wins (documented contract, mirrored by the DuckDB lateral
oracle's ``ORDER BY ts DESC, <right_order> DESC LIMIT 1``).

No reference analog (the reference pipeline is batch-file driven —
de_pipeline/pipeline.py:24-77 has no temporal joins); this operator is
part of the beyond-reference event/training-data surface.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

_SIDE = "_asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    right_order: str,
    tolerance_sec: Optional[int] = None,
    prefix: str = "matched_",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``prefix``-renamed
    ``right_cols`` (and ``prefix + right_ts``) from the latest ``right``
    row with ``right_ts <= left_ts`` on the same ``on`` keys.

    ``right_order`` breaks timestamp ties deterministically (greatest
    value wins).  ``tolerance_sec`` nulls matches older than the window —
    applied AFTER the carry-forward, so it prunes output, never changes
    which row is carried.  Unmatched left rows keep nulls (left-join
    semantics).
    """
    on = list(on)
    right_cols = [c for c in right_cols if c != right_ts]
    carried = [right_ts] + right_cols

    # the carried payload rides as ONE struct: the struct is non-null for
    # every right row even when its fields are null, so the ignorenulls
    # carry-forward picks whole rows atomically — per-column carry stitched
    # together values from DIFFERENT right rows when the winner had nulls
    r = right.select(
        *on,
        F.col(right_ts).cast("timestamp").alias("_asof_ts"),
        F.lit(0).alias(_SIDE),
        F.col(right_order).alias("_asof_ord"),
        F.struct(
            *[F.col(c).alias(f"_r_{c}") for c in carried]
        ).alias("_asof_row"),
    )
    row_type = r.schema["_asof_row"].dataType
    left_cols = left.columns
    l = left.select(
        "*",
        F.col(left_ts).cast("timestamp").alias("_asof_ts"),
        F.lit(1).alias(_SIDE),
        F.lit(None).alias("_asof_ord"),
        F.lit(None).cast(row_type).alias("_asof_row"),
    )
    r_full = r.select(
        *[
            F.col(c) if c in on else F.lit(None).cast(t).alias(c)
            for c, t in zip(left_cols, _dtypes(left, left_cols))
        ],
        "_asof_ts", _SIDE, "_asof_ord", "_asof_row",
    )
    # the union keys both sides into ONE exchange; right rows (side 0)
    # sort before left rows (side 1) at equal timestamps
    u = l.unionByName(r_full)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_asof_ts").asc(), F.col(_SIDE).asc(),
                 F.col("_asof_ord").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        u.select(
            *left_cols, "_asof_ts", _SIDE,
            F.last("_asof_row", ignorenulls=True).over(w).alias("_asof_hit"),
        )
        .where(F.col(_SIDE) == 1)
        .select(
            *left_cols, "_asof_ts", _SIDE,
            *[
                F.col(f"_asof_hit._r_{c}").alias(f"{prefix}{c}")
                for c in carried
            ],
        )
    )
    if tolerance_sec is not None:
        in_window = (
            F.unix_timestamp("_asof_ts")
            - F.unix_timestamp(F.col(f"{prefix}{right_ts}"))
            <= F.lit(int(tolerance_sec))
        )
        out = out.select(
            *left_cols, "_asof_ts", _SIDE,
            *[
                F.when(in_window, F.col(f"{prefix}{c}"))
                .alias(f"{prefix}{c}")
                for c in carried
            ],
        )
    return out.drop("_asof_ts", _SIDE)


def _dtypes(df: DataFrame, cols: Sequence[str]):
    m = dict(df.dtypes)
    # carried right columns live under their _r_ alias once selected
    return [m.get(c, m.get(f"_r_{c}")) for c in cols]
