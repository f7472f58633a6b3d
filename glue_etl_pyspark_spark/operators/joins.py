"""Join operators (SURVEY.md §2.4).

``glue_join`` mirrors the reference's ``Join.apply`` (inner equi-join
on key lists). ``asof_join`` and ``range_join`` are the two
time-join shapes Spark lacks as primitives, implemented with
scale-safe plans:

- as-of: union + keyed window (one shuffle on the key, zero row
  blowup) instead of a theta join that would go nested-loop.
- range: coarse time-bucket equi-join prefilter so the physical plan
  is a hash/sort-merge join on (key, bucket) with the exact interval
  predicate as a residual filter — never BroadcastNestedLoop over the
  full cross product.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def glue_join(
    left: DataFrame,
    right: DataFrame,
    keys1: Sequence[str],
    keys2: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on parallel key lists (Glue ``Join.apply``).

    Glue only exposes inner; ``how`` extends to the full Spark set
    (left/right/full/semi/anti/cross via ``df.join``).
    """
    keys2 = list(keys2 or keys1)
    if list(keys1) == keys2:
        return left.join(right, on=list(keys1), how=how)
    cond = None
    for a, b in zip(keys1, keys2):
        c = left[a] == right[b]
        cond = c if cond is None else (cond & c)
    return left.join(right, on=cond, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    suffix: str = "_right",
    tie_break: str | None = None,
) -> DataFrame:
    """For each left row, attach the single nearest right row per key.

    ``direction="backward"``: latest right row with
    ``right.on <= left.on`` (inclusive); ``"forward"``: earliest right
    row with ``right.on >= left.on``.

    Determinism precondition: the right side must be unique per
    ``(by, on)`` — otherwise the window order below ties and ``last``
    picks an arbitrary right row. Either pre-aggregate the right side
    (the registered query pre-aggregates clicks per (user, ts)) or pass
    ``tie_break``: a right-side column appended to the window ordering;
    among right rows sharing (by, on), the one with the LARGEST
    non-NULL tie_break value wins (for both directions). tie_break
    itself must then be unique per (by, on) — duplicate
    (by, on, tie_break) triples tie again and the pick is arbitrary —
    and rows with NULL tie_break sort first, i.e. always lose to any
    non-NULL one. A synthetic id (monotonically_increasing_id) is NOT a
    valid tie_break: its values depend on partition layout, so it only
    hides the nondeterminism across runs. If no unique right-side
    column exists, pre-aggregate.

    Plan: tag sides, union on (by, on, right-payload), then
    ``last(payload, ignorenulls=True)`` over a per-key window ordered
    by (on, side[, tie_break]) — a single shuffle on ``by``; no join
    blowup, which is what makes this the 100 TB-safe shape (a naive
    ``left.join(right, right.ts <= left.ts)`` is quadratic).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in by and c != on]
    out_names = [f"{c}{suffix}" if c in left.columns else c for c in value_cols]

    # The right payload travels as ONE struct so the window picks the
    # nearest right row atomically — per-column last(ignorenulls) would
    # stitch together fields from different right rows whenever the
    # nearest row holds a NULL in one column.
    payload_t = ", ".join(
        f"{n}: {right.schema[c].dataType.simpleString()}"
        for c, n in zip(value_cols, out_names)
    )
    # side=0 sorts before side=1 at equal timestamps, so an exactly-
    # coincident right row is visible to the left row (inclusive bound).
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        F.lit(None).cast(f"struct<{payload_t}>").alias("__payload"),
        *(
            [F.lit(None).cast(right.schema[tie_break].dataType).alias("__tie")]
            if tie_break is not None
            else []
        ),
    )
    r_tagged = right.select(
        *by,
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in by and c != on],
        F.lit(0).alias("__side"),
        F.struct(
            *[F.col(c).alias(n) for c, n in zip(value_cols, out_names)]
        ).alias("__payload"),
        *([F.col(tie_break).alias("__tie")] if tie_break is not None else []),
    ).select(*l_tagged.columns)  # align column order for union

    order = [F.col(on).asc(), F.col("__side").asc()]
    if direction == "forward":
        order = [F.col(on).desc(), F.col("__side").asc()]
    if tie_break is not None:
        # asc + last() => the largest tie_break among equal (by, on)
        # right rows wins; left rows carry NULL (sorts first, harmless)
        order.append(F.col("__tie").asc_nulls_first())
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l_tagged.unionByName(r_tagged)
    filled = unioned.select(
        *[c for c in left.columns],
        F.col("__side"),
        F.last("__payload", ignorenulls=True).over(w).alias("__payload"),
    )
    return filled.filter(F.col("__side") == 1).select(
        *[c for c in left.columns],
        *[F.col(f"__payload.{n}").alias(n) for n in out_names],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    start: str,
    end: str,
    by: Sequence[str] | None = None,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Join left rows whose ``point`` falls in right's [start, end).

    Both sides get a coarse time-bucket key (``floor(epoch /
    bucket_seconds)``); right intervals are exploded to every bucket
    they cover via ``sequence()``. The join is then a plain equi-join
    on (by..., bucket) with the exact range predicate as a residual —
    shuffle-partitionable and AQE-skew-splittable. Choose
    ``bucket_seconds`` ≈ typical interval length: explosion factor
    stays ~2 while the prefilter keeps candidate pairs near-linear.
    """
    by = list(by or [])
    lb = F.floor(F.unix_timestamp(F.col(point)) / bucket_seconds)
    sb = F.floor(F.unix_timestamp(F.col(start)) / bucket_seconds)
    eb = F.floor(F.unix_timestamp(F.col(end)) / bucket_seconds)

    l2 = left.withColumn("__bucket", lb)
    r2 = right.withColumn("__bucket", F.explode(F.sequence(sb, eb)))
    joined = l2.join(r2, on=by + ["__bucket"], how="inner").drop("__bucket")
    return joined.filter((F.col(point) >= F.col(start)) & (F.col(point) < F.col(end)))
