"""General join operators beyond the reference surface (SURVEY.md §2.3, §7.7).

The reference's only join-shaped logic is the catalog validation semi-join
(implemented in ``operators/validation.py``); a real analytics engine needs
the general forms. The non-trivial one Spark lacks natively is the **as-of
join**; the implementation here is the scalable union-sort-window form, not
a per-key collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row within the same
    ``on`` key: the latest with ``right.ts <= left.ts`` (``backward``, the
    pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` default) or the earliest
    with ``right.ts >= left.ts`` (``forward``). ``tolerance`` is an SQL
    interval literal (e.g. ``"INTERVAL 30 DAYS"``) bounding how far the
    match may sit from the left timestamp — matches outside it come back
    as NULLs, exactly like pandas' ``tolerance``.

    Plan shape: union the two sides tagged by origin, single shuffle on
    ``on`` + sort by (ts, origin), then ``last(value, ignoreNulls)`` over an
    unbounded-preceding window carries the nearest right-side values onto
    left rows (the forward direction just scans the timeline in reverse).
    Cost: one shuffle + one sort — no range explosion, no per-key collect;
    skew on ``on`` is handled by AQE. The tolerance is a post-carry filter,
    so it adds zero join/shuffle cost.

    Right rows sort *before* left rows at equal timestamps so an exact
    timestamp match is visible to the left row (<=/>= semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    # The right side is carried as ONE struct, not per-column: with
    # independent last(ignoreNulls) per value column, a NULL field in the
    # nearest right row would pull that field from an older/farther row —
    # violating the merge_asof contract (match the nearest ROW; its NULLs
    # are the answer). A struct is NULL only on left-origin rows, so
    # last(struct, ignoreNulls) always delivers the nearest row intact.
    rv_struct = F.struct(
        F.col(right_ts).alias("_rts"),
        *[F.col(v).alias(f"_rv_{v}") for v in right_values],
    )
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in lcols]).alias("_lrow"),
        F.lit(None).cast(
            right.select(rv_struct.alias("_r")).schema["_r"].dataType
        ).alias("_rvals"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            l_tagged.schema["_lrow"].dataType
        ).alias("_lrow"),
        rv_struct.alias("_rvals"),
    )
    ts_order = (
        F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(ts_order, F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "_k",
        "_ts",
        "_is_left",
        "_lrow",
        F.last("_rvals", ignorenulls=True).over(w).alias("_carried"),
    )
    c_ts = F.col("_carried._rts")
    if tolerance is None:
        within = c_ts.isNotNull()
    elif direction == "backward":
        within = c_ts >= F.col("_ts") - F.expr(tolerance)
    else:
        within = c_ts <= F.col("_ts") + F.expr(tolerance)
    out = carried.filter(F.col("_is_left") == 1).select(
        *[F.col(f"_lrow.{c}").alias(c) for c in lcols],
        *[
            F.when(within, F.col(f"_carried._rv_{v}")).alias(v)
            for v in right_values
        ],
    )
    return out


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_s: int,
    extra_cond=None,
) -> DataFrame:
    """Point-in-interval range join via bucketing.

    Naive ``l.ts BETWEEN r.start AND r.end`` forces a broadcast-nested-loop;
    bucketing both sides to ``bucket_s`` buckets (intervals exploded across
    the buckets they span) turns it into an equi-join on bucket with a
    residual range predicate — the standard scalable range-join rewrite.
    """
    # Defensive TIMESTAMP cast: unix_micros rejects TIMESTAMP_NTZ inputs;
    # under the engine's pinned-UTC session TZ the cast is value-preserving
    # and a no-op on plain TIMESTAMP columns.
    _us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    lb = left.withColumn(
        "_bucket", (_us(left_ts) / F.lit(bucket_s * 1_000_000)).cast("long")
    )
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (_us(right_start) / F.lit(bucket_s * 1_000_000)).cast("long"),
                (_us(right_end) / F.lit(bucket_s * 1_000_000)).cast("long"),
            )
        ),
    )
    cond = (
        (lb["_bucket"] == rb["_bucket"])
        & (lb[left_ts] >= rb[right_start])
        & (lb[left_ts] <= rb[right_end])
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return lb.join(rb, cond).drop("_bucket")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with hot-key salting for skewed key distributions.

    The left (large, skewed) side gets a uniform random salt in [0, salt);
    the right side is replicated once per salt value. The shuffle key
    becomes (key, salt), splitting each hot key across ``salt`` reducers at
    the cost of a ``salt``× blowup of the right side — so use it with a
    small-to-medium right side and a genuinely skewed left.

    AQE's runtime skew-join split (``spark.sql.adaptive.skewJoin``) is the
    first line of defense and needs no code change; explicit salting remains
    the tool when AQE is off, when skew is known a priori, or for non-sort-
    merge plans AQE won't split.

    Only ``inner`` and ``left`` joins are supported: for those, results are
    identical to the plain join for any salt assignment (the salt only
    redistributes matching rows, and every left row carries exactly one
    salt). A ``right``/``full_outer`` join over the salt-exploded right side
    would emit each *unmatched* right row once per salt value — ``salt``
    phantom copies — so those modes raise instead of silently corrupting.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "an outer join on the salt-replicated right side duplicates "
            "unmatched right rows"
        )
    salted_l = left.withColumn("_salt", (F.rand(42) * salt).cast("int"))
    salted_r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_l.join(salted_r, [*on, "_salt"], how).drop("_salt")
