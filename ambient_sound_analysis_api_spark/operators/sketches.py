"""Engine-portable one-pass sketches: explicit HyperLogLog and a fixed-grid
histogram quantile sketch.

Spark ships native sketches (``approx_count_distinct`` = HLL++,
``percentile_approx`` = GK) and those remain the zero-thought defaults — but
their register layouts are engine-internal, so a result built on them can
never be verified by an external SQL oracle, and their state can't be
merged with sketches produced outside Spark. These implementations make the
sketch STATE itself a plain DataFrame of integers derived from the repo's
portable md5 hash family (``functions.scalars.md5_hash60``):

- the identical estimate reproduces in any engine with md5 (the DuckDB
  oracle recomputes it bit-for-bit — see ``registry.agg_approx_sketches``),
- the state is mergeable across systems (HLL registers merge by ``max``,
  histogram bins by ``+``), the property that matters at 100 TB where
  sketches are built per-partition/per-day and rolled up later,
- memory is fixed: 64 registers / 128 bins per group regardless of input.

Scale shape: everything is hash-aggregate over (group, register|bin) — two
combiner-friendly shuffles bounded by |groups| × m, never by row count.

Accuracy: HLL with m=64 has standard error 1.04/√64 ≈ 13% (the
pinned-accuracy unit test allows 3σ); the 128-bin equi-width quantile is
exact to half a bin width of the value RANGE — the honest trade for exact
cross-engine reproducibility at fixed memory. Crank ``m``/``nbins`` for
tighter estimates; both stay (group × m)-bounded.

Floating-point contract: the per-row bin index and the final estimate are
chains of SINGLE IEEE-754 operations on identical inputs (no float
reductions — all sums are integers), so they are deterministic across
engines; ``ln`` in the HLL small-range branch is rounded to 6dp at the
point it enters arithmetic, per the repo-wide decimal contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalars import md5_hash60

#: HLL register count (2^6) and the derived constants.
HLL_M = 64
#: alpha_16..64 from Flajolet et al. 2007 for m = 64.
HLL_ALPHA = 0.709
#: rho is computed over the 54 hash bits left after the register index;
#: scaling by 2^55 turns the 2^-rho harmonic terms into exact integers.
_RHO_SCALE = 55
#: alpha * m^2 * 2^55 — one double literal so the estimate is a single
#: division (Python repr is embedded verbatim in the SQL oracle).
HLL_CONST = HLL_ALPHA * HLL_M * HLL_M * float(1 << _RHO_SCALE)


def hll_registers(
    df: DataFrame, key: Column | str, group_cols: list[str]
) -> DataFrame:
    """Portable HLL register table per group: ``group_cols + (reg, m)``.

    Register index = low 6 bits of ``md5_hash60(key)``; rho = position of
    the first set bit in the remaining 54 (via ``length(bin(w))`` — string
    length of the minimal binary form, identical in Spark and DuckDB);
    ``m`` = max rho per register. This IS the sketch state: ≤64 integer
    rows per group, mergeable across any partitioning of the data by a
    further ``max`` — the property the rollup operators build on.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    h = md5_hash60(key_col.cast("string"))
    w = F.shiftright(h, 6)
    rho = F.when(w == 0, F.lit(_RHO_SCALE)).otherwise(
        F.lit(_RHO_SCALE) - F.length(F.bin(w))
    )
    return (
        df.filter(key_col.isNotNull())
        .select(*group_cols, (h % HLL_M).alias("reg"), rho.alias("rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("m"))
    )


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: list[str], out_col: str = "approx_users"
) -> DataFrame:
    """Distinct-count estimate from a register table (Flajolet et al. 2007):
    the harmonic sum is kept as the exact integer Σ 2^(55−M_j) so the only
    float operations are the final division and the small-range
    ``64·ln(64/V)`` linear-counting branch (ln 6dp-rounded per the repo
    contract). Registers absent from the table count as empty."""
    hll = regs.groupBy(*group_cols).agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_RHO_SCALE} - m)")
        ).alias("s_present"),
        F.count("*").alias("n_regs"),
    )
    s_total = F.col("s_present") + (F.lit(HLL_M) - F.col("n_regs")) * F.lit(
        1 << _RHO_SCALE
    )
    e_raw = F.lit(HLL_CONST) / s_total.cast("double")
    v = (F.lit(HLL_M) - F.col("n_regs")).cast("double")
    small = (e_raw <= F.lit(2.5 * HLL_M)) & (v > 0)
    lc = F.lit(float(HLL_M)) * F.round(
        F.log(F.lit(float(HLL_M)) / v), 6
    )
    return hll.select(
        *group_cols,
        F.round(F.when(small, lc).otherwise(e_raw), 4).alias(out_col),
    )


def hll_estimate(
    df: DataFrame, key: Column | str, group_cols: list[str]
) -> DataFrame:
    """Portable HyperLogLog distinct-count estimate per group
    (build + estimate in one go; see ``hll_registers`` /
    ``hll_estimate_from_registers``).

    Returns ``group_cols + [approx_users]`` (estimate rounded to 4dp).
    """
    return hll_estimate_from_registers(
        hll_registers(df, key, group_cols), group_cols
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    qs: dict[str, float],
    nbins: int = 128,
) -> DataFrame:
    """Fixed-grid histogram quantile estimates per group.

    Two passes (exact min/max, then bin counts — at 100 TB pass 1 is
    usually replaced by known bounds, making it one pass); the estimate
    for quantile q is the MIDPOINT of the first bin whose cumulative count
    reaches q·n. Every float step is a single IEEE op on identical inputs
    (the /nbins divisions are exact powers-of-two scalings), so estimates
    reproduce bit-for-bit across engines.

    ``qs`` maps output column name → quantile fraction.
    """
    val = F.col(value_col)
    stats = (
        df.filter(val.isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.min(value_col).alias("_lo"),
            F.max(value_col).alias("_hi"),
            F.count(value_col).alias("_n"),
        )
    )
    span = F.col("_hi") - F.col("_lo")
    bin_idx = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(nbins - 1),
            F.floor((val - F.col("_lo")) / span * F.lit(float(nbins))),
        )
    )
    binned = (
        df.filter(val.isNotNull())
        .join(F.broadcast(stats), group_cols)
        .select(
            *group_cols, "_lo", "_hi", "_n", bin_idx.cast("int").alias("_bin")
        )
    )
    bins = binned.groupBy(*group_cols, "_lo", "_hi", "_n", "_bin").agg(
        F.count("*").alias("_c")
    )
    cum = F.sum("_c").over(
        Window.partitionBy(*group_cols).orderBy("_bin")
    )
    edge = F.when(F.col("_hi") == F.col("_lo"), F.col("_lo")).otherwise(
        F.col("_lo")
        + (F.col("_bin") + F.lit(0.5)) * (F.col("_hi") - F.col("_lo"))
        / F.lit(float(nbins))
    )
    cums = bins.withColumn("_cum", cum).withColumn("_edge", edge)
    aggs = [
        F.round(
            F.min(
                F.when(
                    F.col("_cum") >= F.lit(q) * F.col("_n"), F.col("_edge")
                )
            ),
            6,
        ).alias(name)
        for name, q in qs.items()
    ]
    return cums.groupBy(*group_cols).agg(*aggs)
