"""Count-min sketch: mergeable heavy-hitter counting in fixed memory.

The CMS (Cormode & Muthukrishnan, 2005) is the streaming/distributed
answer to "how often does each of these keys occur?" when the key space
is too large to count exactly: a d × w counter grid where each
occurrence increments one cell per hash row, and a key's estimate is
the MIN over its d cells. Two properties make it pipeline-grade:

- **never underestimates** (every cell the key maps to received all of
  its increments — a deterministic guarantee, asserted by the bounds
  checker and the unit tests);
- **bounded overestimate**: per row the expected collision mass is
  N/w, so ``P(min-estimate > true + m·N/w) ≤ m^-d`` by Markov +
  row-independence — the published trade of accuracy for fixed memory.

Scale shape: the sketch build is ONE aggregation over (seed, cell) —
d·w counters total (4×512 = 2 KB of longs here) regardless of corpus
size, map-side combinable, and MERGEABLE across shards/days by simple
cell-wise addition (the property a 1000-executor rollup needs). Probing
broadcasts the model-sized sketch. ``xxhash64(token, seed)`` keeps the
whole thing JVM-side and engine-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_D = 4
CMS_W = 512


def cms_build(
    tokens: DataFrame, token_col: str = "token", d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """(seed, cell, c) counter grid from a token-occurrence stream."""
    cells = tokens.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        F.pmod(
                            F.xxhash64(F.col(token_col), F.lit(s)), F.lit(w)
                        ).alias("cell"),
                    )
                    for s in range(d)
                ]
            )
        ).alias("sc")
    )
    return cells.groupBy("sc.seed", "sc.cell").agg(F.count("*").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    token_col: str = "token",
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """min-over-rows point estimates for ``keys`` (one row per key).

    The sketch is model-sized (d·w rows) and broadcasts; the probe is a
    keys × d expansion joined on (seed, cell) — never a scan of the
    corpus. The join is LEFT with absent cells coalesced to 0: a key whose
    hashed cell was never incremented has a true CMS estimate of 0, and an
    inner join would silently drop it (or take the min over only its
    non-empty cells) — wrong for any key not present in the corpus.
    """
    probes = keys.select(
        token_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        F.pmod(
                            F.xxhash64(F.col(token_col), F.lit(s)), F.lit(w)
                        ).alias("cell"),
                    )
                    for s in range(d)
                ]
            )
        ).alias("sc"),
    ).select(token_col, "sc.seed", "sc.cell")
    return (
        probes.join(F.broadcast(sketch), ["seed", "cell"], "left")
        .groupBy(token_col)
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("est_count"))
    )
