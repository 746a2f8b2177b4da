"""Hot-key shuffle-join probe: prove the engine SURVIVES skew, not just
diagnoses it (``pipeline_skew_report``).

Builds a fact table where ONE key owns 50% of the rows (the classic
power-law hot key: a null-ish sentinel user, a viral document) joined to a
100k-key dimension, forced through a sort-merge join (broadcast disabled —
at 100 TB the dim side of a real skewed join often exceeds broadcast
budget too), and times three strategies uncontended:

  1. plain shuffle join, AQE skew split OFF — the naive baseline where the
     hot key's entire partition lands on one task;
  2. plain shuffle join, AQE skew split ON (the engine session's default:
     ``session.py`` sets spark.sql.adaptive.skewJoin.enabled=true) with
     thresholds scaled to the probe size, since the stock 256 MB
     detection threshold is cluster-scale;
  3. explicit ``operators.joins.salted_join`` (salt=8) — the a-priori
     tool for when AQE is off or the join isn't sort-merge.

All three must return identical aggregates (asserted). Usage:

    python scripts/skew_probe.py [n_rows]

Prints one RES line per strategy for NOTES.md.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from ambient_sound_analysis_api_spark.operators.joins import (  # noqa: E402
    salted_join,
)
from ambient_sound_analysis_api_spark.session import get_spark  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    spark = get_spark("skew-probe")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # 50% of rows on key 0, the rest uniform over 100k keys
    left = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.col("id") % 100_000)
        .alias("key"),
        (F.col("id") % 1_000).alias("payload"),
    )
    right = spark.range(100_000).select(
        F.col("id").alias("key"), (F.col("id") % 97).alias("dim")
    )

    def run(df):
        [row] = (
            df.groupBy()
            .agg(F.count("*").alias("n"), F.sum(F.col("dim").cast("long")).alias("s"))
            .collect()
        )
        return (row["n"], row["s"])

    def timed(label, fn, reps=2):
        best, res = 1e9, None
        for _ in range(reps):
            t0 = time.time()
            res = fn()
            best = min(best, time.time() - t0)
        print(f"RES {label}: {best:.2f}s result={res}")
        return res

    results = []

    # scale AQE's cluster-sized detection thresholds down to probe size
    # 1MB, not the stock 256MB: lz4 compresses the synthetic sequential
    # longs ~20x, so the 8M-row hot partition is only a few MB on the wire
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results.append(timed("plain_join_skew_split_off", lambda: run(left.join(right, "key"))))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    joined = left.join(right, "key")
    results.append(timed("plain_join_aqe_skew_split_on", lambda: run(joined)))
    # AQE's final plan exists only after execution: run the SAME DataFrame
    # to completion, then read its executed plan for the skew marker
    marker_df = joined.groupBy().agg(F.count("*").alias("n"))
    marker_df.collect()
    final_plan = marker_df._jdf.queryExecution().executedPlan().toString()
    print("RES aqe_skew_marker_present:", "skew=true" in final_plan)

    results.append(
        timed(
            "salted_join_salt8",
            lambda: run(salted_join(left, right, on=["key"], salt=8)),
        )
    )

    assert len(set(results)) == 1, f"strategies disagree: {results}"
    print("RES all_strategies_identical_results: True")
    return 0


if __name__ == "__main__":
    sys.exit(main())
