"""Per-query wall-time breakdown: construction vs planning vs execution.

Usage: python scripts/time_breakdown.py [sf_dir] query [query ...]

For each named registry query, times three phases separately (best of 2,
caches cleared between runs, same session defaults as bench.py):

- build:   the Python call ``fn(spark, sf_dir)`` — includes any driver-side
           collects the query performs while constructing its plan (model
           fits are memoized across queries exactly as in bench.py);
- plan:    forcing ``queryExecution().executedPlan()`` — Catalyst
           analysis/optimization/physical planning of the final frame;
- execute: a noop-format sink write (guide §1.4 — materializes every
           output column, no sink cost).

The split shows whether a slow bench entry is paying per-row work
(execute), optimizer work on a huge expression tree (plan), or
driver-side jobs hidden in construction (build).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ambient_sound_analysis_api_spark.registry import queries  # noqa: E402
from ambient_sound_analysis_api_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    if not args:
        print(__doc__, file=sys.stderr)
        return 2
    spark = get_spark("time-breakdown")
    spark.range(1).count()
    try:
        spark.read.parquet(f"{sf_dir}/events.parquet").count()
    except Exception:
        pass
    qs = queries()
    print(f"# sf_dir={sf_dir}")
    print(f"{'query':42s} {'build':>7s} {'plan':>7s} {'exec':>7s} {'total':>7s}")
    for name in args:
        fn = qs[name]
        best = None
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            cur = (t1 - t0, t2 - t1, t3 - t2, t3 - t0)
            if best is None or cur[3] < best[3]:
                best = cur
        b, p, e, t = best
        print(f"{name:42s} {b:7.2f} {p:7.2f} {e:7.2f} {t:7.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
