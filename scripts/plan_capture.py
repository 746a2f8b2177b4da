"""Capture ``.explain('formatted')`` output for registry queries.

Usage: python scripts/plan_capture.py OUT_DIR [--suffix _before] [query ...]

Writes ``OUT_DIR/<query><suffix>.txt`` for each named query (default: the
bench HEADLINE + AUDIT sets). The optimization-round judge reads these files
to check plan claims (Exchange counts, join strategies, PushedFilters,
BatchEvalPython nodes) against the code, so the capture is the plan exactly
as the bench executes it: same session factory, same sf_dir resolution.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ambient_sound_analysis_api_spark.registry import queries  # noqa: E402
from ambient_sound_analysis_api_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    if not args:
        print(__doc__, file=sys.stderr)
        return 2
    out_dir = args.pop(0)
    suffix = ""
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    names = args
    if not names:
        import bench

        names = list(bench.HEADLINE) + list(bench.AUDIT)
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-capture")
    qs = queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - capture must not abort the sweep
            plan = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}\n"
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"# wrote {path} ({len(plan)} chars)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
