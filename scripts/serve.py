"""Launch the HTTP API over a materialized domain root.

Usage:
    python scripts/serve.py [sf_dir] [--root DIR] [--port N]

Materializes the partitioned domain from the given testdata sf_dir (default
/root/testdata/sf0.01) if the root doesn't exist yet, then serves the
reference-parity API (see ambient_sound_analysis_api_spark.http_api).
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ambient_sound_analysis_api_spark.http_api import TimingLog, serve  # noqa: E402
from ambient_sound_analysis_api_spark.serving import Engine  # noqa: E402
from ambient_sound_analysis_api_spark.session import get_spark  # noqa: E402
from ambient_sound_analysis_api_spark.sources.domain import (  # noqa: E402
    materialize_domain,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--root", default="/tmp/ambient_domain")
    ap.add_argument("--port", type=int, default=8008)
    args = ap.parse_args()

    spark = get_spark("ambient-sound-api")
    if not os.path.exists(f"{args.root}/data"):
        print(f"materializing domain from {args.sf_dir} -> {args.root}")
        materialize_domain(spark, args.sf_dir, args.root)
    httpd = serve(
        Engine(spark, args.root),
        port=args.port,
        timing=TimingLog(os.path.join(REPO, "logs", "api-timing.log")),
    )
    print(f"serving on http://127.0.0.1:{httpd.server_port}  (Ctrl-C to stop)")
    try:
        import time

        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        httpd.shutdown()


if __name__ == "__main__":
    main()
