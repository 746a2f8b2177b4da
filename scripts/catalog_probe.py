"""Catalog-at-scale probe: drive ``PaginatedKeyLister`` over ~1M synthetic
archive keys and show the catalog build is time- and driver-memory-bounded.

The driver-side listing loop is the engine's one unavoidable O(n_keys)
driver step (mirroring the reference's boto3 pagination); this probe pins
its cost envelope at 1000x the realistic archive size (the reference's
real archive is thousands of keys). Two modes:

  - in-plan chunks (default): pages flush every ``chunk_size`` keys into
    Arrow-batched local relations unioned into one plan;
  - ``--stage``: chunks stream to parquet and read back as one splittable
    scan — constant driver footprint, the inventory-manifest shape.

Usage: python scripts/catalog_probe.py [n_keys] [--stage]
Prints RES lines for NOTES.md.
"""

from __future__ import annotations

import os
import resource
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ambient_sound_analysis_api_spark.session import get_spark  # noqa: E402
from ambient_sound_analysis_api_spark.sources.catalog import (  # noqa: E402
    build_catalog,
)
from ambient_sound_analysis_api_spark.sources.listing import (  # noqa: E402
    PaginatedKeyLister,
)


def rss_mb() -> int:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--stage"]
    stage = "--stage" in sys.argv[1:]
    n_keys = int(args[0]) if args else 1_000_000
    page_size = 1000
    n_pages = n_keys // page_size

    spark = get_spark("catalog-probe")

    # reference-grammar keys: archive/{hydro}/{start}_{end}_{dt}s_{suffix}.parquet
    def pager(prefix: str, token: "str | None"):
        i = int(token) if token else 0
        base = i * page_size
        keys = []
        for j in range(page_size):
            k = base + j
            hydro = f"hydro{k % 50:02d}"
            month = (k % 12) + 1
            dt = (k % 4) + 1
            suffix = ("broadband", "3oct", "50hz")[k % 3]
            keys.append(
                f"archive/{hydro}/2024{month:02d}01T000000_"
                f"2024{month:02d}28T000000_{dt}s_{suffix}.parquet"
            )
        return keys, (str(i + 1) if i + 1 < n_pages else None)

    print(f"RES mode: {'staged-parquet' if stage else 'in-plan-chunks'}")
    print("RES rss_before_mb:", rss_mb())
    stage_dir = tempfile.mkdtemp(prefix="catprobe_") if stage else None
    lister = PaginatedKeyLister(
        pager, max_pages=n_pages + 1, chunk_size=250_000, stage_dir=stage_dir
    )
    t0 = time.time()
    keys_df = lister.list_keys(spark)
    t1 = time.time()
    print(f"RES list_{n_keys}_keys_s:", round(t1 - t0, 2))
    print("RES rss_after_listing_mb:", rss_mb())
    cat = build_catalog(keys_df)
    rows = cat.count()
    t2 = time.time()
    print("RES build_catalog_s:", round(t2 - t1, 2), "catalog_rows:", rows)
    print("RES total_s:", round(t2 - t0, 2))
    print("RES rss_peak_mb:", rss_mb())
    assert rows > 0
    return 0


if __name__ == "__main__":
    sys.exit(main())
