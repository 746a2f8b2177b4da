"""Boilerplate-quadratic probe for the default-on hot-shingle cap.

Adversarial corpus: every document gets a shared 12-token footer (the
header/footer/template case that dominates real crawls), and the K×
variant replicates docs with UNIQUE body prefixes — so the only cross-doc
shingle mass is the boilerplate itself. Candidate volume through a shingle
of document frequency df is O(df²): footer df equals the corpus size, so
the uncapped join is quadratic in corpus size while the capped form
(``DEFAULT_MAX_SHINGLE_DF``, ON by default since round 8) drops footer
shingles from candidates and set sizes alike and stays ~linear.

Usage: python scripts/boilerplate_probe.py [K]
Prints RES lines (capped 1x / Kx, uncapped 1x) for NOTES.md.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from ambient_sound_analysis_api_spark.operators import dedup  # noqa: E402
from ambient_sound_analysis_api_spark.operators.caching import (  # noqa: E402
    release_caches,
)
from ambient_sound_analysis_api_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FOOTER = (
    "subscribe to our newsletter for updates terms of service privacy policy"
)


def corpus(spark, k: int):
    """5000*k docs, each a fully unique 50-token body + the shared footer:
    the ONLY cross-doc shingle mass is the boilerplate (replicating real
    docs would leave the 10 copies of each body as true near-dups and
    drown the boilerplate signal in genuinely quadratic OUTPUT)."""
    n = 5000 * k
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(50)),
            lambda i: F.concat(
                F.lit("w"),
                F.col("doc_id").cast("string"),
                F.lit("x"),
                i.cast("string"),
            ),
        ),
    )
    out = (
        spark.range(n)
        .withColumnRenamed("id", "doc_id")
        .repartition(32)
        .select(
            "doc_id",
            F.concat(body, F.lit(" " + FOOTER)).alias("text"),
        )
    )
    return out.localCheckpoint()  # materialize so timing excludes the build


def timed(label, fn):
    t0 = time.time()
    n = fn()
    dt = time.time() - t0
    print(f"RES {label}: {dt:.1f}s ({n} pairs)")
    return dt


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("boilerplate-probe")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    c1 = corpus(spark, 1)
    ck = corpus(spark, k)
    print(f"RES corpus_sizes: 1x={c1.count()} {k}x={ck.count()}")
    print(f"RES default_cap: {dedup.DEFAULT_MAX_SHINGLE_DF} "
          f"(footer df = corpus size, so the cap binds at both scales)")

    t1 = timed(
        "capped_default_1x",
        lambda: dedup.ngram_jaccard_pairs(c1, n=3, threshold=0.2).count(),
    )
    release_caches()
    tk = timed(
        f"capped_default_{k}x",
        lambda: dedup.ngram_jaccard_pairs(ck, n=3, threshold=0.2).count(),
    )
    release_caches()
    print(f"RES capped_scaling_ratio: {tk / t1:.1f}x wall for {k}x rows")

    # uncapped at 1x/2x/4x: the wall-time exponent should approach 2
    # (footer candidates are 9 * C(n,2)); the capped Kx run above stays flat
    prev = None
    for kk in (1, 2, 4):
        ckk = corpus(spark, kk)
        t = timed(
            f"uncapped_{kk}x",
            lambda: dedup.ngram_jaccard_pairs(
                ckk, n=3, threshold=0.2, max_shingle_df=None
            ).count(),
        )
        if prev is not None:
            print(f"RES uncapped_doubling_ratio_{kk}x: {t / prev:.1f}x "
                  f"(quadratic predicts 4x)")
        prev = t
        release_caches()
    print(f"RES summary: capped {k}x = {tk:.1f}s vs uncapped quadratic "
          f"trend (a {k}x uncapped run projects to ~{prev * (k / 4) ** 2:.0f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
