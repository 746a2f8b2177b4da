"""Tests for the pluggable archive-key listing boundary (sources/listing.py).

A fake three-page pager and a fake boto3-shaped client prove the production
S1 edge (paginated listing → keys DF → catalog) without any SDK: the same
``PaginatedKeyLister`` wired into ``Engine(key_lister=...)`` must serve
requests identically to the staged-parquet default.
"""

from __future__ import annotations

import pytest

from ambient_sound_analysis_api_spark.sources.catalog import build_catalog
from ambient_sound_analysis_api_spark.sources.listing import (
    PaginatedKeyLister,
    ParquetKeyLister,
    s3_pager,
)

KEYS = [
    "archive/click/20240101T000000_20240201T000000_1s_broadband.parquet",
    "archive/click/20240201T000000_20240301T000000_1s_broadband.parquet",
    "archive/view/20240101T000000_20240201T000000_1s_3oct.parquet",
    "archive/view/bush.parquet",  # malformed — parser must drop it
]


def _three_page_pager(calls):
    pages = [KEYS[:2], KEYS[2:3], KEYS[3:]]

    def pager(prefix, token):
        calls.append((prefix, token))
        i = 0 if token is None else int(token)
        next_token = str(i + 1) if i + 1 < len(pages) else None
        return pages[i], next_token

    return pager


def test_paginated_lister_exhausts_pages_and_builds_catalog(spark):
    calls = []
    lister = PaginatedKeyLister(_three_page_pager(calls), prefixes=["archive/"])
    keys_df = lister.list_keys(spark)
    assert [r["key"] for r in keys_df.collect()] == KEYS
    # pagination: token threaded page to page, None terminates
    assert calls == [("archive/", None), ("archive/", "1"), ("archive/", "2")]
    cat = build_catalog(keys_df).collect()
    assert {(r["hydrophone"], r["freq_type"]) for r in cat} == {
        ("CLICK", "broadband"), ("VIEW", "octave_bands"),
    }
    assert all(r["file_count"] >= 1 for r in cat)  # malformed key dropped


def test_runaway_pager_fails_loudly(spark):
    lister = PaginatedKeyLister(
        lambda prefix, token: ([], "again"), max_pages=5
    )
    with pytest.raises(RuntimeError, match="exceeded 5 pages"):
        lister.list_keys(spark)


def test_s3_pager_adapts_boto3_shape(spark):
    class FakeClient:
        def __init__(self):
            self.requests = []

        def list_objects_v2(self, **kwargs):
            self.requests.append(kwargs)
            if "ContinuationToken" not in kwargs:
                return {
                    "Contents": [{"Key": k} for k in KEYS[:2]],
                    "IsTruncated": True,
                    "NextContinuationToken": "t2",
                }
            return {"Contents": [{"Key": k} for k in KEYS[2:]],
                    "IsTruncated": False}

    client = FakeClient()
    lister = PaginatedKeyLister(
        s3_pager(client, "noise-archive"), prefixes=["archive/"]
    )
    assert [r["key"] for r in lister.list_keys(spark).collect()] == KEYS
    assert client.requests[0] == {"Bucket": "noise-archive",
                                  "Prefix": "archive/"}
    assert client.requests[1]["ContinuationToken"] == "t2"


def test_engine_accepts_injected_lister(spark, sf_dir, tmp_path):
    """Engine(key_lister=PaginatedKeyLister(...)) serves identically to the
    staged-parquet default — the production wiring is one argument."""
    from ambient_sound_analysis_api_spark.serving import Engine
    from ambient_sound_analysis_api_spark.sources.domain import (
        materialize_domain,
    )

    root = str(tmp_path / "root")
    materialize_domain(spark, sf_dir, root)
    staged = [
        r["key"]
        for r in ParquetKeyLister(f"{root}/archive_keys.parquet")
        .list_keys(spark)
        .collect()
    ]

    def one_page(prefix, token):
        return staged, None

    e_default = Engine(spark, root)
    e_injected = Engine(spark, root, key_lister=PaginatedKeyLister(one_page))
    assert e_injected.options() == e_default.options()


def test_paginated_lister_chunked_flush_matches_unchunked(spark):
    """chunk_size smaller than the listing: the buffer flushes mid-
    pagination and the union of chunks must equal the one-shot listing."""
    from ambient_sound_analysis_api_spark.sources.listing import (
        PaginatedKeyLister,
    )

    def pager(prefix, token):
        i = int(token) if token else 0
        keys = [f"archive/h/{i:03d}_{j:03d}.parquet" for j in range(10)]
        return keys, (str(i + 1) if i + 1 < 7 else None)

    small = PaginatedKeyLister(pager, chunk_size=25)
    big = PaginatedKeyLister(pager, chunk_size=10_000)
    a = sorted(r["key"] for r in small.list_keys(spark).collect())
    b = sorted(r["key"] for r in big.list_keys(spark).collect())
    assert a == b and len(a) == 70


def test_paginated_lister_stage_dir_streams_to_parquet(spark, tmp_path):
    """stage_dir: chunks land as parquet files (constant driver footprint)
    and read back as one scan with the same keys."""
    import os

    from ambient_sound_analysis_api_spark.sources.listing import (
        PaginatedKeyLister,
    )

    def pager(prefix, token):
        i = int(token) if token else 0
        keys = [f"archive/h/{i:03d}_{j:03d}.parquet" for j in range(10)]
        return keys, (str(i + 1) if i + 1 < 7 else None)

    stage = str(tmp_path / "stage")
    lister = PaginatedKeyLister(pager, chunk_size=25, stage_dir=stage)
    got = sorted(r["key"] for r in lister.list_keys(spark).collect())
    assert len(got) == 70 and got[0].startswith("archive/h/")
    chunk_files = [f for f in os.listdir(stage) if f.endswith(".parquet")]
    assert len(chunk_files) == 3  # 25+25+20


def test_parse_archive_keys_malformed_skip_is_unconditional(spark):
    """Malformed keys must be SKIPPED regardless of plan shape: under ANSI
    a plain cast of the empty regexp group throws when the optimizer
    eagerly evaluates a LocalRelation projection (Arrow-built listings) —
    the try_cast form must survive both plan shapes."""
    import pandas as pd

    from ambient_sound_analysis_api_spark.sources.catalog import (
        parse_archive_keys,
    )

    keys = [
        "archive/click/bush.parquet",      # malformed -> skipped
        "archive/click/readme.txt",        # non-parquet -> skipped
        "archive/click/20240101T000000_20240201T000000_1s_broadband.parquet",
    ]
    # Arrow/LocalRelation shape (optimizer-eager evaluation)
    local = spark.createDataFrame(pd.DataFrame({"key": keys}))
    rows = parse_archive_keys(local).collect()
    assert [r["delta_t"] for r in rows] == [1]
    # RDD-backed shape (runtime evaluation)
    rdd_df = spark.createDataFrame([(k,) for k in keys], "key string")
    rows2 = parse_archive_keys(rdd_df).collect()
    assert [r["key"] for r in rows2] == [r["key"] for r in rows]


def test_paginated_lister_stage_dir_cleans_stale_chunks(spark, tmp_path):
    """Chunk files left by a previous (interrupted or larger) run must not
    re-enter the listing: a later, smaller run only overwrites the chunk
    indexes it reaches, so without the startup cleanup the stale
    higher-index chunks would contribute duplicate/phantom keys."""
    from ambient_sound_analysis_api_spark.sources.listing import (
        PaginatedKeyLister,
    )

    def big_pager(prefix, token):
        i = int(token) if token else 0
        keys = [f"archive/h/{i:03d}_{j:03d}.parquet" for j in range(10)]
        return keys, (str(i + 1) if i + 1 < 7 else None)

    def small_pager(prefix, token):
        return [f"archive/s/{j:03d}.parquet" for j in range(5)], None

    stage = str(tmp_path / "stage")
    PaginatedKeyLister(big_pager, chunk_size=25, stage_dir=stage).list_keys(
        spark
    ).count()  # leaves 3 chunk files behind
    got = sorted(
        r["key"]
        for r in PaginatedKeyLister(
            small_pager, chunk_size=25, stage_dir=stage
        ).list_keys(spark).collect()
    )
    assert len(got) == 5 and all(k.startswith("archive/s/") for k in got)


def test_sharded_lister_matches_driver_lister(spark):
    """Executor-side sharded walking must produce exactly the key set the
    driver-side lister produces over the same prefixes, and the plan must
    be the Arrow mapInPandas fan-out (one task per shard), not a
    driver-built local relation."""
    from ambient_sound_analysis_api_spark.sources.listing import (
        PaginatedKeyLister,
        ShardedKeyLister,
    )

    def factory():
        def pager(prefix, token):
            i = int(token) if token else 0
            keys = [f"{prefix}{i:02d}_{j}.parquet" for j in range(5)]
            return keys, (str(i + 1) if i + 1 < 3 else None)

        return pager

    prefixes = [f"archive/h{i:02d}/" for i in range(8)]
    sharded = ShardedKeyLister(factory, prefixes=prefixes)
    driver = PaginatedKeyLister(factory(), prefixes=prefixes)
    a = sorted(r["key"] for r in sharded.list_keys(spark).collect())
    b = sorted(r["key"] for r in driver.list_keys(spark).collect())
    assert a == b and len(a) == 8 * 3 * 5
    # the listing itself runs executor-side
    plan = sharded.list_keys(spark)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_sharded_lister_runaway_pager_fails_loudly(spark):
    from ambient_sound_analysis_api_spark.sources.listing import (
        ShardedKeyLister,
    )

    def factory():
        return lambda prefix, token: (["k"], "again")

    lister = ShardedKeyLister(factory, prefixes=["a/"], max_pages=4)
    import pytest as _pytest

    with _pytest.raises(Exception, match="exceeded 4 pages"):
        lister.list_keys(spark).count()


def test_sharded_lister_feeds_catalog(spark):
    from ambient_sound_analysis_api_spark.sources.listing import (
        ShardedKeyLister,
    )

    def factory():
        def pager(prefix, token):
            hydro = prefix.split("/")[1]
            return [
                f"archive/{hydro}/20240101T000000_20240201T000000_1s_broadband.parquet"
            ], None

        return pager

    lister = ShardedKeyLister(
        factory, prefixes=["archive/click/", "archive/view/"]
    )
    cat = build_catalog(lister.list_keys(spark)).collect()
    assert {r["hydrophone"] for r in cat} == {"CLICK", "VIEW"}


def test_auto_lister_selection_rules(spark, tmp_path):
    """auto_lister picks the widest lister the namespace supports:
    factory+prefixes → executor-sharded; factory alone or plain pager →
    driver pagination; path → staged parquet. Exactly one source."""
    import pytest as _pytest

    from ambient_sound_analysis_api_spark.sources.listing import (
        PaginatedKeyLister,
        ParquetKeyLister,
        ShardedKeyLister,
        auto_lister,
    )

    def factory():
        return lambda prefix, token: ([f"{prefix}x.parquet"], None)

    assert isinstance(
        auto_lister(pager_factory=factory, prefixes=["a/", "b/"]),
        ShardedKeyLister,
    )
    assert isinstance(
        auto_lister(pager_factory=factory), PaginatedKeyLister
    )
    assert isinstance(
        auto_lister(pager=factory(), prefixes=["a/"]), PaginatedKeyLister
    )
    assert isinstance(auto_lister(path="/x/keys.parquet"), ParquetKeyLister)
    with _pytest.raises(ValueError, match="exactly one"):
        auto_lister()
    with _pytest.raises(ValueError, match="exactly one"):
        auto_lister(path="/x", pager=factory())
    # driver-staging knobs on the executor-sharded path raise instead of
    # silently doing nothing (ADVICE round-10)
    with _pytest.raises(ValueError, match="driver staging"):
        auto_lister(
            pager_factory=factory, prefixes=["a/"], chunk_size=1000
        )
    with _pytest.raises(ValueError, match="driver staging"):
        auto_lister(
            pager_factory=factory, prefixes=["a/"], stage_dir="/tmp/x"
        )
    # ...but they still apply on the driver-paginated paths
    assert isinstance(
        auto_lister(pager=factory(), chunk_size=1000), PaginatedKeyLister
    )


def test_engine_through_auto_selected_sharded_lister(spark, sf_dir, tmp_path):
    """The catalog/serving path rides the executor-sharded lister when
    the namespace exposes prefixes: Engine(key_lister=auto_lister(
    pager_factory=..., prefixes=...)) serves identically to the staged
    default — the round-9 infra win on the default path, not parked."""
    from ambient_sound_analysis_api_spark.serving import Engine
    from ambient_sound_analysis_api_spark.sources.domain import (
        materialize_domain,
    )
    from ambient_sound_analysis_api_spark.sources.listing import (
        ShardedKeyLister,
        auto_lister,
    )

    root = str(tmp_path / "root")
    materialize_domain(spark, sf_dir, root)
    staged = [
        r["key"]
        for r in ParquetKeyLister(f"{root}/archive_keys.parquet")
        .list_keys(spark)
        .collect()
    ]
    hydros = sorted({k.split("/")[1] for k in staged})
    assert len(hydros) >= 2  # the namespace is genuinely prefix-sharded
    by_prefix = {
        f"archive/{h}/": [k for k in staged if k.startswith(f"archive/{h}/")]
        for h in hydros
    }

    def factory():
        def pager(prefix, token):
            return by_prefix.get(prefix, []), None

        return pager

    lister = auto_lister(
        pager_factory=factory, prefixes=sorted(by_prefix)
    )
    assert isinstance(lister, ShardedKeyLister)
    e_default = Engine(spark, root)
    e_sharded = Engine(spark, root, key_lister=lister)
    assert e_sharded.options() == e_default.options()
