"""Versioned swaps: plain-parquet time travel and atomic rollback."""

from __future__ import annotations

import pytest

from ambient_sound_analysis_api_spark.operators.atomic_swap import (
    read_version,
    rollback,
    staging_path,
    versioned_swap_in,
)


def _write_version(spark, tmp_path, path, values):
    df = spark.createDataFrame([(v,) for v in values], "x long")
    staging = staging_path(path)
    df.coalesce(1).write.parquet(staging)
    versioned_swap_in(spark, staging, path, keep=2)


def _vals(spark, path):
    return sorted(r.x for r in spark.read.parquet(path).collect())


def test_versions_retained_and_pruned(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _write_version(spark, tmp_path, path, [1])
    _write_version(spark, tmp_path, path, [2, 2])
    _write_version(spark, tmp_path, path, [3, 3, 3])
    _write_version(spark, tmp_path, path, [4] * 4)
    assert _vals(spark, path) == [4, 4, 4, 4]
    # keep=2: one step back is v3, two steps back is v2, v1 pruned
    assert sorted(r.x for r in read_version(spark, path, 1).collect()) == [3, 3, 3]
    assert sorted(r.x for r in read_version(spark, path, 2).collect()) == [2, 2]
    with pytest.raises(ValueError):
        read_version(spark, path, 3)


def test_rollback_restores_and_is_undoable(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _write_version(spark, tmp_path, path, [1])
    _write_version(spark, tmp_path, path, [2])
    assert _vals(spark, path) == [2]
    rollback(spark, path)
    assert _vals(spark, path) == [1]
    # the rolled-back-from table is itself retained → rollback is undoable
    rollback(spark, path)
    assert _vals(spark, path) == [2]


def test_rollback_without_versions_raises(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _write_version(spark, tmp_path, path, [1])  # first write: no versions yet
    with pytest.raises(ValueError):
        rollback(spark, path)


def test_versioned_swap_rejects_keep_zero(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1,)], "x long")
    staging = staging_path(path)
    df.write.parquet(staging)
    with pytest.raises(ValueError, match="keep must be >= 1"):
        versioned_swap_in(spark, staging, path, keep=0)
