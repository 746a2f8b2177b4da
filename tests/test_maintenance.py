"""Small-file compaction (operators/maintenance.py): row-exact rewrites,
file-count reduction, and partition-pruned compaction that leaves healthy
partitions' files untouched."""

from __future__ import annotations

import os

from ambient_sound_analysis_api_spark.operators.maintenance import (
    compact_parquet,
    compaction_plan,
)


def _files(root):
    out = []
    for dirpath, _, names in os.walk(root):
        for n in names:
            if n.endswith(".parquet") and not n.startswith(("_", ".")):
                out.append(os.path.join(dirpath, n))
    return sorted(out)


def test_compact_unpartitioned_preserves_rows(spark, sf_dir, tmp_path):
    path = str(tmp_path / "frag")
    src = spark.read.parquet(f"{sf_dir}/customer.parquet")
    src.repartition(64).write.parquet(path)
    assert len(_files(path)) == 64
    want = sorted(map(tuple, src.collect()))

    stats = compact_parquet(spark, path)
    assert stats["files"] == 64 and stats["rewritten"] == 64
    assert stats["files_after"] == stats["target_files"] == 1  # tiny table
    assert len(_files(path)) == 1
    got = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert got == want


def test_compact_respects_target_size(spark, sf_dir, tmp_path):
    path = str(tmp_path / "sized")
    spark.read.parquet(f"{sf_dir}/customer.parquet").repartition(16).write.parquet(
        path
    )
    plan = compaction_plan(spark, path, target_file_bytes=1)
    # 1-byte target → every byte its own bin: target == ceil(bytes/1)
    assert plan["target_files"] == plan["bytes"]
    stats = compact_parquet(spark, path, target_file_bytes=10_000)
    assert stats["files_after"] == stats["target_files"] > 1
    assert len(_files(path)) == stats["files_after"]


def test_compact_already_compact_is_noop(spark, sf_dir, tmp_path):
    path = str(tmp_path / "ok")
    spark.read.parquet(f"{sf_dir}/region.parquet").coalesce(1).write.parquet(path)
    before = _files(path)
    stats = compact_parquet(spark, path)
    assert stats["rewritten"] == 0
    assert _files(path) == before  # bit-for-bit untouched


def test_compact_partitioned_rewrites_only_fragmented(spark, sf_dir, tmp_path):
    path = str(tmp_path / "part")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    # nation 0 fragmented into many files; all other nations 1 file each
    frag = cust.filter("c_nationkey = 0").repartition(8)
    rest = cust.filter("c_nationkey <> 0").repartition(1, "c_nationkey")
    frag.unionByName(rest).write.partitionBy("c_nationkey").parquet(path)
    before = {f for f in _files(path)}
    healthy_before = {f for f in before if "/c_nationkey=0/" not in f}
    # round-robin repartition may be AQE-coalesced; enough files to trigger
    assert len([f for f in before if "/c_nationkey=0/" in f]) >= 3
    want = sorted(map(tuple, spark.read.parquet(path).collect()))

    stats = compact_parquet(spark, path, partition_col="c_nationkey")
    assert stats["rewritten"] == 1  # only nation 0
    after = {f for f in _files(path)}
    assert healthy_before <= after  # healthy partitions' files untouched
    assert len([f for f in after if "/c_nationkey=0/" in f]) == 1
    got = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert got == want


def test_snapshot_diff_statuses_and_null_safety(spark):
    from ambient_sound_analysis_api_spark.operators.maintenance import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, "d")], "k int, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (5, "e")], "k int, v string"
    )
    d = {r["k"]: r["status"] for r in snapshot_diff(old, new, ["k"]).collect()}
    # NULL == NULL must read as unchanged (null-safe equality), NULL vs
    # value as changed — a concat/cast row-hash gets both wrong
    assert d == {
        1: "unchanged",
        2: "unchanged",
        3: "changed",
        4: "removed",
        5: "added",
    }


def test_snapshot_diff_marker_columns_cannot_collide(spark):
    """User columns named 'present' (or any _o_/_n_-style prefix) must not
    shadow the internal presence markers: the markers live outside the
    per-column alias pattern, and columns inside the reserved _sdiff_
    namespace are rejected up front."""
    from ambient_sound_analysis_api_spark.operators.maintenance import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, 1, "x"), (2, 0, "y")], "k int, present int, _o_v string"
    )
    new = spark.createDataFrame(
        [(1, 0, "x"), (3, 1, "z")], "k int, present int, _o_v string"
    )
    d = {r["k"]: r["status"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert d == {1: "changed", 2: "removed", 3: "added"}

    bad = spark.createDataFrame([(1, "a")], "k int, _sdiff_o_v string")
    import pytest

    with pytest.raises(ValueError, match="_sdiff_"):
        snapshot_diff(bad, bad, ["k"])


def test_snapshot_diff_respects_explicit_compare_cols(spark):
    from ambient_sound_analysis_api_spark.operators.maintenance import (
        snapshot_diff,
    )

    old = spark.createDataFrame([(1, "a", 10)], "k int, v string, w int")
    new = spark.createDataFrame([(1, "a", 99)], "k int, v string, w int")
    only_v = snapshot_diff(old, new, ["k"], compare_cols=["v"]).collect()
    assert only_v[0]["status"] == "unchanged"  # w excluded from compare
    full = snapshot_diff(old, new, ["k"]).collect()
    assert full[0]["status"] == "changed"


def test_schema_diff_statuses_widen_and_narrow(spark):
    """The four statuses + the compat verdict: int→bigint reads widened,
    bigint→int (the silent-truncation incident) reads incompatible."""
    from pyspark.sql import types as T

    from ambient_sound_analysis_api_spark.operators.maintenance import (
        schema_diff,
    )

    old = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("a", T.IntegerType()),
            T.StructField("b", T.LongType()),
            T.StructField("gone", T.StringType()),
            T.StructField("old_name", T.TimestampType()),
        ]
    )
    new = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("a", T.LongType()),      # widened
            T.StructField("b", T.IntegerType()),   # narrowed → incompatible
            T.StructField("new_name", T.TimestampType()),  # unique rename
            T.StructField("fresh", T.DoubleType()),
        ]
    )
    rows = {r.column_name: r for r in schema_diff(spark, old, new).collect()}
    assert rows["k"].status == "unchanged" and rows["k"].compat is None
    assert rows["a"].status == "type_changed" and rows["a"].compat == "widened"
    assert (
        rows["b"].status == "type_changed"
        and rows["b"].compat == "incompatible"
    )
    assert (
        rows["new_name"].status == "renamed"
        and rows["new_name"].renamed_from == "old_name"
    )
    assert "old_name" not in rows  # collapsed into the renamed row
    # 'gone' (string) is removed, 'fresh' (double) added — different
    # types, so no rename is invented between them
    assert rows["gone"].status == "removed"
    assert rows["fresh"].status == "added"


def test_schema_diff_ambiguous_rename_degrades(spark):
    """TWO same-type removed candidates for one added column: no rename
    may be guessed — all three report as plain removed/added."""
    from pyspark.sql import types as T

    from ambient_sound_analysis_api_spark.operators.maintenance import (
        schema_diff,
    )

    old = T.StructType(
        [T.StructField("x", T.StringType()), T.StructField("y", T.StringType())]
    )
    new = T.StructType([T.StructField("z", T.StringType())])
    rows = {r.column_name: r.status for r in schema_diff(spark, old, new).collect()}
    assert rows == {"x": "removed", "y": "removed", "z": "added"}


def test_schema_diff_decimal_rule_and_paths(spark, sf_dir, tmp_path):
    """Decimal widening (precision-scale and scale both grow) vs
    incompatible scale loss; the _paths form reads footers only."""
    from pyspark.sql import functions as F

    from ambient_sound_analysis_api_spark.operators.maintenance import (
        schema_diff_paths,
        type_change_compat,
    )

    assert type_change_compat("decimal(10,2)", "decimal(20,4)") == "widened"
    assert type_change_compat("decimal(10,2)", "decimal(10,1)") == "incompatible"
    assert type_change_compat("DECIMAL(10,2)", "decimal(10,2)") is None
    assert type_change_compat("string", "int") == "incompatible"

    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").limit(5)
    cust.write.parquet(pa)
    cust.select(
        "c_custkey",
        F.col("c_acctbal").cast("float").alias("c_acctbal"),
    ).write.parquet(pb)
    rows = {r.column_name: r for r in schema_diff_paths(spark, pa, pb).collect()}
    assert rows["c_custkey"].status == "unchanged"
    # double → float is a NARROW read off real parquet footers
    assert rows["c_acctbal"].status == "type_changed"
    assert rows["c_acctbal"].compat == "incompatible"
    assert rows["c_name"].status == "removed"
