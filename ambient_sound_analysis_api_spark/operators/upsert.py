"""MERGE/upsert: last-writer-wins key merge of a changes table into a base.

The reference is read-only over immutable archives, but any engine feeding
a training pipeline needs the CDC shape: corrections/late-arriving rows
replacing matching base rows, new rows appending. Without a table format
(no Delta/Iceberg in this environment) the *relational* core of MERGE INTO
is still expressible as one full-outer join with column-wise precedence —
which is exactly what those formats execute underneath.

Scale notes: the join shuffles both sides on the key — with the base
bucketed on the key (``sources/ingest.py::write_bucketed``) the base side's
shuffle disappears and only the (small) changes side moves. At 100 TB the
write-back pairs this with dynamic partition overwrite so only partitions
containing matched keys rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(base: DataFrame, changes: DataFrame, keys: list[str]) -> DataFrame:
    """Return ``base`` MERGEd with ``changes``: matched keys take the
    changes row (last writer wins), unmatched changes rows insert, unmatched
    base rows pass through.

    Both inputs must share a schema. Non-key columns resolve via
    ``coalesce(changes.col, base.col)`` with an explicit matched flag so a
    legitimately-NULL changes value still wins on matched keys.
    """
    non_keys = [c for c in base.columns if c not in keys]
    if set(base.columns) != set(changes.columns):
        raise ValueError("merge_upsert requires identical schemas")
    b = base.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__b_{c}") for c in non_keys],
        F.lit(True).alias("__in_b"),
    )
    c = changes.select(
        *[F.col(k) for k in keys],
        *[F.col(x).alias(f"__c_{x}") for x in non_keys],
        F.lit(True).alias("__in_c"),
    )
    joined = b.join(c, keys, "full_outer")
    cols = [F.col(k) for k in keys]
    matched = F.col("__in_c").isNotNull()
    for x in non_keys:
        cols.append(
            F.when(matched, F.col(f"__c_{x}")).otherwise(F.col(f"__b_{x}")).alias(x)
        )
    return joined.select(*cols)


def merge_write(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    keys: list[str],
    partition_col: str | None = None,
) -> None:
    """MERGE ``changes`` INTO the Parquet table at ``path``, crash-safely.

    The Delta/Iceberg-shaped write path on plain Parquet: the relational
    merge (``merge_upsert``) plus a rewrite that touches only what changed,
    executed via the staging-dir + atomic-rename protocol
    (``operators.atomic_swap``) — a failure at ANY point leaves the
    original table readable (the old in-place ``overwrite`` deleted the
    table before the new files landed).

    With ``partition_col`` the table is partitioned on disk and the rewrite
    is *partition-pruned*: only partitions that appear in ``changes`` are
    re-merged, staged, and swapped in one directory-rename each — at
    100 TB a merge of one day's corrections rewrites one day, not the
    table, and each partition is old-or-new complete at every instant.
    ``partition_col`` must be stable per key (part of the key, or derived
    from it): if a key's partition value changed between base and changes,
    the stale copy in the old partition would survive — the same contract
    Hive-style dynamic-overwrite MERGEs have.

    Without ``partition_col`` the whole table rewrites (unavoidable on a
    format without file-level deletes), still old-or-new atomically.

    Because the staged write targets a *different* path than the scan,
    Spark's read/overwrite-same-path refusal never triggers and no
    ``localCheckpoint`` pin (extra materialization) is needed.
    """
    from . import atomic_swap as aswap

    base = spark.read.parquet(path)
    if set(base.columns) != set(changes.columns):
        raise ValueError("merge_write requires identical schemas")
    staging = aswap.staging_path(path)
    try:
        if partition_col is None:
            merged = merge_upsert(base, changes, keys)
            merged.write.parquet(staging)
            aswap.swap_in(spark, staging, path)
            return
        touched = [
            r[0] for r in changes.select(partition_col).distinct().collect()
        ]
        # NULL partition values need an explicit isNull branch: isin() never
        # matches NULL (three-valued logic), so without it the base's NULL
        # partition would be EXCLUDED from the re-merge while the staged
        # NULL-partition dir still swaps in — silently deleting base rows.
        non_null = [v for v in touched if v is not None]
        cond = (
            F.col(partition_col).isin(non_null) if non_null else F.lit(False)
        )
        if any(v is None for v in touched):
            cond = cond | F.col(partition_col).isNull()
        sub = base.filter(cond)
        # keep the partition column last, matching partitioned-write layout
        merged = merge_upsert(sub, changes, keys)
        merged.write.partitionBy(partition_col).parquet(staging)
        _swap_partitions(spark, staging, path, partition_col)
    finally:
        aswap.cleanup_staging(spark, staging)


def _swap_partitions(
    spark: SparkSession, staging: str, path: str, partition_col: str
) -> None:
    """Swap every ``partition_col=...`` dir written under ``staging`` into
    ``path``, one atomic rename per partition (new partitions just move)."""
    from . import atomic_swap as aswap

    fs, sroot = aswap._fs_and_path(spark, staging)
    prefix = f"{partition_col}="
    for st in fs.listStatus(sroot):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith(prefix)):
            continue
        aswap.swap_in(spark, str(st.getPath().toString()), f"{path}/{name}")
