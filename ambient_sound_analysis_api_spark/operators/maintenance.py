"""Table-maintenance operators: small-file compaction for plain Parquet.

Long-running ingestion (streaming sinks, frequent MERGEs, per-hour jobs)
fragments a table into thousands of KB-sized files; at 100 TB the scan cost
becomes dominated by file-open overhead and the driver's file-listing blows
up long before the data does. Delta/Iceberg ship OPTIMIZE/rewrite_data_files
for this; on plain Parquet the same bin-packing rewrite is a
read → repartition → dynamic-overwrite cycle, which this module provides.

Sizing uses the Hadoop ``FileSystem`` API (works unchanged on HDFS/S3A/GCS,
not just ``file:``), and the rewrite is crash-safe: it stages to a sibling
directory and atomically renames into place (``operators.atomic_swap``) —
a failure at any point leaves the original table readable, and staging to
a different path also sidesteps Spark's read/overwrite-same-path refusal
without a ``localCheckpoint`` materialization.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def _list_parquet_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every data file under ``path``, via the JVM Hadoop
    FileSystem — portable across local/HDFS/object-store URIs."""
    jvm = spark._jvm
    jsc = spark._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    out: list[tuple[str, int]] = []
    it = fs.listFiles(hpath, True)  # recursive
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        name = st.getPath().getName()
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            out.append((p, int(st.getLen())))
    return out


def compaction_plan(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> dict:
    """Inspect a Parquet table and report what a compaction would do:
    ``{"files": n, "bytes": b, "target_files": t}`` — ``target_files`` is
    the bin-packed file count ``ceil(bytes / target_file_bytes)``."""
    files = _list_parquet_files(spark, path)
    total = sum(b for _, b in files)
    return {
        "files": len(files),
        "bytes": total,
        "target_files": max(1, math.ceil(total / target_file_bytes)),
    }


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    partition_col: str | None = None,
    min_files_to_compact: int = 2,
) -> dict:
    """Bin-pack the Parquet table at ``path`` into ~``target_file_bytes``
    files, in place. Returns the before/after stats dict.

    - **Unpartitioned**: one round-robin ``repartition(target_files)`` of
      the whole table — even output sizes regardless of input skew.
    - **Partitioned** (``partition_col``): only partitions holding more
      than ``min_files_to_compact`` files are rewritten, via dynamic
      partition overwrite — untouched partitions keep their original files
      (at 100 TB you compact yesterday's hot partition, not the table).
      Each rewritten partition is clustered to one task → one output file;
      a partition larger than ``target_file_bytes`` stays a single file
      per rewrite (split-table parquet keeps it scan-parallel), which is
      the standard OPTIMIZE trade-off on formats without file-level
      manifests.

    No-op (returns stats with ``"rewritten": 0``) when the table is already
    compact. Row content is preserved exactly; only file layout changes.
    """
    from . import atomic_swap as aswap

    before = compaction_plan(spark, path, target_file_bytes)
    df = spark.read.parquet(path)
    if partition_col is None:
        if before["files"] <= max(before["target_files"], min_files_to_compact - 1):
            return {**before, "rewritten": 0}
        staging = aswap.staging_path(path)
        try:
            df.repartition(before["target_files"]).write.parquet(staging)
            aswap.swap_in(spark, staging, path)
        finally:
            aswap.cleanup_staging(spark, staging)
        after = compaction_plan(spark, path, target_file_bytes)
        return {**before, "rewritten": before["files"], "files_after": after["files"]}

    # partitioned: find partitions with too many files from the file listing.
    # Directory values are Hive-escaped (%XX for special chars, the
    # __HIVE_DEFAULT_PARTITION__ sentinel for NULL) — decode them back to
    # column values for the filter; the swap below reuses the escaped dir
    # names verbatim, so escaped and NULL partitions compact like any other.
    files = _list_parquet_files(spark, path)
    by_part: dict[str, int] = {}
    marker = f"/{partition_col}="
    for p, _ in files:
        if marker not in p:
            raise ValueError(f"{p} is not partitioned by {partition_col}")
        val = p.split(marker, 1)[1].split("/", 1)[0]
        by_part[val] = by_part.get(val, 0) + 1
    touched = sorted(v for v, n in by_part.items() if n > min_files_to_compact)
    if not touched:
        return {**before, "rewritten": 0}
    values = [aswap.unescape_partition_value(v) for v in touched]
    cond = F.col(partition_col).cast("string").isin(
        [v for v in values if v is not None]
    )
    if any(v is None for v in values):
        cond = cond | F.col(partition_col).isNull()
    sub = df.filter(cond)
    staging = aswap.staging_path(path)
    swapped = 0
    try:
        # one shuffle partition per table partition → one output file each
        (
            sub.repartition(len(touched), F.col(partition_col))
            .write.partitionBy(partition_col)
            .parquet(staging)
        )
        # Swap only the partition dirs the staged write actually produced
        # (never blind-rename from the `touched` list): if the decoded dir
        # value didn't round-trip through the column filter — e.g. the
        # partition column's inferred type renders values differently than
        # the dir names an external writer used — the staged dir is simply
        # absent and that partition degrades to an untouched no-op, instead
        # of a live partition being renamed aside for a missing source.
        fs, sroot = aswap._fs_and_path(spark, staging)
        prefix = f"{partition_col}="
        for st in fs.listStatus(sroot):
            name = st.getPath().getName()
            if not (st.isDirectory() and name.startswith(prefix)):
                continue
            aswap.swap_in(
                spark, str(st.getPath().toString()), f"{path}/{name}"
            )
            swapped += 1
    finally:
        aswap.cleanup_staging(spark, staging)
    after = compaction_plan(spark, path, target_file_bytes)
    return {
        **before,
        "rewritten": swapped,
        "files_after": after["files"],
    }


#: Safe type widenings (old → new reads every old value losslessly under
#: standard SQL numeric precedence; Parquet/Spark schema evolution accepts
#: exactly these directions). Everything else that changes a type is
#: ``incompatible`` — including the REVERSE of each row (a narrow), which
#: silently truncates/overflows and is the first production incident a
#: 100 TB ingest with ``mergeSchema`` hides.
SAFE_WIDENINGS: set[tuple[str, str]] = {
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("smallint", "int"), ("smallint", "bigint"),
    ("int", "bigint"),
    ("float", "double"),
    ("date", "timestamp"),
}


def _canon_type(t: str) -> str:
    """Normalize a type name to the repo's canonical (Spark
    ``simpleString``) spelling — lets DuckDB ``DESCRIBE`` output compare
    equal (``VARCHAR``→``string``, ``INTEGER``→``int``)."""
    t = t.lower()
    return {"varchar": "string", "integer": "int"}.get(t, t)


def type_change_compat(old_type: str, new_type: str) -> str | None:
    """``widened`` / ``incompatible`` verdict for a type change (``None``
    when the types are equal). Decimals widen when both the integer part
    (precision − scale) and the scale grow or stay equal."""
    o, n = _canon_type(old_type), _canon_type(new_type)
    if o == n:
        return None
    if (o, n) in SAFE_WIDENINGS:
        return "widened"
    if o.startswith("decimal(") and n.startswith("decimal("):
        po, so = map(int, o[8:-1].split(","))
        pn, sn = map(int, n[8:-1].split(","))
        if pn - sn >= po - so and sn >= so:
            return "widened"
    return "incompatible"


def schema_diff(spark: SparkSession, old_schema, new_schema) -> DataFrame:
    """Column-level schema-evolution audit between two snapshots:
    one row per column in either schema with ``status`` ∈ ``unchanged`` /
    ``type_changed`` / ``added`` / ``removed`` / ``renamed``, the
    normalized old/new type names, and for type changes a ``compat``
    verdict (``widened`` vs ``incompatible`` per :data:`SAFE_WIDENINGS` +
    the decimal rule). ``snapshot_diff`` answers "which ROWS changed";
    this answers the question a 100 TB ingest incident starts with —
    "which COLUMNS changed, and did the change silently narrow a type"
    (``mergeSchema`` absorbs drift rather than reporting it).

    Renames are inferred CONSERVATIVELY: a removed and an added column
    pair into one ``renamed`` row (``renamed_from`` carries the old name)
    only when they are each the UNIQUE removed/added column of their
    type — any ambiguity degrades to plain ``added`` + ``removed`` rows
    rather than guessing (unit-pinned).

    Schemas are footer metadata (``spark.read.parquet(path).schema`` is a
    footer-only read — see :func:`schema_diff_paths`), so the comparison
    is legitimately driver-side: the output is bounded by column count,
    never data size.
    """
    oldm = {f.name: _canon_type(f.dataType.simpleString()) for f in old_schema}
    newm = {f.name: _canon_type(f.dataType.simpleString()) for f in new_schema}
    removed = {c: t for c, t in oldm.items() if c not in newm}
    added = {c: t for c, t in newm.items() if c not in oldm}

    def _unique_by_type(d: dict) -> dict:
        counts: dict[str, int] = {}
        for t in d.values():
            counts[t] = counts.get(t, 0) + 1
        return {t: c for c, t in d.items() if counts[t] == 1}

    rem1 = _unique_by_type(removed)
    add1 = _unique_by_type(added)
    renames = {
        add1[t]: rem1[t] for t in set(rem1) & set(add1)
    }  # new_name -> old_name

    rows = []
    for c, ot in oldm.items():
        if c in newm:
            nt = newm[c]
            if ot == nt:
                rows.append((c, "unchanged", ot, nt, None, None))
            else:
                rows.append(
                    (c, "type_changed", ot, nt, None,
                     type_change_compat(ot, nt))
                )
        elif c not in set(renames.values()):
            rows.append((c, "removed", ot, None, None, None))
    for c, nt in added.items():
        if c in renames:
            rows.append((c, "renamed", oldm[renames[c]], nt, renames[c], None))
        else:
            rows.append((c, "added", None, nt, None, None))
    return spark.createDataFrame(
        rows,
        "column_name string, status string, old_type string, "
        "new_type string, renamed_from string, compat string",
    )


def schema_diff_paths(spark: SparkSession, old_path: str, new_path: str) -> DataFrame:
    """:func:`schema_diff` over two Parquet locations — the
    footer-driven form (``spark.read.parquet`` resolves the merged footer
    schema without scanning data)."""
    return schema_diff(
        spark,
        spark.read.parquet(old_path).schema,
        spark.read.parquet(new_path).schema,
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff between two versions of a keyed table: one row per
    key present in either snapshot, with ``status`` ∈ ``added`` /
    ``removed`` / ``changed`` / ``unchanged`` — the audit a data-versioned
    warehouse publishes with every snapshot (Delta/Iceberg expose it as
    CDF/changelog scans; on plain Parquet it is one FULL OUTER join on the
    key).

    ``compare_cols`` defaults to every non-key column the two frames
    share. Change detection is COLUMN-WISE null-safe equality (Spark
    ``<=>`` / SQL ``IS NOT DISTINCT FROM``) — never a concatenated-string
    or cast-to-string hash, whose float formatting differs across engines
    and whose separator can collide with data. Scale: a single shuffle on
    the key for both sides; no collects; output is bounded by
    |old ∪ new| keys.

    Internal side-prefixed aliases use a deliberately unlikely namespace
    (``_sdiff_*``: per-column ``_sdiff_o_<col>``/``_sdiff_n_<col>`` plus
    the ``_sdiff_om``/``_sdiff_nm`` presence markers, which sit OUTSIDE
    the per-column pattern so no column name can alias onto them); a key
    or compare column that starts with ``_sdiff_`` raises ``ValueError``
    up front instead of mis-classifying rows — rename it before diffing.
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    # presence markers: a dedicated non-null column per side, so NULL
    # values in data columns cannot be misread as absence. Marker/alias
    # collisions with user columns are rejected, not silently shadowed.
    for c in list(keys) + list(compare_cols):
        if c.startswith("_sdiff_"):
            raise ValueError(
                f"snapshot_diff: column {c!r} collides with the internal "
                "_sdiff_ alias namespace; rename it first"
            )
    o = old.select(
        *keys,
        *[F.col(c).alias(f"_sdiff_o_{c}") for c in compare_cols],
        F.lit(1).alias("_sdiff_om"),
    )
    n = new.select(
        *keys,
        *[F.col(c).alias(f"_sdiff_n_{c}") for c in compare_cols],
        F.lit(1).alias("_sdiff_nm"),
    )
    j = o.join(n, keys, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"_sdiff_o_{c}").eqNullSafe(F.col(f"_sdiff_n_{c}"))
    status = (
        F.when(F.col("_sdiff_om").isNull(), F.lit("added"))
        .when(F.col("_sdiff_nm").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*keys, status.alias("status"))
