"""Slowly-changing-dimension (type 2) history maintenance.

The dimension-table counterpart of the fact-side upsert
(``operators/upsert.py``): instead of overwriting changed rows, SCD2
closes the old version (sets ``valid_to``) and opens a new one, so joins
against historical facts can be versioned with a
``valid_from <= ts < valid_to`` range predicate.

Plan shape: ONE key-equality join between the change batch and the
current snapshot classifies every change as no-op / changed / new (the
attribute comparison rides the join), then the history is three
branches — untouched rows (left-anti), closed rows (left-semi +
``valid_to`` literal), and opened rows (the effective batch) — unioned.
All three branches hash-partition on the business key, and the
anti/semi/UNION fan-out reads the (small) change batch, never re-scans
the snapshot more than the two anti/semi passes, both of which AQE can
serve from one exchange of the snapshot at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    current: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
    effective_date: str,
) -> DataFrame:
    """Apply a change batch to an SCD2 history at ``effective_date``.

    ``current`` must carry ``valid_from``/``valid_to`` (strings,
    ``valid_to`` null for open rows) plus the key and attribute columns;
    only OPEN rows are versioned (closed history passes through
    untouched). A change row identical to the open version (all
    ``compare_cols`` equal, null-safe) is a no-op; a differing row closes
    the open version and opens a new one; an unseen key just opens.
    """
    from .caching import tracked_persist

    keys = list(key_cols)
    # persisted: the change batch is CDC-batch-sized and read by the
    # duplicate-key guard, the classifying join, and (via ``effective``)
    # three output branches — without the cache each reference re-ran
    # the caller's whole batch-construction pipeline (the bench query's
    # plan carried 28 parquet scans of the same snapshot).
    changes = tracked_persist(changes)
    # A change batch with duplicate business keys would open multiple
    # simultaneous versions (identical valid_from, NULL valid_to), breaking
    # the at-most-one-open-row invariant every versioned range join relies
    # on. CDC feeds must be compacted to one row per key first; fail loudly
    # rather than corrupt the history. (One cheap count job — apply-time,
    # not query-time.)
    if changes.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count():
        raise ValueError(
            "scd2_apply: change batch has duplicate business keys — "
            "compact to one row per key (e.g. latest CDC op) before applying"
        )
    open_rows = current.filter(F.col("valid_to").isNull())
    closed_history = current.filter(F.col("valid_to").isNotNull())

    cur_cmp = open_rows.select(
        *keys,
        F.lit(True).alias("_cur_exists"),
        *[F.col(c).alias(f"_cur_{c}") for c in compare_cols],
    )
    joined = changes.join(cur_cmp, keys, "left")
    is_new = F.col("_cur_exists").isNull()
    # null-safe inequality on any compared attribute
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(c).eqNullSafe(F.col(f"_cur_{c}"))
    # persisted: effective (the classified changes) feeds the anti/semi
    # key probes AND the opened branch — 3 executions of the classifying
    # join without the cache; batch-sized rows.
    effective = tracked_persist(
        joined.filter(is_new | differs).select(*changes.columns)
    )

    eff_keys = effective.select(*keys)
    untouched = open_rows.join(eff_keys, keys, "left_anti")
    closed = open_rows.join(eff_keys, keys, "left_semi").withColumn(
        "valid_to", F.lit(effective_date)
    )
    opened = effective.withColumn(
        "valid_from", F.lit(effective_date)
    ).withColumn("valid_to", F.lit(None).cast("string"))

    out_cols = current.columns
    return (
        closed_history.select(*out_cols)
        .unionByName(untouched.select(*out_cols))
        .unionByName(closed.select(*out_cols))
        .unionByName(opened.select(*out_cols))
    )
