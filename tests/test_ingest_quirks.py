"""Ingest-quirk regression tests for ``sources.ingest.melt_wide_psd``.

Two documented archive pathologies (``/root/reference/docs/upstream-notes.md``):

- the wrong-prefix ``sandbox 12oct`` archives whose band columns come out
  labeled ``0..101`` (upstream-notes.md:55) — consecutive small integers,
  not frequency centers;
- band-set drift across files of one product (upstream-notes.md:55 /
  SURVEY.md §1.3), which surfaces through Spark's ``mergeSchema`` as a
  union-of-columns wide frame with nulls where a file lacked a band.

Chosen behavior, pinned here: **normalize, don't reject** — any column whose
label parses as a number melts to a ``band_hz`` row (mirroring the
reference's own float-conversion membership test,
``app/services/get_aggregations.py:70-75``); drift becomes long-form rows
with null values, a *data* difference rather than a *schema* difference.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ambient_sound_analysis_api_spark.sources.ingest import melt_wide_psd


def _wide(spark, ts, cols_vals: dict[str, float]):
    cols = ", ".join(f"`{c}` double" for c in cols_vals)
    return spark.createDataFrame(
        [tuple([ts] + list(cols_vals.values()))], f"ts timestamp, {cols}"
    )


def test_melt_wrong_prefix_0_to_101_labels(spark):
    """The documented pathological column set 0..101 melts: every label is
    numeric, so all 102 columns become band rows with band_hz 0.0..101.0 —
    garbage labels survive VISIBLY as implausible frequencies instead of
    being silently dropped (triage happens downstream, with the data)."""
    from datetime import datetime

    labels = {str(i): float(100 + i) for i in range(102)}
    wide = _wide(spark, datetime(2024, 1, 1), labels)
    out = melt_wide_psd(wide, "sandbox", 1, "octave_bands", 12)
    rows = out.orderBy("band_hz").collect()
    assert len(rows) == 102
    assert [r["band_hz"] for r in rows] == [float(i) for i in range(102)]
    assert rows[0]["value"] == 100.0 and rows[101]["value"] == 201.0
    assert {(r["hydrophone"], r["freq_type"], r["delta_f"]) for r in rows} == {
        ("sandbox", "octave_bands", 12)
    }


def test_melt_skips_non_numeric_labels_only(spark):
    """Mixed frames keep numeric labels and skip the rest — the reference's
    float-conversion membership test, not a whitelist."""
    from datetime import datetime

    wide = _wide(
        spark, datetime(2024, 1, 1),
        {"63": 1.0, "80.5": 2.0, "notaband": 3.0, "Unnamed: 0": 4.0},
    )
    out = melt_wide_psd(wide, "h", 1, "octave_bands", 3)
    got = {r["band_hz"]: r["value"] for r in out.collect()}
    assert got == {63.0: 1.0, 80.5: 2.0}


def test_melt_all_non_numeric_raises(spark):
    from datetime import datetime

    wide = _wide(spark, datetime(2024, 1, 1), {"a": 1.0, "b": 2.0})
    with pytest.raises(ValueError, match="no numeric band columns"):
        melt_wide_psd(wide, "h", 1, "octave_bands", 3)


def test_band_set_drift_across_files_mergeschema(spark, tmp_path):
    """Two archive files of one product with different band sets: the
    mergeSchema read yields the union of band columns (absent → null), and
    the melt emits the union per timestamp with null values where a file
    lacked the band — rows are never dropped, set drift is data not schema."""
    from datetime import datetime

    root = str(tmp_path / "drift")
    f1 = _wide(spark, datetime(2024, 1, 1), {"63": 1.0, "80": 2.0})
    f2 = _wide(spark, datetime(2024, 2, 1), {"63": 3.0, "100": 4.0})
    f1.write.parquet(f"{root}/m=1")
    f2.write.parquet(f"{root}/m=2")

    wide = spark.read.option("mergeSchema", "true").parquet(
        f"{root}/m=1", f"{root}/m=2"
    )
    assert {"63", "80", "100"} <= set(wide.columns)

    out = melt_wide_psd(wide, "h", 1, "octave_bands", 3)
    jan = {
        r["band_hz"]: r["value"]
        for r in out.filter(F.month("ts") == 1).collect()
    }
    feb = {
        r["band_hz"]: r["value"]
        for r in out.filter(F.month("ts") == 2).collect()
    }
    assert jan == {63.0: 1.0, 80.0: 2.0, 100.0: None}
    assert feb == {63.0: 3.0, 80.0: None, 100.0: 4.0}


def test_corrupt_footer_skipped_with_count(spark, tmp_path):
    """Round-12 VERDICT #7: a truncated parquet in a listing must be
    skipped WITH A COUNT through the catalog → scan path, never fail the
    job or vanish silently — and the strict default read must still fail,
    pinning that the skip is a deliberate audit decision."""
    import pytest as _pytest

    from ambient_sound_analysis_api_spark.sources.catalog import (
        parquet_footer_audit, scan_with_corruption_audit,
    )

    paths = []
    for i in range(3):
        p = str(tmp_path / f"good_{i}.parquet")
        spark.range(i * 10, i * 10 + 10).selectExpr(
            "id", "id * 2 AS v"
        ).coalesce(1).write.parquet(p)
        paths.append(p)
    # a torn write: a real file truncated mid-footer
    bad = str(tmp_path / "torn.parquet")
    src = str(tmp_path / "src.parquet")
    spark.range(100, 110).selectExpr("id", "id * 2 AS v").coalesce(
        1
    ).write.parquet(src)
    import glob
    import shutil

    os_part = glob.glob(f"{src}/part-*.parquet")[0]
    shutil.copy(os_part, bad + ".tmp")
    with open(bad + ".tmp", "rb") as f:
        blob = f.read()
    with open(bad, "wb") as f:
        f.write(blob[: len(blob) - 30])  # clip the footer
    paths.append(bad)

    data, audit = scan_with_corruption_audit(spark, paths)
    assert data.count() == 30  # all good rows, no job failure
    rows = {r["path"]: r for r in audit.collect()}
    assert len(rows) == 4
    assert [p for p, r in rows.items() if not r["ok"]] == [bad]
    assert rows[bad]["error"] is not None
    assert all(rows[p]["n_rows"] == 10 for p in paths[:3])
    # contrast: the strict default read dies on the same listing
    with _pytest.raises(Exception, match=".*"):
        spark.read.parquet(*paths).count()
    # audit alone over a fully-good listing reads clean
    ok_audit = parquet_footer_audit(spark, paths[:3])
    assert ok_audit.filter(~F.col("ok")).count() == 0


def test_all_corrupt_listing_schema_fallback_or_raise(spark, tmp_path):
    """Round-13 ADVICE: when EVERY listed file fails the footer probe,
    the scan must not invent a phantom `key string` schema — with a
    caller schema the empty frame carries the REAL columns; without one
    it raises a descriptive error at the audit site, not a downstream
    column-resolution failure."""
    import pytest as _pytest

    from ambient_sound_analysis_api_spark.sources.catalog import (
        scan_with_corruption_audit,
    )

    bad = str(tmp_path / "junk.parquet")
    with open(bad, "wb") as f:
        f.write(b"\x00" * 64)  # no PAR1 magic anywhere

    data, audit = scan_with_corruption_audit(
        spark, [bad], schema="id long, v double"
    )
    assert data.columns == ["id", "v"]
    assert data.count() == 0
    assert audit.filter("ok").count() == 0

    with _pytest.raises(ValueError, match="footer probe"):
        scan_with_corruption_audit(spark, [bad])
