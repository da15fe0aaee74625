"""Multimodal plumbing tests: schemas, batching, deterministic fake decode,
resize/frame-sample semantics (decode itself is stubbed — no codec libs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_io_spark.catalog import TableCatalog
from etl_io_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = TableCatalog(spark, SF).table("documents").limit(20)
    return mm.synthesize_media(docs)


def test_media_schema(media):
    assert media.schema == mm.MEDIA_SCHEMA or set(media.columns) == {
        f.name for f in mm.MEDIA_SCHEMA.fields
    }
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image"}


def test_decode_shapes_and_determinism(media):
    out1 = mm.decode_media(media).collect()
    out2 = mm.decode_media(media).collect()
    by_id1 = {r["media_id"]: r["pixels"] for r in out1}
    by_id2 = {r["media_id"]: r["pixels"] for r in out2}
    assert by_id1 == by_id2  # deterministic fake decode
    for r in out1:
        assert len(r["pixels"]) == r["width"] * r["height"]
        assert all(0 <= p <= 255 for p in r["pixels"])


def test_resize(media):
    out = mm.resize_media(media, out_w=3, out_h=2).collect()
    for r in out:
        assert (r["width"], r["height"]) == (3, 2)
        assert len(r["pixels"]) == 6


def test_sample_frames_fanout(media):
    rows = mm.sample_frames(media, every_n=2).collect()
    meta = {r["media_id"]: r["n_frames"] for r in media.collect()}
    counts: dict[int, int] = {}
    for r in rows:
        counts[r["media_id"]] = counts.get(r["media_id"], 0) + 1
        assert r["frame_index"] % 2 == 0
        assert len(r["frame_fingerprint"]) == 32
    for mid, n in meta.items():
        assert counts[mid] == (n + 1) // 2


def test_extract_features(media):
    out = mm.extract_features(media).collect()
    for r in out:
        v = float(r["mean_value"])
        assert 0 <= v <= 255 and r["n_values"] > 0


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_library_decode_fails_fast_without_pillow():
    if _pil_available():
        pytest.skip("Pillow present - fail-fast path not reachable")
    with pytest.raises(NotImplementedError, match="Pillow"):
        mm.library_decode(b"xx", 2, 2)


def test_library_decode_roundtrips_png_when_pillow_present():
    if not _pil_available():
        pytest.skip("Pillow not installed in this container")
    import io

    import PIL.Image

    img = PIL.Image.new("L", (1, 1), color=137)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    out = mm.library_decode(buf.getvalue(), 1, 1)
    assert out.shape == (1, 1) and out.dtype.name == "uint8"
    assert int(out[0, 0]) == 137
    # resize path: decode the same 1x1 PNG at 2x3
    out2 = mm.library_decode(buf.getvalue(), 2, 3)
    assert out2.shape == (3, 2)


def test_decode_preserves_partitioning(spark, media):
    parted = media.repartition(4, "media_id")
    assert mm.decode_media(parted).rdd.getNumPartitions() == 4


def test_frame_dedup_counts_cross_media_repeats(spark):
    from etl_io_spark.operators import multimodal as mm

    media = spark.createDataFrame(
        [
            (1, "video", bytearray(b"same"), 4),
            (2, "video", bytearray(b"same"), 4),   # identical payload: all frames dup
            (3, "video", bytearray(b"other"), 2),
        ],
        "media_id long, kind string, data binary, n_frames int",
    )
    out = {r["media_id"]: r for r in mm.frame_dedup(media, every_n=2).collect()}
    assert out[1]["n_frames_sampled"] == 2 and out[1]["n_dup_frames"] == 0
    assert out[2]["n_frames_sampled"] == 2 and out[2]["n_dup_frames"] == 2
    assert out[3]["n_dup_frames"] == 0
