"""Tests for the multimodal binary-column plumbing."""

from __future__ import annotations

from demo_flink_spark.operators import multimodal as mm


def _media(spark):
    docs = spark.createDataFrame(
        [(0, "abc"), (1, "hello world"), (2, "")], "doc_id long, text string"
    )
    return mm.attach_fake_media(docs)


def test_media_schema_is_binary_plus_typed_meta(spark):
    media = _media(spark)
    dt = dict(media.dtypes)
    assert dt["payload"] == "binary"
    assert dt["meta"].startswith("struct<mime:string,width:int,height:int")


def test_decode_stats_deterministic(spark):
    out = {r["doc_id"]: r for r in mm.decoded_media_stats(_media(spark)).collect()}
    assert out[0]["mime"] == "image/png" and out[1]["mime"] == "audio/wav"
    assert out[0]["n_bytes"] == 3 and out[1]["n_bytes"] == 11
    # fake luma: mean of byte values / 255
    assert abs(out[0]["mean_luma"] - (ord("a") + ord("b") + ord("c")) / 3 / 255) < 1e-9
    assert out[2]["mean_luma"] == 0.0  # empty payload guarded


def test_frame_sample_bounded_output(spark):
    rows = mm.frame_sample(_media(spark), n_frames=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 4  # 11 bytes -> 4 frames
    assert sum(r["frame_bytes"] for r in by_doc[1]) >= 8
    assert 2 not in by_doc  # empty payload -> no frames
    assert len(by_doc[0]) <= 4


def test_metadata_filter_prunes_without_decode(spark):
    # Filtering on meta.mime must not require the payload column:
    # project meta-only and check the analyzed plan reads no payload.
    media = _media(spark)
    filtered = media.filter("meta.mime = 'image/png'").select("doc_id", "meta.width")
    assert "payload" not in filtered.columns
    assert filtered.count() == 1


def test_pil_branch_uses_real_decoder(monkeypatch):
    # unit-level: the per-object decode helper takes the PIL path for
    # image mimes when PIL is "available" (monkeypatched here, since
    # the container has no image libs) and stub-falls-back on error
    from demo_flink_spark.operators import multimodal as mm

    monkeypatch.setattr(mm, "HAS_PIL", True)
    monkeypatch.setattr(mm, "_pil_decode", lambda payload: (7, 9, 0.5))
    meta = {"mime": "image/png", "width": 100, "height": 200}
    assert mm._decode_one(b"pngbytes", meta) == (7, 9, 0.5)

    # non-image mime never calls PIL even when available
    meta_audio = {"mime": "audio/wav", "width": 3, "height": 4}
    w, h, luma = mm._decode_one(b"\x10\x10", meta_audio)
    assert (w, h) == (3, 4) and abs(luma - mm._fake_decode(b"\x10\x10")) < 1e-12

    # decoder raising (corrupt bytes) falls back to the stub
    def boom(payload):
        raise OSError("cannot identify image file")

    monkeypatch.setattr(mm, "_pil_decode", boom)
    meta_img = {"mime": "image/png", "width": 5, "height": 6}
    w, h, luma = mm._decode_one(b"junk", meta_img)
    assert (w, h) == (5, 6) and abs(luma - mm._fake_decode(b"junk")) < 1e-12


def test_resize_media_dims_and_stride(spark):
    from demo_flink_spark.operators.multimodal import (
        attach_fake_media,
        resize_media,
    )

    docs = spark.createDataFrame(
        [(608, "x" * 100), (32, "y" * 50)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in resize_media(attach_fake_media(docs), max_side=128).collect()
    }
    # doc 608: w=608%640+32=640, h=608%480+32=160 -> scale by 128/640:
    # tw=128, th=160*128//640=32
    r = out[608]
    assert (r["width"], r["height"]) == (640, 160)
    assert (r["target_w"], r["target_h"]) == (128, 32)
    stride = -(-(640 * 160) // (128 * 32))  # 25
    assert bytes(r["resized"]) == ("x" * 100).encode()[::stride]
    assert r["out_bytes"] == len(bytes(r["resized"]))
    # doc 32: w=64, h=64 -> under max_side, untouched payload
    r2 = out[32]
    assert (r2["target_w"], r2["target_h"]) == (64, 64)
    assert bytes(r2["resized"]) == b"y" * 50


def test_byte_entropy_discriminates_random_from_repetitive(spark):
    """Pseudo-random bytes must flag looks_compressed (H near ln 256 =
    5.545 nats); a single-byte run has H = 0 and 100% max share; an
    empty payload yields the all-zeros row; entropy must equal the
    numpy plug-in estimator to the 6dp contract."""
    import math

    import numpy as np

    from demo_flink_spark.operators.multimodal import byte_entropy

    rnd = bytes(((i * 193 + 71) % 256) for i in range(4096))  # full-period
    runs = b"a" * 500
    mixed = b"abab" * 100 + b"c" * 17
    df = spark.createDataFrame(
        [(1, rnd), (2, runs), (3, mixed), (4, b"")],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in byte_entropy(df).collect()}

    assert got[1]["looks_compressed"] and got[1]["n_distinct_bytes"] == 256
    assert abs(got[1]["entropy_nats"] - math.log(256)) < 1e-5
    assert got[2]["entropy_nats"] == 0.0 and not got[2]["looks_compressed"]
    assert got[2]["max_byte_share_micros"] == 1_000_000
    assert got[4]["n_bytes"] == 0 and got[4]["entropy_nats"] == 0.0

    vals, counts = np.unique(np.frombuffer(mixed, np.uint8), return_counts=True)
    p = counts / counts.sum()
    want = float(-(p * np.log(p)).sum())
    assert abs(got[3]["entropy_nats"] - want) < 2e-6
    assert got[3]["max_byte_share_micros"] == 200 * 1_000_000 // 417
