"""Image codec + vectorized decode invariants (BASELINE.json
input_hint: decoded-pixel PSNR >= 40 dB for lossy, deterministic
phash; SaveToFile analogue lands bytes as typed item columns)."""

from __future__ import annotations

import numpy as np
import pytest

from spider_man_spark.functions.images import (
    decode_image,
    decode_items,
    image_format,
    make_image,
    phash64,
    png_decode,
    png_encode,
    psnr,
    qimg_decode,
    qimg_encode,
    resize_batches,
)


def test_png_roundtrip_lossless():
    px = make_image("img-7", 48, 32)
    assert (png_decode(png_encode(px)) == px).all()


def test_qimg_lossy_psnr_over_40db():
    for i in range(8):
        px = make_image(f"img-{i}", 64, 64)
        assert psnr(px, qimg_decode(qimg_encode(px))) >= 40.0


def test_phash_deterministic_and_robust_to_quantization():
    px = make_image("img-3", 64, 64)
    h1 = phash64(px)
    h2 = phash64(qimg_decode(qimg_encode(px)))
    # average-hash differs by at most a few bits under 2-bit quantization
    assert bin(h1 ^ h2).count("1") <= 4
    assert phash64(px) == h1


def test_make_image_process_stable():
    # crc32-seeded, not hash()-seeded: stable across interpreter runs
    px = make_image("stable", 8, 8)
    assert int(px.sum()) == int(make_image("stable", 8, 8).sum())


def test_format_sniffing():
    px = make_image("x", 16, 16)
    assert image_format(png_encode(px)) == "png"
    assert image_format(qimg_encode(px)) == "qimg"
    assert image_format(b"\xff\xd8\xff\xe0") == "jpeg"


def test_jpeg_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0rest", "jpeg")


def test_decode_items_vectorized(spark):
    rows = []
    for i in range(6):
        px = make_image(f"im{i}", 32, 24)
        data = png_encode(px) if i % 2 == 0 else qimg_encode(px)
        rows.append((f"im{i}", bytearray(data)))
    rows.append(("missing", None))
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    dec = decode_items(df)
    # the decode info is a NARROW projection: payload bytes are
    # consumed, not re-emitted (they'd cross the Arrow boundary and
    # every downstream shuffle for nothing — callers join back by
    # image_id when they need the payload next to the info)
    assert "bytes" not in dec.columns
    out = {r.image_id: r for r in dec.collect()}
    assert len(out) == 7
    for i in range(6):
        r = out[f"im{i}"]
        assert (r.w, r.h) == (32, 24)
        assert r.decode_ok
        assert r.fmt == ("png" if i % 2 == 0 else "qimg")
    # the join-back-by-id pattern keeps payload + info equivalent to
    # the old wide output
    joined = {
        r.image_id: r
        for r in dec.join(df, "image_id").collect()
    }
    for i in range(6):
        px = make_image(f"im{i}", 32, 24)
        assert psnr(px, decode_image(bytes(joined[f"im{i}"].bytes))) >= 40.0
    assert not out["missing"].decode_ok


def test_resize_stage(spark):
    px = make_image("rz", 64, 64)
    df = spark.createDataFrame(
        [("rz", bytearray(png_encode(px)))], "image_id string, bytes binary"
    )
    out = df.mapInPandas(
        resize_batches(16, 16), "image_id string, bytes binary, w int, h int"
    ).first()
    rp = decode_image(bytes(out.bytes))
    assert rp.shape == (16, 16, 3)
    # nearest-neighbor of a deterministic image is deterministic
    yi = (np.arange(16) * 64) // 16
    assert (rp == px[yi][:, yi]).all()
