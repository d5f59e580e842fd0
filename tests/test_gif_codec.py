"""Pure-stdlib GIF codec (operators/gif_codec.py) + the real decode
path it adds to decode_image_batch: LZW round-trips across palette
sizes and image shapes, the clear-code re-send that keeps the encoder
at fixed code width, the corrupt/unsupported tiers, and PIL parity
where PIL is importable.
"""

import pytest

from world_vaccination_coverage_etl_spark.operators.gif_codec import (
    GIFCorruptError,
    GIFUnsupportedError,
    gif_decode,
    gif_decode_pixels,
    gif_encode,
    is_gif,
)
from world_vaccination_coverage_etl_spark.operators.png_codec import _luma


def _gray_palette(n):
    return bytes(v for i in range(n) for v in (i * 255 // max(n - 1, 1),) * 3)


def test_roundtrip_small():
    w, h = 7, 5
    pal = _gray_palette(8)
    idx = bytes((x * 3 + y) % 8 for y in range(h) for x in range(w))
    blob = gif_encode(w, h, idx, pal)
    assert is_gif(blob)
    gw, gh, gidx, gpal = gif_decode_pixels(blob)
    assert (gw, gh) == (w, h)
    assert gidx == idx
    assert gpal[: len(pal)] == pal
    dw, dh, mean = gif_decode(blob)
    lut = [_luma(pal[i * 3], pal[i * 3 + 1], pal[i * 3 + 2]) for i in range(8)]
    assert (dw, dh) == (w, h)
    assert mean == pytest.approx(sum(lut[i] for i in idx) / (w * h))


@pytest.mark.parametrize("n_colors", [2, 3, 16, 200, 256])
def test_roundtrip_palette_sizes(n_colors):
    w, h = 13, 9
    pal = bytes((i * 7 + c * 31) % 256 for i in range(n_colors) for c in range(3))
    idx = bytes((x * 11 + y * 5) % n_colors for y in range(h) for x in range(w))
    blob = gif_encode(w, h, idx, pal)
    gw, gh, gidx, _ = gif_decode_pixels(blob)
    assert (gw, gh, gidx) == (w, h, idx)


def test_roundtrip_large_forces_clear_codes():
    # 100x80 = 8000 pixels with a 4-color palette: mcs=2, clear every
    # 2 pixels — exercises the clear-code re-send path hard
    w, h = 100, 80
    pal = _gray_palette(4)
    idx = bytes((x + y) % 4 for y in range(h) for x in range(w))
    blob = gif_encode(w, h, idx, pal)
    gw, gh, gidx, _ = gif_decode_pixels(blob)
    assert (gw, gh, gidx) == (w, h, idx)


def test_single_color_and_single_pixel():
    blob = gif_encode(1, 1, b"\x00", b"\x80\x80\x80")
    w, h, mean = gif_decode(blob)
    assert (w, h) == (1, 1)
    assert mean == _luma(0x80, 0x80, 0x80)


def test_extension_blocks_skipped():
    pal = _gray_palette(4)
    idx = bytes([0, 1, 2, 3])
    blob = gif_encode(2, 2, idx, pal)
    # splice a GIF89a graphic-control extension before the image
    img_at = blob.index(b"\x2c")
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = b"GIF89a" + blob[6:img_at] + ext + blob[img_at:]
    gw, gh, gidx, _ = gif_decode_pixels(spliced)
    assert (gw, gh, gidx) == (2, 2, idx)


def test_corrupt_payloads_raise_corrupt():
    good = gif_encode(3, 2, bytes([0, 1, 2, 3, 0, 1]), _gray_palette(4))
    for bad in (
        b"NOTG" + good[4:],
        good[:10],                      # truncated LSD
        good[:-2],                      # missing sub-block terminator+trailer
        good[: good.index(b"\x2c")] + b"\x7f" + good[good.index(b"\x2c") + 1 :],
    ):
        with pytest.raises(GIFCorruptError):
            gif_decode(bad)


def test_unsupported_profile_raises_unsupported():
    good = gif_encode(3, 2, bytes([0, 1, 2, 3, 0, 1]), _gray_palette(4))
    i = good.index(b"\x2c")
    # set the local-color-table bit in the image descriptor's packed
    # byte (interlace decodes for real since r9)
    bad = good[: i + 9] + bytes([good[i + 9] | 0x80]) + good[i + 10 :]
    with pytest.raises(GIFUnsupportedError):
        gif_decode(bad)


def test_parity_with_pillow():
    PIL = pytest.importorskip("PIL")  # noqa: N806
    import io

    from PIL import Image

    w, h = 9, 6
    pal = bytes((i * 37 + c * 11) % 256 for i in range(16) for c in range(3))
    idx = bytes((x * 5 + y * 3) % 16 for y in range(h) for x in range(w))
    blob = gif_encode(w, h, idx, pal)
    with Image.open(io.BytesIO(blob)) as im:
        assert im.size == (w, h)
        gray = im.convert("L")
        pil_mean = sum(gray.getdata()) / (w * h)
    _, _, mean = gif_decode(blob)
    assert mean == pil_mean


def test_decode_image_batch_real_gif(spark):
    from world_vaccination_coverage_etl_spark.operators.multimodal import (
        decode_image_batch,
    )

    pal = _gray_palette(8)
    idx = bytes((x + y) % 8 for y in range(4) for x in range(6))
    good = gif_encode(6, 4, idx, pal)
    corrupt = good[:12] + b"\x00" * 4
    df = spark.createDataFrame(
        [
            (0, "image/gif", bytearray(good)),
            (1, "image/gif", bytearray(corrupt)),
        ],
        "asset_id long, mime string, payload binary",
    )
    rows = {r.asset_id: r for r in decode_image_batch(df, fake=False).collect()}
    lut = [_luma(pal[i * 3], pal[i * 3 + 1], pal[i * 3 + 2]) for i in range(8)]
    assert (rows[0].width, rows[0].height) == (6, 4)
    assert rows[0].mean_intensity == pytest.approx(sum(lut[i] for i in idx) / 24)
    assert (rows[1].width, rows[1].height, rows[1].mean_intensity) == (0, 0, 0.0)


def test_stray_parse_errors_become_corrupt():
    # corrupt_guard: fuzzed truncations/mutations must stay within the
    # typed Corrupt/Unsupported tiers (no struct.error/IndexError)
    good = gif_encode(8, 8, bytes(range(64)), bytes(range(192)))
    for cut in range(6, len(good)):
        try:
            gif_decode(good[:cut])
        except (GIFCorruptError, GIFUnsupportedError):
            pass


def test_interlaced_gif_roundtrip():
    for w, h in [(1, 1), (3, 2), (8, 8), (13, 11), (5, 17), (16, 1)]:
        idx = bytes((x * 11 + 3) % 64 for x in range(w * h))
        pal = bytes((i * 3 + 1) % 256 for i in range(192))
        plain = gif_encode(w, h, idx, pal)
        inter = gif_encode(w, h, idx, pal, interlace=True)
        assert gif_decode_pixels(inter)[:3] == gif_decode_pixels(plain)[:3]
        assert gif_decode(inter) == gif_decode(plain)
