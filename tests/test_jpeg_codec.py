"""Baseline JPEG codec (operators/jpeg_codec.py) + the real decode
path it adds to decode_image_batch.

Two coverage tiers matching the codec's certification story:
- the DC path (block-constant images) must round-trip BIT-EXACTLY —
  it is what the registry oracle certifies;
- the AC/IDCT float path is lossy by design and is pinned with
  tolerance round-trips (flat quant tables keep the error small) plus
  PIL parity where PIL is importable.
"""

import numpy as np
import pytest

from world_vaccination_coverage_etl_spark.operators.jpeg_codec import (
    JPEGCorruptError,
    JPEGUnsupportedError,
    is_jpeg,
    jpeg_decode,
    jpeg_decode_planes,
    jpeg_encode,
)


def _block_constant(w, h, fn):
    px = bytearray(w * h)
    for y in range(h):
        for x in range(w):
            px[y * w + x] = fn(x // 8, y // 8) % 256
    return bytes(px)


def test_block_constant_roundtrip_exact():
    w, h = 40, 24
    px = _block_constant(w, h, lambda bx, by: bx * 73 + by * 151)
    blob = jpeg_encode(w, h, px, channels=1)
    assert is_jpeg(blob)
    gw, gh, planes = jpeg_decode_planes(blob)
    assert (gw, gh) == (w, h)
    assert bytes(planes[0].reshape(-1)) == px
    dw, dh, mean = jpeg_decode(blob)
    assert (dw, dh) == (w, h)
    assert mean == pytest.approx(sum(px) / (w * h))


def test_every_constant_value_exact():
    for v in range(0, 256, 17):
        px = bytes([v] * 64)
        _, _, planes = jpeg_decode_planes(jpeg_encode(8, 8, px, channels=1))
        assert bytes(planes[0].reshape(-1)) == px, f"value {v}"


def test_general_gray_tolerance():
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
    blob = jpeg_encode(32, 24, g.tobytes(), channels=1)
    _, _, planes = jpeg_decode_planes(blob)
    err = np.abs(planes[0].astype(int) - g.astype(int))
    # flat-16 AC quantizer: worst-case block error is bounded
    assert err.max() <= 32
    assert err.mean() < 8


def test_smooth_gradient_near_lossless():
    grad = np.tile(np.arange(0, 256, 8, dtype=np.uint8), (32, 1))
    blob = jpeg_encode(32, 32, grad.tobytes(), channels=1)
    _, _, planes = jpeg_decode_planes(blob)
    assert np.abs(planes[0].astype(int) - grad.astype(int)).max() <= 2


def test_odd_dimensions_edge_replication():
    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, size=(10, 13), dtype=np.uint8)
    blob = jpeg_encode(13, 10, g.tobytes(), channels=1)
    gw, gh, planes = jpeg_decode_planes(blob)
    assert (gw, gh) == (13, 10)
    assert planes[0].shape == (10, 13)


def test_color_444_roundtrip():
    # block-constant color: Y plane is block-constant too, so the
    # decoded luma mean matches the JFIF Y of the block colors exactly
    w, h = 16, 8
    colors = [(200, 30, 60), (10, 250, 90)]
    px = bytearray(w * h * 3)
    for y in range(h):
        for x in range(w):
            r, g, b = colors[x // 8]
            px[(y * w + x) * 3 : (y * w + x) * 3 + 3] = bytes([r, g, b])
    blob = jpeg_encode(w, h, bytes(px), channels=3)
    gw, gh, planes = jpeg_decode_planes(blob)
    assert (gw, gh, len(planes)) == (w, h, 3)
    import math

    def jfif_y(r, g, b):
        return min(255, max(0, math.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)))

    want = sum(jfif_y(*c) for c in colors) / 2
    _, _, mean = jpeg_decode(blob)
    assert mean == pytest.approx(want)


def test_corrupt_payloads_raise_corrupt():
    good = jpeg_encode(8, 8, bytes(range(64)), channels=1)
    for bad in (
        b"\x00\x00" + good[2:],               # no SOI
        good[:20],                            # truncated segments
        good[:-2],                            # no EOI
        good.replace(b"\xff\xc0", b"\xff\xda", 1)[:30],  # SOS before SOF
    ):
        with pytest.raises(JPEGCorruptError):
            jpeg_decode(bad)


def test_unsupported_profile_raises_unsupported():
    good = jpeg_encode(8, 8, bytes(range(64)), channels=1)
    i = good.index(b"\xff\xc0")
    progressive = good[:i] + b"\xff\xc2" + good[i + 2 :]
    with pytest.raises(JPEGUnsupportedError):
        jpeg_decode(progressive)
    # subsampling: flip the Y component's h/v factors to 0x22
    sof_body = i + 4
    sub = good[: sof_body + 7] + b"\x22" + good[sof_body + 8 :]
    with pytest.raises(JPEGUnsupportedError):
        jpeg_decode(sub)


def test_parity_with_pillow():
    PIL = pytest.importorskip("PIL")  # noqa: N806
    import io

    from PIL import Image

    # PIL must read our bitstream: dims exact, pixels within the
    # quantization tolerance (PIL's IDCT differs in rounding)
    w, h = 24, 16
    px = _block_constant(w, h, lambda bx, by: bx * 40 + by * 90)
    blob = jpeg_encode(w, h, px, channels=1)
    with Image.open(io.BytesIO(blob)) as im:
        assert im.size == (w, h)
        got = np.array(im.convert("L"), dtype=int)
    want = np.frombuffer(px, dtype=np.uint8).reshape(h, w).astype(int)
    assert np.abs(got - want).max() <= 1


def test_decode_image_batch_real_jpeg(spark):
    from world_vaccination_coverage_etl_spark.operators.multimodal import (
        decode_image_batch,
    )

    px = _block_constant(16, 8, lambda bx, by: 50 + bx * 120)
    good = jpeg_encode(16, 8, px, channels=1)
    corrupt = good[:24] + b"\x00" * 6
    df = spark.createDataFrame(
        [
            (0, "image/jpeg", bytearray(good)),
            (1, "image/jpeg", bytearray(corrupt)),
        ],
        "asset_id long, mime string, payload binary",
    )
    rows = {r.asset_id: r for r in decode_image_batch(df, fake=False).collect()}
    assert (rows[0].width, rows[0].height) == (16, 8)
    assert rows[0].mean_intensity == pytest.approx(sum(px) / 128)
    assert (rows[1].width, rows[1].height, rows[1].mean_intensity) == (0, 0, 0.0)


def test_stray_parse_errors_become_corrupt():
    # r8 ADVICE repro: truncated SOF body raised struct.error through
    # the kernel's typed-error catch; the corrupt_guard maps every
    # low-level parse exception to JPEGCorruptError
    with pytest.raises(JPEGCorruptError):
        jpeg_decode(b"\xff\xd8\xff\xc0\x00\x04\x08\x00\xff\xd9")
    # fuzzed truncations at every byte offset must stay in-tier
    good = jpeg_encode(8, 8, bytes(range(64)), channels=1)
    for cut in range(2, len(good)):
        try:
            jpeg_decode(good[:cut])
        except (JPEGCorruptError, JPEGUnsupportedError):
            pass  # the only allowed failure modes


def test_dc_rounding_matches_idct_convention():
    # r8 ADVICE: the DC-only fast path must use the same
    # floor(x + 0.5) (half toward +inf) convention as the float-IDCT
    # path.  dc*q00 ≡ 4 (mod 8) with negative dc is the disagreement
    # case: floor(-4/8 + 0.5) = 0, half-away-from-zero gave -1.
    from world_vaccination_coverage_etl_spark.operators.jpeg_codec import (
        _cmat,
    )

    for dcq in (-4, -12, 4, 12, -20, 20):
        v_fast = (dcq + 4) // 8 + 128
        c = _cmat()
        nat = np.zeros((8, 8))
        nat[0, 0] = dcq
        sp = c.T @ nat @ c + 128.0
        v_float = int(np.clip(np.floor(sp + 0.5), 0, 255)[0, 0])
        assert v_fast == v_float, dcq
