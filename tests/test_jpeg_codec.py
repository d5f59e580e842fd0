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
    # SOF1 extended sequential is outside the profile (SOF2
    # progressive is decoded for real since r9)
    extended = good[:i] + b"\xff\xc1" + good[i + 2 :]
    with pytest.raises(JPEGUnsupportedError):
        jpeg_decode(extended)
    # FRACTIONAL sampling ratios stay unsupported (integer-ratio
    # subsampling like 4:2:0 decodes for real since r9): flip a color
    # SOF to Y=2x2 / Cb=3x3 so 3 % 2 != 0
    color = jpeg_encode(8, 8, bytes(range(64)) * 3, channels=3)
    j = color.index(b"\xff\xc0") + 4
    frac = bytearray(color)
    frac[j + 7] = 0x22  # Y h/v
    frac[j + 10] = 0x33  # Cb h/v
    with pytest.raises(JPEGUnsupportedError):
        jpeg_decode(bytes(frac))


def test_subsampled_block_constant_exact():
    # R=G=B per-8x8-block-constant pixels: the JFIF transform gives
    # Y == v exactly and constant-128 chroma, so the full-res Y plane
    # must round-trip BIT-EXACTLY through the subsampled MCU layout —
    # including odd dims (MCU padding + crop)
    for w, h in ((16, 16), (24, 16), (19, 13), (8, 8), (33, 17)):
        want = np.zeros((h, w), dtype=np.uint8)
        rgb = bytearray()
        for y in range(h):
            for x in range(w):
                v = (20 + (x // 8) * 50 + (y // 8) * 70) % 256
                want[y, x] = v
                rgb += bytes((v, v, v))
        for sub in ("4:2:0", "4:2:2"):
            blob = jpeg_encode(w, h, bytes(rgb), channels=3, subsampling=sub)
            gw, gh, planes = jpeg_decode_planes(blob)
            assert (gw, gh) == (w, h)
            assert (planes[0] == want).all(), (sub, w, h)
            # chroma planes upsample back to full resolution, constant 128
            assert planes[1].shape == (h, w) and (planes[1] == 128).all()
            assert (planes[2] == 128).all()


def test_subsampled_general_color_tolerance():
    # general pixels through 4:2:0: Y within quantization tolerance of
    # the JFIF-transformed source (chroma is pooled, Y is not)
    rng = np.random.RandomState(11)
    w, h = 24, 16
    rgb = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    blob = jpeg_encode(w, h, rgb.tobytes(), channels=3, subsampling="4:2:0")
    gw, gh, planes = jpeg_decode_planes(blob)
    assert (gw, gh) == (w, h)
    r, g, b = (rgb[:, :, k].astype(np.float64) for k in range(3))
    y = np.clip(np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5), 0, 255)
    # flat AC quantizer 16 -> worst-case block error well under 16
    assert np.abs(planes[0].astype(np.float64) - y).max() <= 16


def test_subsampled_progressive_equals_baseline():
    rng = np.random.RandomState(13)
    for w, h in ((16, 16), (19, 13)):
        rgb = rng.randint(0, 256, (h, w, 3), dtype=np.uint8).tobytes()
        base = jpeg_encode(w, h, rgb, channels=3, subsampling="4:2:0")
        prog = jpeg_encode(
            w, h, rgb, channels=3, subsampling="4:2:0", progressive=True
        )
        pb = jpeg_decode_planes(base)
        pp = jpeg_decode_planes(prog)
        assert pb[:2] == pp[:2]
        for a, b in zip(pb[2], pp[2]):
            assert (a == b).all()


def test_subsampling_encoder_validation():
    with pytest.raises(ValueError):
        jpeg_encode(8, 8, bytes(64), channels=1, subsampling="4:2:0")
    with pytest.raises(ValueError):
        jpeg_encode(8, 8, bytes(192), channels=3, subsampling="4:1:1")


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


def test_ac_single_coefficient_roundtrip_exact():
    # the multimodal_decode_jpeg_ac fixture contract: pixels
    # A + B*s(m)s(n) (s = sign pattern of the (4,4) DCT basis) have the
    # exact two-coefficient spectrum {F00 = 8(A-128), F44 = 8B}; with
    # q00=8, qAC=16 and B even the round trip is bit-exact through the
    # AC Huffman + float-IDCT path (NOT the DC-only fast path).
    s = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.int64)
    s2 = np.outer(s, s)
    for a, b in [(64, 2), (128, 32), (191, 32), (100, 14), (77, 30)]:
        px = (a + b * s2).astype(np.uint8)
        blob = jpeg_encode(8, 8, px.tobytes(), channels=1)
        w, h, planes = jpeg_decode_planes(blob)
        assert (w, h) == (8, 8)
        assert np.array_equal(planes[0], px), (a, b)
    # multi-block: per-block amplitudes, shared base — the registry
    # fixture shape (exercises DC prediction across AC blocks too)
    base = 90
    px = np.empty((16, 24), dtype=np.uint8)
    for by in range(2):
        for bx in range(3):
            bamp = 2 * (1 + (7 * 13 + bx * 7 + by * 29) % 16)
            px[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = base + bamp * s2
    blob = jpeg_encode(24, 16, px.tobytes(), channels=1)
    w, h, planes = jpeg_decode_planes(blob)
    assert (w, h) == (24, 16)
    assert np.array_equal(planes[0], px)
    # odd B (inexact quantization) must NOT round-trip exactly — pins
    # that the test above really exercises lossy machinery
    px_odd = (100 + 3 * s2).astype(np.uint8)
    blob = jpeg_encode(8, 8, px_odd.tobytes(), channels=1)
    _, _, planes = jpeg_decode_planes(blob)
    assert not np.array_equal(planes[0], px_odd)
    assert np.abs(planes[0].astype(int) - px_odd.astype(int)).max() <= 2


def test_progressive_equals_baseline_decode():
    # the progressive scan script produces the IDENTICAL quantized
    # coefficients, so decode(progressive) == decode(baseline) holds
    # bit-exactly for ANY input — this pins spectral selection,
    # DC/AC successive approximation, refinement correction bits and
    # the shared reconstruction in one property.
    rng = np.random.default_rng(11)
    for _ in range(12):
        w = int(rng.integers(1, 40))
        h = int(rng.integers(1, 40))
        ch = int(rng.choice([1, 3]))
        px = rng.integers(0, 256, size=h * w * ch, dtype=np.uint8).tobytes()
        b0 = jpeg_encode(w, h, px, channels=ch)
        b1 = jpeg_encode(w, h, px, channels=ch, progressive=True)
        w0, h0, p0 = jpeg_decode_planes(b0)
        w1, h1, p1 = jpeg_decode_planes(b1)
        assert (w0, h0) == (w1, h1) == (w, h)
        for a, b in zip(p0, p1):
            assert np.array_equal(a, b)


def test_progressive_block_constant_still_exact():
    # the DC certification contract must survive the progressive path
    # (DC coded at Al=1 + refinement; reconstruction shared)
    px = _block_constant(24, 16, lambda bx, by: bx * 40 + by * 90)
    blob = jpeg_encode(24, 16, px, channels=1, progressive=True)
    w, h, planes = jpeg_decode_planes(blob)
    assert (w, h) == (24, 16)
    assert planes[0].tobytes() == px


def test_progressive_ac_single_coefficient_exact():
    # AC fixture contract through the progressive path too
    s = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.int64)
    px = (100 + 14 * np.outer(s, s)).astype(np.uint8)
    blob = jpeg_encode(8, 8, px.tobytes(), channels=1, progressive=True)
    _, _, planes = jpeg_decode_planes(blob)
    assert np.array_equal(planes[0], px)


def test_progressive_eob_run_decode():
    """EOBn>0 (shared end-of-band runs across blocks) — emitted by web
    encoders but not ours, so build the scan by hand with a custom AC
    table containing the EOB1 symbol (0x10)."""
    from world_vaccination_coverage_etl_spark.operators.jpeg_codec import (
        _BitWriter,
        _canonical_codes,
    )
    import struct

    # 32x8 gray: 4 blocks.  Target coefficients: block0 has AC k=1
    # value +2 (quantized), blocks 1-2 empty (covered by EOB run),
    # block3 has AC k=2 value -1.
    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    q = [8] + [16] * 63
    dqt = seg(0xFFDB, bytes([0x00]) + bytes(q))
    sof = seg(0xFFC2, struct.pack(">BHHB", 8, 8, 32, 1) + bytes([1, 0x11, 0]))
    dc_bits = [0, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    dc_vals = [0, 1]
    ac_bits = [0, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    ac_vals = [0x00, 0x10, 0x01, 0x11]  # EOB0, EOB1, (0,1), (1,1)
    dht = seg(
        0xFFC4,
        bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals)
        + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals),
    )
    dc_enc, _ = _canonical_codes(dc_bits, dc_vals)
    ac_enc, _ = _canonical_codes(ac_bits, ac_vals)

    # scan 1: DC, Al=0 — all four DC diffs zero (constant 128 image)
    w = _BitWriter()
    for _ in range(4):
        code, ln = dc_enc[0]
        w.put(code, ln)
    sos_dc = seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0x00])) + w.flush()

    # scan 2: AC 1..63, Ah=0, Al=0 with an EOB1 run covering blocks 1-2
    w = _BitWriter()
    code, ln = ac_enc[0x01]  # block0: (run 0, size 1)
    w.put(code, ln)
    w.put(1, 1)  # magnitude bit -> +1... size 1 => value +1
    code, ln = ac_enc[0x00]  # EOB0 terminates block0's band
    w.put(code, ln)
    code, ln = ac_enc[0x10]  # EOB1 read during block1: terminates it
    w.put(code, ln)          # and eobrun = (1<<1)-1 + bits(1) more
    w.put(0, 1)              # bits(1)=0 -> skip exactly block2
    code, ln = ac_enc[0x11]  # block3: (run 1, size 1)
    w.put(code, ln)
    w.put(0, 1)  # magnitude bit 0 -> value -1
    code, ln = ac_enc[0x00]
    w.put(code, ln)
    sos_ac = seg(0xFFDA, bytes([1, 1, 0x00, 1, 63, 0x00])) + w.flush()

    blob = b"\xff\xd8" + dqt + sof + dht + sos_dc + sos_ac + b"\xff\xd9"
    width, height, planes = jpeg_decode_planes(blob)
    assert (width, height) == (32, 8)
    # verify via the reference reconstruction: coefficients we coded
    from world_vaccination_coverage_etl_spark.operators.jpeg_codec import (
        ZIGZAG,
        _cmat,
    )

    c = _cmat()
    want = np.empty((8, 32), dtype=np.uint8)
    for bi, (k, v) in enumerate([(1, 1), (None, 0), (None, 0), (2, -1)]):
        nat = np.zeros(64)
        if k is not None:
            nat[ZIGZAG[k]] = v * 16.0
        sp = c.T @ nat.reshape(8, 8) @ c + 128.0
        want[:, bi * 8 : bi * 8 + 8] = np.clip(np.floor(sp + 0.5), 0, 255)
    assert np.array_equal(planes[0], want)


def test_progressive_truncation_fuzz_stays_in_tier():
    good = jpeg_encode(16, 16, bytes(range(256)), channels=1, progressive=True)
    for cut in range(2, len(good)):
        try:
            jpeg_decode_planes(good[:cut])
        except (JPEGCorruptError, JPEGUnsupportedError):
            pass


def test_restart_interval_roundtrip_all_modes():
    """DRI/RSTn (T.81 E.1.2): the restart-marked stream must decode
    to EXACTLY the same planes as the unmarked encoding, across
    baseline/progressive, gray/color, every subsampling, and
    intervals that do / do not divide the MCU count evenly."""
    rng = np.random.default_rng(7)
    cases = [(40, 24, 1), (40, 24, 3), (23, 17, 3)]
    for w, h, ch in cases:
        px = rng.integers(0, 256, size=h * w * ch, dtype=np.uint8).tobytes()
        for prog in (False, True):
            subs = ["4:4:4"] if ch == 1 else ["4:4:4", "4:2:0", "4:2:2"]
            for sub in subs:
                base = jpeg_encode(
                    w, h, px, channels=ch, progressive=prog, subsampling=sub
                )
                _, _, p0 = jpeg_decode_planes(base)
                for ri in (1, 3, 7):
                    enc = jpeg_encode(
                        w, h, px, channels=ch, progressive=prog,
                        subsampling=sub, restart_interval=ri,
                    )
                    assert b"\xff\xdd" in enc and enc != base
                    _, _, p = jpeg_decode_planes(enc)
                    for a, b in zip(p, p0):
                        assert np.array_equal(a, b), (w, h, ch, prog, sub, ri)


def test_restart_markers_cycle_past_rst7():
    """>8 restart groups: marker index wraps 0..7 (m & 7)."""
    w, h = 8 * 12, 8  # 12 MCUs, ri=1 -> 11 markers, wraps past RST7
    px = bytes((x * 7 + y * 13) % 256 for y in range(h) for x in range(w))
    enc = jpeg_encode(w, h, px, restart_interval=1)
    assert enc.count(b"\xff\xd0") >= 1 and b"\xff\xd1" in enc
    base = jpeg_encode(w, h, px)
    assert np.array_equal(
        jpeg_decode_planes(enc)[2][0], jpeg_decode_planes(base)[2][0]
    )


def test_restart_dc_prediction_resets():
    """A constant image's DC diffs are nonzero only at group starts;
    with ri=1 every block re-codes the full DC — the streams differ
    but both reconstruct the constant exactly (exact-DC contract)."""
    w = h = 32
    px = bytes([200]) * (w * h)
    enc = jpeg_encode(w, h, px, restart_interval=1)
    width, height, planes = jpeg_decode_planes(enc)
    assert (width, height) == (w, h)
    assert np.array_equal(planes[0], np.full((h, w), 200, dtype=np.uint8))


def test_rst_without_dri_is_corrupt():
    px = bytes(range(256))
    enc = jpeg_encode(16, 16, px, restart_interval=1)
    i = enc.index(b"\xff\xdd")
    stripped = enc[:i] + enc[i + 6 :]  # drop the 6-byte DRI segment
    with pytest.raises(JPEGCorruptError):
        jpeg_decode_planes(stripped)


def test_wrong_rst_index_is_corrupt():
    px = bytes(range(256))
    enc = bytearray(jpeg_encode(16, 16, px, restart_interval=1))
    i = enc.index(b"\xff\xd0")
    enc[i + 1] = 0xD5  # out-of-sequence restart marker
    with pytest.raises(JPEGCorruptError):
        jpeg_decode_planes(bytes(enc))


def test_restart_truncation_fuzz_stays_in_tier():
    good = jpeg_encode(
        24, 16, bytes((i * 11) % 256 for i in range(24 * 16)),
        restart_interval=2,
    )
    for cut in range(2, len(good)):
        try:
            jpeg_decode_planes(good[:cut])
        except (JPEGCorruptError, JPEGUnsupportedError):
            pass


def test_restart_interval_encoder_validation():
    with pytest.raises(ValueError):
        jpeg_encode(8, 8, bytes(64), restart_interval=-1)
    with pytest.raises(ValueError):
        jpeg_encode(8, 8, bytes(64), restart_interval=0x10000)


def test_dht_cache_is_bounded():
    from world_vaccination_coverage_etl_spark import operators
    from world_vaccination_coverage_etl_spark.operators import jpeg_codec as jc

    before = dict(jc._DHT_CACHE)
    try:
        jc._DHT_CACHE.clear()
        # many distinct single-symbol table sets — each a unique key
        for sym in range(jc._DHT_CACHE_MAX + 10):
            bits = [0] * 16
            bits[1] = 1  # one 2-bit code
            jc._huff_decoder(bits, [sym % 256] if sym < 256 else [0])
            # vary key by bits too so all are distinct
        assert len(jc._DHT_CACHE) <= jc._DHT_CACHE_MAX
    finally:
        jc._DHT_CACHE.clear()
        jc._DHT_CACHE.update(before)
