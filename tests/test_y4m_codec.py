"""Pure-stdlib Y4M video codec (operators/y4m_codec.py) + the
frame-sampling decode path it adds (sample_video_batch) — the video
sibling of the PNG/GIF/JPEG/WAV suites: exact round-trips, sampling
arithmetic, chroma-skip geometry, and the corrupt/unsupported tiers.
"""

import pytest

from world_vaccination_coverage_etl_spark.operators.y4m_codec import (
    Y4MCorruptError,
    Y4MUnsupportedError,
    is_y4m,
    y4m_decode_frames,
    y4m_encode,
    y4m_sample_stats,
)


def _frames(w, h, n):
    return [
        bytes((f * 31 + p * 13) % 256 for p in range(w * h)) for f in range(n)
    ]


def test_roundtrip_mono():
    w, h, n = 6, 4, 5
    frames = _frames(w, h, n)
    blob = y4m_encode(w, h, frames, fps=(30, 1), chroma="mono")
    assert is_y4m(blob)
    gw, gh, fps, got = y4m_decode_frames(blob)
    assert (gw, gh, fps) == (w, h, (30, 1))
    assert got == frames


def test_roundtrip_420_skips_chroma():
    # luma must come back exactly; the neutral chroma planes are walked
    # over, not returned
    w, h, n = 8, 4, 3
    frames = _frames(w, h, n)
    blob = y4m_encode(w, h, frames, chroma="420jpeg")
    gw, gh, _, got = y4m_decode_frames(blob)
    assert (gw, gh) == (w, h)
    assert got == frames


@pytest.mark.parametrize("k,n,expect", [(1, 5, 5), (2, 5, 3), (2, 6, 3), (3, 7, 3)])
def test_sampling_arithmetic(k, n, expect):
    w, h = 4, 2
    frames = _frames(w, h, n)
    gw, gh, nf, ns, s, p = y4m_sample_stats(
        y4m_encode(w, h, frames, chroma="mono"), every_k=k
    )
    assert (gw, gh, nf, ns) == (w, h, n, expect)
    sampled = frames[::k]
    assert s == sum(sum(f) for f in sampled)
    assert p == max(max(f) for f in sampled)


def test_zero_frames():
    blob = y4m_encode(4, 2, [], chroma="mono")
    gw, gh, nf, ns, s, p = y4m_sample_stats(blob)
    assert (gw, gh, nf, ns, s, p) == (4, 2, 0, 0, 0, 0)


def test_corrupt_payloads_raise_corrupt():
    good = y4m_encode(4, 2, _frames(4, 2, 2), chroma="mono")
    for bad in (
        b"NOTY4M" + good[6:],
        good.replace(b"FRAME", b"FRAMX", 1),
        good[:-3],                              # truncated last frame
        b"YUV4MPEG2 F25:1\nFRAME\n",            # no W/H
        b"YUV4MPEG2 W4 H2 C mono",              # unterminated header
    ):
        with pytest.raises(Y4MCorruptError):
            y4m_sample_stats(bad)


def test_unsupported_profile_raises_unsupported():
    good = y4m_encode(4, 2, _frames(4, 2, 1), chroma="mono")
    interlaced = good.replace(b"Ip", b"It", 1)
    with pytest.raises(Y4MUnsupportedError):
        y4m_sample_stats(interlaced)
    exotic = good.replace(b"Cmono", b"C444alpha", 1)
    with pytest.raises(Y4MUnsupportedError):
        y4m_sample_stats(exotic)
    with pytest.raises(Y4MUnsupportedError):
        y4m_encode(4, 2, _frames(4, 2, 1), chroma="422")


def test_sample_video_batch_real_y4m(spark):
    from world_vaccination_coverage_etl_spark.operators.multimodal import (
        sample_video_batch,
    )

    w, h, n = 6, 4, 5
    frames = _frames(w, h, n)
    good = y4m_encode(w, h, frames, chroma="mono")
    corrupt = good[:15] + b"\x00" * 5
    df = spark.createDataFrame(
        [
            (0, "video/x-yuv4mpeg", bytearray(good)),
            (1, "video/x-yuv4mpeg", bytearray(corrupt)),
            (2, "video/x-yuv4mpeg", None),
        ],
        "asset_id long, mime string, payload binary",
    )
    rows = {
        r.asset_id: r for r in sample_video_batch(df, every_k=2).collect()
    }
    sampled = frames[::2]
    assert (rows[0].width, rows[0].height, rows[0].n_frames) == (w, h, n)
    assert rows[0].n_sampled == 3
    assert rows[0].luma_sum == sum(sum(f) for f in sampled)
    assert rows[0].luma_peak == max(max(f) for f in sampled)
    assert (rows[1].n_frames, rows[1].luma_sum) == (0, 0)
    assert (rows[2].n_frames, rows[2].luma_sum) == (0, 0)


def test_sample_video_batch_unknown_container_raises(spark):
    """A container NO stdlib codec claims (Matroska/WebM magic) must
    raise the NotImplementedError tier, not decode to a sentinel.  A
    bare ftyp header IS claimed since the r9 MP4 codec — truncated,
    it degrades to the corrupt-tier sentinel row instead."""
    from world_vaccination_coverage_etl_spark.operators.multimodal import (
        sample_video_batch,
    )

    df = spark.createDataFrame(
        [(0, "video/webm", bytearray(b"\x1aE\xdf\xa3webmjunk"))],
        "asset_id long, mime string, payload binary",
    )
    with pytest.raises(Exception, match="NotImplementedError|codec library"):
        sample_video_batch(df).collect()

    df2 = spark.createDataFrame(
        [(0, "video/mp4", bytearray(b"\x00\x00\x00\x18ftypmp42"))],
        "asset_id long, mime string, payload binary",
    )
    row = sample_video_batch(df2).collect()[0]
    assert (row.n_frames, row.luma_sum) == (0, 0)


def test_stray_parse_errors_become_corrupt():
    # r8 ADVICE repro: non-numeric W/H tag raised bare ValueError from
    # int() through the kernel's typed-error catch
    with pytest.raises(Y4MCorruptError):
        y4m_decode_frames(b"YUV4MPEG2 Wx H8 F25:1 Cmono\n")
    with pytest.raises(Y4MCorruptError):
        y4m_decode_frames(b"YUV4MPEG2 W8 H8 F25:a Cmono\n")
    # fuzzed truncations stay in-tier
    good = y4m_encode(8, 8, [bytes(64)], chroma="mono")
    for cut in range(len(b"YUV4MPEG2"), len(good)):
        try:
            y4m_decode_frames(good[:cut])
        except (Y4MCorruptError, Y4MUnsupportedError):
            pass
