"""MP4 (ISO BMFF) MJPEG container codec (operators/mp4_codec.py) +
the video-container path it adds to sample_video_batch.

Samples are block-constant JPEGs so every sampled frame hits the
exact-DC certification path — stats must be EXACT integers."""

import struct

import numpy as np
import pytest

from world_vaccination_coverage_etl_spark.operators.jpeg_codec import jpeg_encode
from world_vaccination_coverage_etl_spark.operators.mp4_codec import (
    MP4CorruptError,
    MP4UnsupportedError,
    is_mp4,
    mp4_decode_frames,
    mp4_encode_mjpeg,
    mp4_sample_stats,
)


def _mjpeg_fixture(w=16, h=8, n=5, seed=7, samples_per_chunk=2):
    frames, planes = [], []
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    for f in range(n):
        v = ((seed * 13 + f * 31 + (xx // 8) * 7 + (yy // 8) * 29) % 256).astype(
            np.uint8
        )
        frames.append(jpeg_encode(w, h, v.tobytes(), channels=1))
        planes.append(v)
    return mp4_encode_mjpeg(w, h, frames, samples_per_chunk=samples_per_chunk), planes


def test_container_roundtrip_and_exact_sampling():
    w, h, n = 16, 8, 5
    blob, planes = _mjpeg_fixture(w, h, n)
    assert is_mp4(blob)
    gw, gh, frames = mp4_decode_frames(blob)
    assert (gw, gh, len(frames)) == (w, h, n)
    for k in (1, 2, 3):
        sampled = planes[::k]
        want = (
            w, h, n, len(sampled),
            int(sum(p.astype(np.int64).sum() for p in sampled)),
            int(max(p.max() for p in sampled)),
        )
        assert mp4_sample_stats(blob, every_k=k) == want


def test_chunk_layouts_agree():
    """stsc/stco arithmetic: every chunking of the same samples must
    reconstruct identical frame spans (1 = per-sample chunks, large =
    single chunk, 2/3 = uneven tail chunks)."""
    w, h, n = 8, 8, 7
    ref = None
    for spc in (1, 2, 3, 100):
        blob, _ = _mjpeg_fixture(w, h, n, samples_per_chunk=spc)
        frames = mp4_decode_frames(blob)[2]
        assert len(frames) == n
        if ref is None:
            ref = frames
        else:
            assert frames == ref


def test_unsampled_samples_never_jpeg_decoded():
    # sample 1 is garbage JPEG bytes; every_k=2 skips it, so sampling
    # must succeed — proof the table walk slices past unsampled spans
    # without entropy-decoding them
    w, h = 8, 8
    good = jpeg_encode(w, h, bytes([50] * 64), channels=1)
    blob = mp4_encode_mjpeg(w, h, [good, b"\xff\xd8garbage", good])
    stats = mp4_sample_stats(blob, every_k=2)
    assert stats == (w, h, 3, 2, 2 * 64 * 50, 50)
    # ... and sampling INTO it degrades to the corrupt tier
    with pytest.raises(MP4CorruptError):
        mp4_sample_stats(blob, every_k=1)


def test_modern_codec_raises_unsupported():
    blob, _ = _mjpeg_fixture()
    for fourcc in (b"avc1", b"hvc1", b"vp09", b"av01"):
        bad = blob.replace(b"jpeg", fourcc, 1)
        with pytest.raises(MP4UnsupportedError):
            mp4_decode_frames(bad)


def test_corrupt_payloads_raise_corrupt():
    blob, _ = _mjpeg_fixture()
    for bad in (
        blob[:4] + b"XXXX" + blob[8:],         # no ftyp
        blob.replace(b"moov", b"XXXX", 1),     # no moov
        blob.replace(b"stco", b"XXXX", 1),     # no chunk offsets
        blob.replace(b"vide", b"XXXX", 1),     # no video handler
    ):
        with pytest.raises(MP4CorruptError):
            mp4_decode_frames(bad)


def test_truncation_fuzz_stays_in_tier():
    blob, _ = _mjpeg_fixture(w=8, h=8, n=2)
    for cut in range(4, len(blob), 3):
        try:
            mp4_sample_stats(blob[:cut])
        except (MP4CorruptError, MP4UnsupportedError):
            pass


def test_frame_dim_mismatch_is_corrupt():
    w, h = 16, 8
    wrong = jpeg_encode(8, 8, bytes([9] * 64), channels=1)
    blob = mp4_encode_mjpeg(w, h, [wrong])
    with pytest.raises(MP4CorruptError):
        mp4_sample_stats(blob)


def test_largesize_and_co64_boxes_decode():
    """64-bit box size (size==1 + largesize) and co64 offsets — the
    forms a >4 GiB capture would actually use."""
    w, h = 8, 8
    good = jpeg_encode(w, h, bytes([77] * 64), channels=1)
    blob = mp4_encode_mjpeg(w, h, [good, good])
    # rewrite mdat as a largesize box (grows the header by 8, so every
    # absolute chunk offset past it shifts by 8)
    i = blob.index(b"mdat") - 4
    (sz,) = struct.unpack_from(">I", blob, i)
    big = (
        blob[:i]
        + struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", sz + 8)
        + blob[i + 8 : i + sz]
    )
    tail = blob[i + sz :]
    # stco -> co64 (same count, 8-byte offsets, +8 shift)
    j = tail.index(b"stco") - 4
    (stco_sz,) = struct.unpack_from(">I", tail, j)
    (cnt,) = struct.unpack_from(">I", tail, j + 12)
    offs = struct.unpack_from(f">{cnt}I", tail, j + 16)
    co64 = (
        struct.pack(">I", 16 + 8 * cnt) + b"co64" + tail[j + 8 : j + 12]
        + struct.pack(">I", cnt)
        + b"".join(struct.pack(">Q", o + 8) for o in offs)
    )
    new_tail = tail[:j] + co64 + tail[j + stco_sz :]
    # fix every ancestor box length that contains the stbl (the
    # stco -> co64 rewrite grew the table by 4 bytes per chunk)
    grow = 4 * cnt
    for tag in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        p = new_tail.index(tag) - 4
        (bsz,) = struct.unpack_from(">I", new_tail, p)
        new_tail = (
            new_tail[:p] + struct.pack(">I", bsz + grow) + new_tail[p + 4 :]
        )
    stats = mp4_sample_stats(big + new_tail)
    assert stats == (w, h, 2, 2, 2 * 64 * 77, 77)


def test_sample_video_batch_mp4_path(spark):
    from world_vaccination_coverage_etl_spark.operators.multimodal import (
        sample_video_batch,
    )

    blob, planes = _mjpeg_fixture(w=8, h=8, n=4, seed=3)
    df = spark.createDataFrame(
        [(1, "video/mp4", bytearray(blob)), (2, "video/mp4", None)],
        "asset_id long, mime string, payload binary",
    )
    rows = {
        r["asset_id"]: r
        for r in sample_video_batch(df, every_k=2).collect()
    }
    sampled = planes[::2]
    assert rows[1]["n_frames"] == 4 and rows[1]["n_sampled"] == 2
    assert rows[1]["luma_sum"] == int(
        sum(p.astype(np.int64).sum() for p in sampled)
    )
    assert rows[2]["luma_sum"] == 0  # NULL payload sentinel
