"""AVI (RIFF) MJPEG container codec (operators/avi_codec.py) + the
video-container path it adds to sample_video_batch.

Frames are block-constant JPEGs so every sampled frame hits the
exact-DC certification path — stats must be EXACT integers."""

import struct

import numpy as np
import pytest

from world_vaccination_coverage_etl_spark.operators.avi_codec import (
    AVICorruptError,
    AVIUnsupportedError,
    avi_decode_frames,
    avi_encode_mjpeg,
    avi_sample_stats,
    is_avi,
)
from world_vaccination_coverage_etl_spark.operators.jpeg_codec import jpeg_encode


def _mjpeg_fixture(w=16, h=8, n=5, seed=7):
    frames, planes = [], []
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    for f in range(n):
        v = ((seed * 13 + f * 31 + (xx // 8) * 7 + (yy // 8) * 29) % 256).astype(
            np.uint8
        )
        frames.append(jpeg_encode(w, h, v.tobytes(), channels=1))
        planes.append(v)
    return avi_encode_mjpeg(w, h, frames), planes


def test_container_roundtrip_and_exact_sampling():
    w, h, n = 16, 8, 5
    blob, planes = _mjpeg_fixture(w, h, n)
    assert is_avi(blob)
    gw, gh, frames = avi_decode_frames(blob)
    assert (gw, gh, len(frames)) == (w, h, n)
    for k in (1, 2, 3):
        sampled = planes[::k]
        want = (
            w, h, n, len(sampled),
            int(sum(p.astype(np.int64).sum() for p in sampled)),
            int(max(p.max() for p in sampled)),
        )
        assert avi_sample_stats(blob, every_k=k) == want


def test_unsampled_frames_never_jpeg_decoded():
    # frame 1 is garbage JPEG bytes; every_k=2 skips it, so sampling
    # must succeed — proof the container walk slices past unsampled
    # chunks without entropy-decoding them
    w, h = 8, 8
    good = jpeg_encode(w, h, bytes([50] * 64), channels=1)
    blob = avi_encode_mjpeg(w, h, [good, b"\xff\xd8garbage", good])
    stats = avi_sample_stats(blob, every_k=2)
    assert stats == (w, h, 3, 2, 2 * 64 * 50, 50)
    # ... and sampling INTO it degrades to the corrupt tier
    with pytest.raises(AVICorruptError):
        avi_sample_stats(blob, every_k=1)


def test_non_mjpeg_codec_raises_unsupported():
    blob, _ = _mjpeg_fixture()
    for fourcc in (b"H264", b"vp09"):
        bad = blob.replace(b"MJPG", fourcc)
        with pytest.raises(AVIUnsupportedError):
            avi_decode_frames(bad)


def test_corrupt_payloads_raise_corrupt():
    blob, _ = _mjpeg_fixture()
    for bad in (
        b"RIFX" + blob[4:],                    # wrong signature
        blob[:12],                             # headers missing
        blob.replace(b"avih", b"XXXX", 1),     # no main header
    ):
        with pytest.raises(AVICorruptError):
            avi_decode_frames(bad)


def test_truncation_fuzz_stays_in_tier():
    blob, _ = _mjpeg_fixture(w=8, h=8, n=2)
    for cut in range(4, len(blob), 3):
        try:
            avi_sample_stats(blob[:cut])
        except (AVICorruptError, AVIUnsupportedError):
            pass


def test_frame_dim_mismatch_is_corrupt():
    w, h = 16, 8
    wrong = jpeg_encode(8, 8, bytes([9] * 64), channels=1)
    blob = avi_encode_mjpeg(w, h, [wrong])
    with pytest.raises(AVICorruptError):
        avi_sample_stats(blob)


def test_idx1_offsets_match_layout():
    # the encoder writes a standard idx1; verify each offset points at
    # a '00dc' fourcc relative to the movi list's 'movi' tag
    blob, _ = _mjpeg_fixture(n=3)
    i = blob.index(b"movi")
    j = blob.index(b"idx1")
    (ln,) = struct.unpack_from("<I", blob, j + 4)
    for e in range(ln // 16):
        off = j + 8 + e * 16
        assert blob[off : off + 4] == b"00dc"
        (_flags, rel, _sz) = struct.unpack_from("<III", blob, off + 4)
        assert blob[i + rel : i + rel + 4] == b"00dc"


def test_sample_video_batch_avi_path(spark):
    from world_vaccination_coverage_etl_spark.operators.multimodal import (
        sample_video_batch,
    )

    blob, planes = _mjpeg_fixture(w=8, h=8, n=4, seed=3)
    df = spark.createDataFrame(
        [(1, "video/x-msvideo", bytearray(blob)), (2, "video/mp4", None)],
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
