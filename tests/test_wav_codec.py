"""Pure-stdlib WAV codec (operators/wav_codec.py) + the real audio
decode path of decode_audio_batch — the audio sibling of the PNG
suite: round-trips, the corrupt/unsupported error tiers, and the
integer-stat contract that makes certification layout-independent.
"""

import struct

import pytest

from world_vaccination_coverage_etl_spark.operators.wav_codec import (
    WAVCorruptError,
    WAVUnsupportedError,
    is_wav,
    wav_decode,
    wav_decode_samples,
    wav_encode,
)


def test_roundtrip_16bit_stereo():
    samples = [((i * 37) % 4001) - 2000 for i in range(2 * 75)]
    blob = wav_encode(44100, 2, samples, bits=16)
    assert is_wav(blob)
    rate, ch, bits, got = wav_decode_samples(blob)
    assert (rate, ch, bits) == (44100, 2, 16)
    assert got == samples
    rate, ch, n_frames, sum_abs, peak = wav_decode(blob)
    assert (rate, ch, n_frames) == (44100, 2, 75)
    assert sum_abs == sum(abs(s) for s in samples)
    assert peak == max(abs(s) for s in samples)


def test_roundtrip_8bit_mono():
    samples = [(i * 13 + 5) % 256 for i in range(50)]
    blob = wav_encode(8000, 1, samples, bits=8)
    rate, ch, bits, got = wav_decode_samples(blob)
    assert (rate, ch, bits) == (8000, 1, 8)
    assert got == samples


def test_extra_chunks_and_odd_padding():
    # a LIST chunk with odd length before data: word-alignment walk
    samples = [100, -100, 32767, -32768]
    blob = wav_encode(16000, 1, samples)
    # splice an odd-length junk chunk right after "WAVE"
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    spliced = blob[:12] + junk + blob[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    rate, ch, bits, got = wav_decode_samples(spliced)
    assert got == samples


def test_corrupt_payloads_raise_corrupt():
    good = wav_encode(8000, 1, [1, 2, 3, 4])
    for bad in (
        b"RIFX" + good[4:],                      # wrong magic
        good[:12],                               # no chunks at all
        good[:20],                               # truncated fmt
        good[:4] + good[4:12] + b"data" + struct.pack("<I", 999) + b"xx",
    ):
        with pytest.raises(WAVCorruptError):
            wav_decode(bad)


def test_unsupported_profile_raises_unsupported():
    good = wav_encode(8000, 1, [1, 2, 3, 4])
    # flip the format tag to 3 (IEEE float)
    i = good.index(b"fmt ") + 8
    bad = good[:i] + struct.pack("<H", 3) + good[i + 2 :]
    with pytest.raises(WAVUnsupportedError):
        wav_decode(bad)
    with pytest.raises(WAVUnsupportedError):
        wav_encode(8000, 1, [1], bits=24)


def test_decode_audio_batch_real_wav(spark):
    from world_vaccination_coverage_etl_spark.operators.multimodal import (
        decode_audio_batch,
    )

    samples = [((i * 11) % 201) - 100 for i in range(60)]
    good = wav_encode(22050, 2, samples)
    corrupt = good[:16] + b"\x00" * 4
    df = spark.createDataFrame(
        [
            (0, "audio/wav", bytearray(good)),
            (1, "audio/wav", bytearray(corrupt)),
            (2, "audio/wav", None),
        ],
        "asset_id long, mime string, payload binary",
    )
    rows = {r.asset_id: r for r in decode_audio_batch(df).collect()}
    assert (rows[0].sample_rate, rows[0].channels, rows[0].n_frames) == (
        22050, 2, 30,
    )
    assert rows[0].sum_abs == sum(abs(s) for s in samples)
    assert rows[0].peak == max(abs(s) for s in samples)
    assert (rows[1].sample_rate, rows[1].n_frames, rows[1].sum_abs) == (0, 0, 0)
    assert (rows[2].sample_rate, rows[2].n_frames, rows[2].sum_abs) == (0, 0, 0)


def test_decode_audio_batch_non_wav_raises(spark):
    from world_vaccination_coverage_etl_spark.operators.multimodal import (
        decode_audio_batch,
    )

    df = spark.createDataFrame(
        [(0, "audio/mpeg", bytearray(b"ID3\x04not-a-wav"))],
        "asset_id long, mime string, payload binary",
    )
    with pytest.raises(Exception, match="NotImplementedError|audio library"):
        decode_audio_batch(df).collect()


def test_stray_parse_errors_become_corrupt():
    good = wav_encode(8000, 1, list(range(-32, 32)))
    for cut in range(4, len(good)):
        try:
            wav_decode(good[:cut])
        except (WAVCorruptError, WAVUnsupportedError):
            pass
