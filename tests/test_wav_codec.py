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


# ---------------------------------------------------------- IMA ADPCM (r9)

def test_adpcm_pack_decodes_defined_stream_exactly():
    from world_vaccination_coverage_etl_spark.operators.wav_codec import (
        _adpcm_step,
        adpcm_pack,
        wav_decode_samples,
    )

    for channels in (1, 2):
        spb, nblocks = 9, 3
        headers = [
            ((((7 * b + 3 * c + 1) * 611) % 4001) - 2000, (b * 5 + c * 3 + 7) % 89)
            for b in range(nblocks)
            for c in range(channels)
        ]
        nibs = [
            (b * 13 + c * 11 + i * 3) % 16
            for b in range(nblocks)
            for c in range(channels)
            for i in range(spb - 1)
        ]
        blob = adpcm_pack(11025, channels, headers, nibs, spb)
        rate, ch, bits, samples = wav_decode_samples(blob)
        assert (rate, ch, bits) == (11025, channels, 4)
        # replay the automaton in python and compare frame-interleaved
        want = []
        for b in range(nblocks):
            chan = []
            for c in range(channels):
                pred, idx = headers[b * channels + c]
                s = [pred]
                for k in range(spb - 1):
                    pred, idx = _adpcm_step(
                        pred, idx, nibs[(b * channels + c) * (spb - 1) + k]
                    )
                    s.append(pred)
                chan.append(s)
            for i in range(spb):
                for c in range(channels):
                    want.append(chan[c][i])
        assert samples == want


def test_adpcm_greedy_encoder_tracks_smooth_signal():
    import math

    from world_vaccination_coverage_etl_spark.operators.wav_codec import (
        adpcm_encode,
        wav_decode_samples,
    )

    # slope-limited signal: the adaptive step can follow it, so the
    # greedy encoder stays within a small fraction of full scale
    sig = [int(900 * math.sin(i / 11)) for i in range(45)]
    blob = adpcm_encode(8000, 1, sig, samples_per_block=9)
    _rate, _ch, _bits, got = wav_decode_samples(blob)
    assert len(got) == len(sig)
    # bounded by the cold-start step-adaptation lag (~step_table ramp),
    # well under 2% of full scale
    assert max(abs(a - b) for a, b in zip(sig, got)) <= 160


def test_adpcm_clamps_and_step_bounds():
    from world_vaccination_coverage_etl_spark.operators.wav_codec import (
        adpcm_pack,
        wav_decode_samples,
    )

    # all-maximum nibbles from the top step must clamp at int16 bounds
    # and the index at 88; all-decrement from index 0 must floor at 0
    blob = adpcm_pack(8000, 1, [(32000, 88)], [7] * 8, 9)
    _r, _c, _b, samples = wav_decode_samples(blob)
    assert max(samples) <= 32767 and samples[-1] == 32767
    blob = adpcm_pack(8000, 1, [(0, 0)], [8] * 8, 9)
    _r, _c, _b, samples = wav_decode_samples(blob)
    assert min(samples) >= -32768


def test_adpcm_corrupt_and_unsupported_tiers():
    import struct

    from world_vaccination_coverage_etl_spark.operators.wav_codec import (
        WAVCorruptError,
        WAVUnsupportedError,
        adpcm_pack,
        wav_decode,
    )

    good = adpcm_pack(8000, 1, [(100, 10)], list(range(8)), 9)
    # step index > 88 in a block header
    i = good.index(b"data") + 8 + 2
    bad = good[:i] + bytes([200]) + good[i + 1 :]
    with pytest.raises(WAVCorruptError):
        wav_decode(bad)
    # 3-channel ADPCM: unsupported tier
    j = good.index(b"fmt ") + 8
    fmt = bytearray(good)
    struct.pack_into("<H", fmt, j + 2, 3)
    with pytest.raises(WAVUnsupportedError):
        wav_decode(bytes(fmt))
    # truncation fuzz stays inside the two-tier contract
    for cut in range(4, len(good)):
        try:
            wav_decode(good[:cut])
        except (WAVCorruptError, WAVUnsupportedError):
            pass


def _splice_fact(blob: bytes, frames: int) -> bytes:
    """Insert a fact chunk before the data chunk and fix the RIFF size."""
    import struct

    i = blob.index(b"data")
    fact = b"fact" + struct.pack("<I", 4) + struct.pack("<I", frames)
    out = blob[:i] + fact + blob[i:]
    return out[:4] + struct.pack("<I", len(out) - 8) + out[8:]


def test_adpcm_fact_chunk_truncates_padded_final_block():
    from world_vaccination_coverage_etl_spark.operators.wav_codec import (
        WAVCorruptError,
        adpcm_pack,
        wav_decode,
        wav_decode_samples,
    )

    # one mono block of 9 samples, but the fact chunk says only 5 are
    # real audio — the 4 trailing pad samples must not be decoded
    blob = adpcm_pack(8000, 1, [(100, 10)], list(range(8)), 9)
    _r, _c, _b, full = wav_decode_samples(blob)
    assert len(full) == 9
    faked = _splice_fact(blob, 5)
    _r, _c, _b, cut = wav_decode_samples(faked)
    assert cut == full[:5]
    # summary stats follow the truncation
    _sr, _ch, n_frames, sum_abs, peak = wav_decode(faked)
    assert n_frames == 5
    assert sum_abs == sum(abs(s) for s in full[:5])
    assert peak == max(abs(s) for s in full[:5])
    # a fact chunk claiming MORE frames than the data holds is corrupt
    with pytest.raises(WAVCorruptError):
        wav_decode(_splice_fact(blob, 10))


def test_adpcm_partial_trailing_block_is_corrupt():
    import struct

    from world_vaccination_coverage_etl_spark.operators.wav_codec import (
        WAVCorruptError,
        adpcm_pack,
        wav_decode,
    )

    blob = adpcm_pack(8000, 1, [(100, 10)], list(range(8)), 9)
    # stretch the data chunk by 3 bytes: not a whole block any more
    i = blob.index(b"data")
    (dlen,) = struct.unpack_from("<I", blob, i + 4)
    grown = (
        blob[: i + 4]
        + struct.pack("<I", dlen + 3)
        + blob[i + 8 :]
        + b"\x00\x00\x00"
    )
    grown = grown[:4] + struct.pack("<I", len(grown) - 8) + grown[8:]
    with pytest.raises(WAVCorruptError):
        wav_decode(grown)


def test_adpcm_short_final_block_decodes():
    """A legitimately short final block (header + fewer whole data
    words than samples_per_block implies) is valid real-world IMA
    ADPCM — the stream just ends mid-block.  It must decode to the
    prefix of the full-block decode, not raise (r10 ADVICE)."""
    import struct

    from world_vaccination_coverage_etl_spark.operators.wav_codec import (
        adpcm_pack,
        wav_decode_samples,
    )

    # mono, samples_per_block=17 -> npb=16 -> 2 data words per block
    blob = adpcm_pack(8000, 1, [(100, 10)], list(range(16)), 17)
    _r, _c, _b, full = wav_decode_samples(blob)
    assert len(full) == 17
    # drop the final 4-byte word from the data chunk: header + 1 word
    i = blob.index(b"data")
    (dlen,) = struct.unpack_from("<I", blob, i + 4)
    short = (
        blob[: i + 4]
        + struct.pack("<I", dlen - 4)
        + blob[i + 8 : i + 8 + dlen - 4]
    )
    short = short[:4] + struct.pack("<I", len(short) - 8) + short[8:]
    # a real encoder records the TRUE frame count in the fact chunk
    j = short.index(b"fact")
    short = short[: j + 8] + struct.pack("<I", 9) + short[j + 12 :]
    _r, _c, _b, cut = wav_decode_samples(short)
    # frame0 + 8 nibbles from the surviving word
    assert cut == full[:9]
