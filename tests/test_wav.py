"""WAV codec unit tests: hand-computed header golden, chunk-walk
tolerance, and rejections. The container is transparent (no entropy
coding), so these pin it completely."""

from __future__ import annotations

import struct

import pytest

from wrf_to_geodataframe_spark.sources.wav import (
    decode_wav,
    encode_wav,
    wav_info,
)


def test_header_golden_bytes():
    """A 2-frame mono 16-bit 16kHz file has a fully hand-computable
    44-byte header."""
    pcm = struct.pack("<hh", -1, 32000)
    b = encode_wav(pcm, 1, 16_000, 16)
    assert b[:4] == b"RIFF"
    assert struct.unpack("<I", b[4:8])[0] == 36 + 4
    assert b[8:12] == b"WAVE"
    assert b[12:16] == b"fmt "
    # fmt: size 16, PCM, 1 ch, 16000 Hz, 32000 B/s, align 2, 16 bit
    assert struct.unpack("<IHHIIHH", b[16:36]) == (
        16, 1, 1, 16_000, 32_000, 2, 16,
    )
    assert b[36:40] == b"data" and struct.unpack("<I", b[40:44])[0] == 4
    assert b[44:] == pcm


def test_round_trips_and_info():
    for ch, bits, n in [(1, 16, 7), (2, 16, 5), (1, 8, 9), (2, 8, 3)]:
        frame = ch * bits // 8
        pcm = bytes(range(17, 17 + n * frame))
        b = encode_wav(pcm, ch, 44_100, bits)
        assert decode_wav(b) == (ch, 44_100, n, pcm)
        info = wav_info(b)
        assert (info["channels"], info["bits"], info["n_frames"]) == (
            ch, bits, n,
        )


def test_extra_chunks_tolerated_and_word_alignment():
    """LIST/fact chunks before data — including an ODD-sized chunk
    whose pad byte must be skipped — do not disturb parsing."""
    pcm = struct.pack("<hh", 5, -5)
    base = encode_wav(pcm, 1, 8_000, 16)
    fmt_chunk = base[12:36]
    data_chunk = base[36:]
    odd = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    body = fmt_chunk + odd + b"fact" + struct.pack("<I", 4) + b"\x02\x00\x00\x00" + data_chunk
    blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    assert decode_wav(blob) == (1, 8_000, 2, pcm)


def test_rejections():
    good = encode_wav(b"\x00\x00", 1, 8_000, 16)
    with pytest.raises(ValueError, match="not a WAV"):
        decode_wav(b"RIFX" + good[4:])
    with pytest.raises(ValueError, match="missing fmt"):
        decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    bad = bytearray(good)
    bad[20] = 3  # audio format 3 = IEEE float
    with pytest.raises(ValueError, match="not PCM"):
        decode_wav(bytes(bad))
    with pytest.raises(ValueError, match="whole number"):
        encode_wav(b"\x00", 1, 8_000, 16)
    with pytest.raises(ValueError, match="channels"):
        encode_wav(b"\x00\x00", 0, 8_000, 16)  # ADVICE r6: not ZeroDivision
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(good[:-1])


def test_hypothesis_round_trip_fuzz():
    """Property: any PCM buffer round-trips at 8/16-bit, any channel
    count and rate (VERDICT r6 #8)."""
    from hypothesis import given, settings, strategies as st

    from wrf_to_geodataframe_spark.sources.wav import decode_wav, encode_wav

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(1, 6), st.sampled_from([8, 16]),
        st.integers(0, 300), st.sampled_from([8_000, 44_100, 48_000]),
        st.randoms(use_true_random=False),
    )
    def prop(channels, bits, frames, rate, rnd):
        frame = channels * bits // 8
        pcm = bytes(rnd.randrange(256) for _ in range(frames * frame))
        b = encode_wav(pcm, channels, rate, bits)
        assert decode_wav(b) == (channels, rate, frames, pcm)

    prop()
