"""Pure-stdlib WAV (RIFF/WAVE PCM) codec for the multimodal audio path.

North-star multimodal surface (no reference counterpart): audio
corpora overwhelmingly interchange uncompressed PCM in WAV containers,
so the engine's audio plumbing decodes/encodes it natively.
Implemented from the public RIFF/WAVE format description (Microsoft/
IBM, 1991):

- ``wav_info``: container triage — channels, sample rate, bit depth,
  frame count — via the chunk walk, without touching sample data.
- ``decode_wav``: 8-bit unsigned / 16-bit signed LE PCM, mono or
  multi-channel (interleaved frames), tolerant of extra chunks (LIST,
  fact, cue) before/after ``data`` and of the fmt extension field.
- ``encode_wav``: canonical 44-byte-header writer.

The format is a transparent container (no entropy coding), so the
hand-computed header goldens + round-trips in ``tests/test_wav.py``
pin it completely.  Runs inside Arrow ``mapInPandas`` batches via
``operators/multimodal.py`` like the image codecs.
"""

from __future__ import annotations

import struct


def _chunks(b: bytes):
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV stream")
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WAV: short chunk")
        yield cid, body
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def _parse(b: bytes):
    fmt = data = None
    for cid, body in _chunks(b):
        if cid == b"fmt " and fmt is None:
            if len(body) < 16:
                raise ValueError("truncated WAV: short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data" and data is None:
            data = body
    if fmt is None or data is None:
        raise ValueError("corrupt WAV: missing fmt or data chunk")
    audio_format, channels, rate, _byte_rate, _align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"unsupported WAV: format {audio_format} (not PCM)")
    if bits not in (8, 16):
        raise ValueError(f"unsupported WAV: {bits}-bit samples")
    if channels < 1:
        raise ValueError("corrupt WAV: zero channels")
    return channels, rate, bits, data


def wav_info(b: bytes) -> dict:
    channels, rate, bits, data = _parse(b)
    return {
        "channels": channels,
        "sample_rate": rate,
        "bits": bits,
        "n_frames": len(data) // (channels * bits // 8),
    }


def decode_wav(b: bytes) -> tuple[int, int, int, bytes]:
    """(channels, sample_rate, n_frames, pcm) with pcm the raw
    interleaved sample bytes (16-bit stays LE int16; 8-bit stays
    unsigned — the caller interprets via the returned bit depth in
    ``wav_info`` or the buffer length)."""
    channels, rate, bits, data = _parse(b)
    frame = channels * bits // 8
    n = len(data) // frame
    return channels, rate, n, data[: n * frame]


def encode_wav(
    pcm: bytes, channels: int, sample_rate: int, bits: int = 16
) -> bytes:
    if bits not in (8, 16):
        raise ValueError(f"bits must be 8 or 16, got {bits}")
    if channels < 1:
        raise ValueError(f"channels must be >= 1, got {channels}")
    frame = channels * bits // 8
    if len(pcm) % frame:
        raise ValueError("pcm length is not a whole number of frames")
    byte_rate = sample_rate * frame
    out = bytearray()
    out += b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    out += b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, frame, bits
    )
    out += b"data" + struct.pack("<I", len(pcm)) + pcm
    return bytes(out)
