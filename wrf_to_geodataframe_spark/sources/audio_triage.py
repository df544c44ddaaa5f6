"""Compressed-audio container triage: MP3, Ogg, native FLAC.

North-star multimodal surface: an audio-corpus pipeline must triage
the compressed formats it crawls — sample rate, channels, duration —
without decoding audio frames (payload decode is out of scope, the
role ``video.py`` plays for MP4/MKV).  Implemented from the public
MPEG-1/2 audio frame header layout, the Ogg page format (RFC 3533)
with the Vorbis/Opus identification headers, and the FLAC STREAMINFO
metadata block:

- ``mp3_info``: skips an ID3v2 tag (syncsafe size), finds the first
  frame sync, decodes version/layer/bitrate/samplerate/mode from the
  4-byte header, and estimates duration assuming CBR (stated in the
  result as ``cbr_estimate``).
- ``ogg_info``: first-page walk — capture pattern, stream serial,
  first packet magic → codec; Vorbis/Opus id headers → channels +
  input sample rate; last-page granule position (when the buffer holds
  the whole stream) → duration for Vorbis (granule = PCM samples).
- ``flac_info``: "fLaC" marker + STREAMINFO — sample rate, channels,
  bits per sample, total samples, duration.
"""

from __future__ import annotations

import struct

_MP3_BITRATES = {
    # (version_key, layer): list indexed by bitrate bits 1..14, kbps
    ("v1", 3): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
                384, 416, 448],
    ("v1", 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
                320, 384],
    ("v1", 1): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                256, 320],
    ("v2", 3): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
                224, 256],
    ("v2", 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
                160],
    ("v2", 1): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
                160],
}

_MP3_RATES = {"v1": [44100, 48000, 32000], "v2": [22050, 24000, 16000],
              "v25": [11025, 12000, 8000]}


def mp3_info(b: bytes) -> dict:
    pos = 0
    if b[:3] == b"ID3":
        if len(b) < 10:
            raise ValueError("truncated MP3: short ID3v2 header")
        size = 0
        for v in b[6:10]:
            size = (size << 7) | (v & 0x7F)  # syncsafe
        pos = 10 + size
    # find frame sync
    while pos + 4 <= len(b):
        if b[pos] == 0xFF and (b[pos + 1] & 0xE0) == 0xE0:
            break
        pos += 1
    else:
        raise ValueError("not an MP3: no frame sync")
    h = struct.unpack(">I", b[pos : pos + 4])[0]
    ver_bits = (h >> 19) & 3
    layer = 4 - ((h >> 17) & 3)
    if ver_bits == 1 or (h >> 17) & 3 == 0:
        raise ValueError("corrupt MP3: reserved version/layer")
    version = {0: "v25", 2: "v2", 3: "v1"}[ver_bits]
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        raise ValueError("unsupported MP3: free/reserved bitrate or rate")
    vkey = "v1" if version == "v1" else "v2"
    bitrate = _MP3_BITRATES[(vkey, 4 - layer)][br_idx - 1] * 1000
    rate = _MP3_RATES[version][sr_idx]
    mode = (h >> 6) & 3
    channels = 1 if mode == 3 else 2
    spf = 384 if layer == 1 else (
        1152 if layer == 2 or version == "v1" else 576
    )
    audio_bytes = len(b) - pos
    duration_ms = audio_bytes * 8 * 1000 // bitrate
    return {
        "version": version,
        "layer": layer,
        "bitrate": bitrate,
        "sample_rate": rate,
        "channels": channels,
        "samples_per_frame": spf,
        "duration_ms": duration_ms,
        "cbr_estimate": True,
    }


def _ogg_pages(b: bytes):
    pos = 0
    while pos + 27 <= len(b):
        if b[pos : pos + 4] != b"OggS":
            raise ValueError("corrupt Ogg: bad capture pattern")
        htype = b[pos + 5]
        (granule,) = struct.unpack("<q", b[pos + 6 : pos + 14])
        (serial,) = struct.unpack("<I", b[pos + 14 : pos + 18])
        nseg = b[pos + 26]
        segs = b[pos + 27 : pos + 27 + nseg]
        if len(segs) < nseg:
            raise ValueError("truncated Ogg: short segment table")
        body_len = sum(segs)
        body = b[pos + 27 + nseg : pos + 27 + nseg + body_len]
        if len(body) < body_len:
            raise ValueError("truncated Ogg: short page body")
        yield htype, granule, serial, body
        pos += 27 + nseg + body_len


def ogg_info(b: bytes) -> dict:
    if b[:4] != b"OggS":
        raise ValueError("not an Ogg stream")
    codec = None
    channels = None
    rate = None
    last_granule = None
    for i, (htype, granule, serial, body) in enumerate(_ogg_pages(b)):
        if i == 0:
            if not htype & 0x02:
                raise ValueError("corrupt Ogg: first page not BOS")
            if body.startswith(b"\x01vorbis"):
                codec = "vorbis"
                channels = body[11]
                (rate,) = struct.unpack("<I", body[12:16])
            elif body.startswith(b"OpusHead"):
                codec = "opus"
                channels = body[9]
                (rate,) = struct.unpack("<I", body[12:16])
            elif body.startswith(b"\x7fFLAC"):
                codec = "flac"
            elif body.startswith(b"\x80theora"):
                codec = "theora"
            else:
                codec = "unknown"
        if granule >= 0:
            last_granule = granule
    out = {"codec": codec, "channels": channels, "sample_rate": rate,
           "duration_ms": None}
    if codec == "vorbis" and last_granule and rate:
        out["duration_ms"] = last_granule * 1000 // rate
    elif codec == "opus" and last_granule is not None:
        out["duration_ms"] = last_granule * 1000 // 48_000
    return out


def flac_info(b: bytes) -> dict:
    if b[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    if len(b) < 8 + 34:
        raise ValueError("truncated FLAC: no STREAMINFO")
    btype = b[4] & 0x7F
    (size,) = struct.unpack(">I", b"\x00" + b[5:8])
    if btype != 0 or size < 34:
        raise ValueError("corrupt FLAC: first block is not STREAMINFO")
    si = b[8 : 8 + 34]
    rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
    channels = ((si[12] >> 1) & 0x07) + 1
    bits = (((si[12] & 1) << 4) | (si[13] >> 4)) + 1
    total = ((si[13] & 0x0F) << 32) | struct.unpack(">I", si[14:18])[0]
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
        "total_samples": total,
        "duration_ms": total * 1000 // rate if rate else None,
    }
