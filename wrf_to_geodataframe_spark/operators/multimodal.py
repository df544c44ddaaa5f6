"""Multimodal column plumbing (brief north-star): images/audio/video as
opaque ``binary`` columns with typed metadata, processed in Arrow
batches via ``mapInPandas``.

The DECODE step is REAL for PNG: ``sources/png.py`` is a pure-stdlib
codec (zlib inflate + all five scanline unfilters), so
``decode=True`` / ``decode_images`` decode actual PNG payloads inside
Arrow batches — no pillow/cv2 needed.  Other formats (jpeg/webp/audio)
still raise ``ValueError`` naming the missing codec.  A deterministic
fake payload (md5 bytes of the document text) stands in for real media
where only plumbing is exercised.

At scale: binary payloads ride the normal columnar path (parquet BYTE_ARRAY,
Arrow Binary); ``mapInPandas`` keeps one Python worker per core fed with
batches, and ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds
per-batch memory for large blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", LongType()),
        StructField("byte_sum", LongType()),
    ]
)


def attach_fake_payload(docs: DataFrame) -> DataFrame:
    """Attach a deterministic binary payload + typed metadata to each
    document (md5 digest bytes as the stand-in "image")."""
    return docs.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("payload"),
        F.element_at(
            F.array(F.lit("png"), F.lit("jpeg"), F.lit("webp")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("fmt"),
        (F.lit(16) + F.col("doc_id") % 5).cast("long").alias("width"),
        (F.lit(16) + F.col("doc_id") % 7).cast("long").alias("height"),
    )


def attach_fake_image(docs: DataFrame) -> DataFrame:
    """Attach a deterministic width*height single-channel byte grid per
    document (md5-chained blocks of the text, truncated to w*h bytes) —
    the raw-image stand-in that the resize / frame-sample kernels
    operate on.  Real deployments replace this column with decoded
    pixels; everything downstream is unchanged."""
    w = (F.lit(16) + F.col("doc_id") % 5).cast("long")
    h = (F.lit(16) + F.col("doc_id") % 7).cast("long")
    # 28 blocks x 16 bytes covers the max 20x22 grid
    blocks = F.concat(
        *[
            F.unhex(F.md5(F.concat(F.col("text"), F.lit(f":{b}"))))
            for b in range(28)
        ]
    )
    return docs.select(
        "doc_id", w.alias("width"), h.alias("height"), blocks.alias("_blocks")
    ).select(
        "doc_id",
        "width",
        "height",
        F.expr("substring(_blocks, 1, CAST(width * height AS INT))").alias(
            "pixels"
        ),
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_w", LongType()),
        StructField("out_h", LongType()),
        StructField("pixels", BinaryType()),
    ]
)


def resize_images(
    with_image: DataFrame, out_w: int = 8, out_h: int = 8
) -> DataFrame:
    """Nearest-neighbor resize of the raw byte grid to (out_w, out_h),
    vectorized with numpy inside Arrow batches (the slot a real
    pillow/cv2 resize drops into; the index arithmetic IS the real
    nearest-neighbor kernel)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out_rows = []
            for doc_id, w, h, px in zip(
                pdf["doc_id"], pdf["width"], pdf["height"], pdf["pixels"]
            ):
                img = np.frombuffer(px, dtype=np.uint8)[: w * h].reshape(
                    int(h), int(w)
                )
                yi = (np.arange(out_h) * int(h)) // out_h
                xi = (np.arange(out_w) * int(w)) // out_w
                out_rows.append(img[yi][:, xi].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "out_w": out_w,
                    "out_h": out_h,
                    "pixels": out_rows,
                }
            )

    return with_image.mapInPandas(_batches, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(with_image: DataFrame, stride: int = 2) -> DataFrame:
    """Frame sampling for "video" payloads: each byte-grid row is one
    frame of ``width`` bytes; emit every ``stride``-th frame as its own
    output row (a mapInPandas generator can fan out rows, which is
    exactly the explode-shaped plumbing a real frame sampler needs)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, w, h, px in zip(
                pdf["doc_id"], pdf["width"], pdf["height"], pdf["pixels"]
            ):
                img = np.frombuffer(px, dtype=np.uint8)[: w * h].reshape(
                    int(h), int(w)
                )
                for fi in range(0, int(h), stride):
                    ids.append(int(doc_id))
                    idxs.append(fi)
                    frames.append(img[fi].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame": frames,
                }
            )

    return with_image.mapInPandas(_batches, FRAME_SCHEMA)


def extract_features(with_payload: DataFrame, decode: bool = False) -> DataFrame:
    """Vectorized per-batch feature extraction over the binary column.

    ``decode=False`` computes byte-level features (length, first byte,
    byte sum) with numpy over the raw Arrow batch.  ``decode=True``
    runs the real codecs (PNG, baseline JPEG, or lossless AND lossy
    WebP, dispatched on magic bytes like :func:`decode_images`) on
    each payload and computes the same features over the DECODED pixel
    buffer — remaining gaps (avif, VP8X animation) raise
    ``ValueError`` naming the gap."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from wrf_to_geodataframe_spark.sources.bmp import (
            decode_bmp,
            decode_pnm,
        )
        from wrf_to_geodataframe_spark.sources.gif import decode_gif
        from wrf_to_geodataframe_spark.sources.jpeg import decode_jpeg
        from wrf_to_geodataframe_spark.sources.png import decode_png
        from wrf_to_geodataframe_spark.sources.tiff import decode_tiff
        from wrf_to_geodataframe_spark.sources.webp import decode_webp

        def _buf(b: bytes) -> bytes:
            if not decode:
                return bytes(b)
            b = bytes(b)
            if b[:8] == b"\x89PNG\r\n\x1a\n":
                return decode_png(b)[3]
            if b[:2] == b"\xff\xd8":
                return decode_jpeg(b)[3]
            if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
                return decode_webp(b)[3]
            if b[:4] == b"GIF8":
                return decode_gif(b)[3]
            if b[:4] in (b"II\x2a\x00", b"MM\x00\x2a"):
                return decode_tiff(b)[3]
            if b[:2] == b"BM":
                return decode_bmp(b)[3]
            if b[:2] in (b"P5", b"P6"):
                return decode_pnm(b)[3]
            raise ValueError(
                "unknown image container "
                "(not PNG/JPEG/WebP/GIF/TIFF/BMP/PNM)"
            )

        for pdf in it:
            payloads = pdf["payload"].map(_buf)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(
                        lambda b: int(b[0]) if len(b) else -1
                    ).astype("int64"),
                    "byte_sum": payloads.map(
                        lambda b: int(np.frombuffer(b, dtype=np.uint8).sum())
                    ).astype("int64"),
                }
            )

    return with_payload.mapInPandas(_batches, FEATURE_SCHEMA)


PNG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("png", BinaryType()),
    ]
)

DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("pixels", BinaryType()),
    ]
)


def encode_images(with_image: DataFrame, cycle_filters: bool = True) -> DataFrame:
    """Encode each raw byte grid as a REAL grayscale PNG inside Arrow
    batches (``sources/png.py``).  ``cycle_filters`` applies scanline
    filter ``y % 5`` so every PNG exercises all five filter types —
    the round-trip gate row then hash-checks every unfilter branch."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from wrf_to_geodataframe_spark.sources.png import encode_png

        ft = (lambda y: y % 5) if cycle_filters else 0
        for pdf in it:
            out = [
                encode_png(bytes(px), int(w), int(h), 1, ft)
                for w, h, px in zip(pdf["width"], pdf["height"], pdf["pixels"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pdf["width"].astype("int64"),
                    "height": pdf["height"].astype("int64"),
                    "png": out,
                }
            )

    return with_image.mapInPandas(_batches, PNG_SCHEMA)


def encode_images_jpeg_tiles(base: DataFrame) -> DataFrame:
    """Encode per-doc constant-tile grayscale JPEGs inside Arrow
    batches: the input carries (doc_id, width, height, raw) with width/
    height multiples of 8 and one byte per 8x8 block in ``raw``; each
    block is filled with its byte value FORCED EVEN (``& 0xFE``) — the
    codec's bit-exact corner (see ``sources/jpeg.py``), so the decoded
    pixels have a closed-form the oracle can state."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from wrf_to_geodataframe_spark.sources.jpeg import (
            encode_jpeg,
            encode_jpeg_arith,
            encode_jpeg_arith_progressive,
            encode_jpeg_progressive,
        )

        for pdf in it:
            outs = []
            for d, w, h, raw in zip(
                pdf["doc_id"], pdf["width"], pdf["height"], pdf["raw"]
            ):
                w, h, raw = int(w), int(h), bytes(raw)
                bw = w // 8
                img = np.zeros((h, w), np.uint8)
                for bi in range(bw * (h // 8)):
                    by, bx = divmod(bi, bw)
                    img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = (
                        raw[bi] & 0xFE
                    )
                # cycle encodings so ALL FOUR entropy decode
                # pipelines (baseline/progressive Huffman, sequential/
                # progressive ARITHMETIC QM-coded) sit on the hash
                # path — the closed-form decoded pixels are entropy-
                # layer-agnostic
                enc = [encode_jpeg, encode_jpeg_progressive,
                       encode_jpeg_arith,
                       encode_jpeg_arith_progressive][int(d) % 4]
                outs.append(enc(img.tobytes(), w, h, 1))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pdf["width"].astype("int64"),
                    "height": pdf["height"].astype("int64"),
                    "png": outs,
                }
            )

    return base.mapInPandas(_batches, PNG_SCHEMA)


def encode_images_webp(base: DataFrame) -> DataFrame:
    """Encode per-doc RGBA grids as lossless WebP (VP8L) inside Arrow
    batches: input carries (doc_id, width, height, raw) with raw =
    width*height*4 RGBA bytes; odd docs use the subtract-green
    transform so both entropy paths sit on the hash path.  Lossless,
    so decode(encode(x)) == x and the oracle can state the pixels in
    closed form."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from wrf_to_geodataframe_spark.sources.webp import encode_webp

        for pdf in it:
            outs = []
            for d, w, h, raw in zip(
                pdf["doc_id"], pdf["width"], pdf["height"], pdf["raw"]
            ):
                w, h = int(w), int(h)
                outs.append(
                    encode_webp(
                        bytes(raw)[: 4 * w * h], w, h,
                        subtract_green=bool(int(d) % 2),
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pdf["width"].astype("int64"),
                    "height": pdf["height"].astype("int64"),
                    "png": outs,
                }
            )

    return base.mapInPandas(_batches, PNG_SCHEMA)


def encode_images_gif(base: DataFrame) -> DataFrame:
    """Encode per-doc palette-index grids as real single-frame GIF89a
    streams inside Arrow batches (``sources/gif.py``): input carries
    (doc_id, width, height, hexidx) with hexidx a hex string whose i-th
    character is pixel i's index into the 16-color ``MM_PALETTE``; odd
    docs are written interlaced, so both row orders sit on the hash
    path.  GIF is lossless over palette indices, so decode(encode(x))
    maps each nibble through the palette — a closed-form oracle."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from wrf_to_geodataframe_spark.sources.gif import encode_gif

        pal = b"".join(MM_PALETTE)
        for pdf in it:
            outs = []
            for d, w, h, hx in zip(
                pdf["doc_id"], pdf["width"], pdf["height"], pdf["hexidx"]
            ):
                w, h = int(w), int(h)
                idx = bytes(int(c, 16) for c in hx[: w * h])
                outs.append(
                    encode_gif(idx, w, h, pal, interlace=bool(int(d) % 2))
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pdf["width"].astype("int64"),
                    "height": pdf["height"].astype("int64"),
                    "png": outs,
                }
            )

    return base.mapInPandas(_batches, PNG_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("peak_abs", LongType()),
        StructField("sum_abs", LongType()),
        StructField("zero_crossings", LongType()),
        StructField("rms_milli", LongType()),
    ]
)


def encode_audio_wav(base: DataFrame) -> DataFrame:
    """Wrap per-doc raw int16-LE PCM bytes as real mono 16 kHz WAV
    containers inside Arrow batches (``sources/wav.py``): input
    carries (doc_id, pcm); output replaces it with the container
    bytes in ``payload``."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from wrf_to_geodataframe_spark.sources.wav import encode_wav

        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": [
                        encode_wav(bytes(p), 1, 16_000, 16)
                        for p in pdf["pcm"]
                    ],
                }
            )

    return base.mapInPandas(
        _batches,
        StructType(
            [
                StructField("doc_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )


def audio_features(with_wav: DataFrame) -> DataFrame:
    """Decode WAV payloads and extract the classic audio-curation
    features, all as EXACT integers (so a SQL oracle can replay them
    bit-for-bit): frame count, peak absolute amplitude, absolute-sum,
    zero-crossing count (sign transitions with 0 counted as
    non-negative), and integer-milli RMS = floor(1000 * sqrt(sum(x^2)
    / n)).  numpy-vectorized inside Arrow batches — the shape a real
    loudness/silence filter over 100 TB of audio uses."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from wrf_to_geodataframe_spark.sources.wav import decode_wav

        for pdf in it:
            rows = {k: [] for k in (
                "doc_id", "n_frames", "peak_abs", "sum_abs",
                "zero_crossings", "rms_milli",
            )}
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                ch, _rate, n, pcm = decode_wav(bytes(payload))
                x = np.frombuffer(pcm, dtype="<i2").astype(np.int64)
                nonneg = x >= 0
                rows["doc_id"].append(int(d))
                rows["n_frames"].append(n)
                rows["peak_abs"].append(int(np.abs(x).max()) if n else 0)
                rows["sum_abs"].append(int(np.abs(x).sum()))
                rows["zero_crossings"].append(
                    int((nonneg[1:] != nonneg[:-1]).sum()) if n > 1 else 0
                )
                rows["rms_milli"].append(
                    int(1000.0 * float(np.sqrt((x * x).sum() / n)))
                    if n else 0
                )
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in rows.items()}
            )

    return with_wav.mapInPandas(_batches, AUDIO_SCHEMA)


def encode_images_tiff(base: DataFrame) -> DataFrame:
    """Encode per-doc RGB grids as real TIFFs inside Arrow batches
    (``sources/tiff.py``): input carries (doc_id, width, height, raw)
    with raw = width*height*3 RGB bytes; the compression cycles
    none/LZW/Deflate/PackBits by doc_id % 4 (odd docs add the
    horizontal predictor, doc_id % 5 == 0 flips to big-endian), so
    every strip codec sits on the hash path.  Lossless, so
    decode(encode(x)) == x and the oracle states pixels in closed
    form."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from wrf_to_geodataframe_spark.sources.tiff import encode_tiff

        for pdf in it:
            outs = []
            for d, w, h, raw in zip(
                pdf["doc_id"], pdf["width"], pdf["height"], pdf["raw"]
            ):
                d, w, h = int(d), int(w), int(h)
                comp = [1, 5, 8, 32773][d % 4]
                pred = 2 if (d % 2 and comp in (5, 8)) else 1
                outs.append(
                    encode_tiff(
                        bytes(raw)[: 3 * w * h], w, h, 3,
                        compression=comp, predictor=pred,
                        rows_per_strip=4, big_endian=d % 5 == 0,
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pdf["width"].astype("int64"),
                    "height": pdf["height"].astype("int64"),
                    "png": outs,
                }
            )

    return base.mapInPandas(_batches, PNG_SCHEMA)


# deterministic 16-color palette shared with the oracle SQL literal in
# suite/pipeline.py (color k = first 3 md5 bytes of "pal:k")
def _mm_palette() -> list[bytes]:
    import hashlib

    return [hashlib.md5(f"pal:{k}".encode()).digest()[:3] for k in range(16)]


MM_PALETTE = _mm_palette()


def encode_images_formats(with_image: DataFrame) -> DataFrame:
    """Encode each raw byte grid as a PNG in a per-doc FORMAT (the
    format mix a real crawl corpus contains), filters cycling y % 5 in
    every format so each unfilter branch runs at each depth:

    - fmt 0 -> palette (color type 3), 16 md5-derived colors,
      indices = byte % 16
    - fmt 1 -> 16-bit grayscale, the raw bytes as big-endian sample
      pairs (input must carry 2*w*h bytes)
    - fmt 2 -> 4-bit grayscale, values = byte % 16 (bit-packed)

    Input columns: doc_id, width, height, fmt, raw (binary)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from wrf_to_geodataframe_spark.sources.png import encode_png

        palette = [tuple(c) for c in MM_PALETTE]

        def ft(y):
            return y % 5

        for pdf in it:
            outs = []
            for fmt, w, h, raw in zip(
                pdf["fmt"], pdf["width"], pdf["height"], pdf["raw"]
            ):
                w, h, raw = int(w), int(h), bytes(raw)
                if fmt == 0:
                    idx = bytes(b % 16 for b in raw[: w * h])
                    outs.append(encode_png(idx, w, h, 1, ft, palette=palette))
                elif fmt == 1:
                    outs.append(
                        encode_png(raw[: 2 * w * h], w, h, 1, ft, bit_depth=16)
                    )
                else:
                    vals = bytes(b % 16 for b in raw[: w * h])
                    outs.append(encode_png(vals, w, h, 1, ft, bit_depth=4))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pdf["width"].astype("int64"),
                    "height": pdf["height"].astype("int64"),
                    "png": outs,
                }
            )

    return with_image.mapInPandas(_batches, PNG_SCHEMA)


def decode_images(with_png: DataFrame) -> DataFrame:
    """Decode an image binary column back to pixel buffers + dimensions
    read from the container header (NOT trusted from the input columns)
    inside Arrow batches.  Dispatches on magic bytes — PNG signature ->
    ``sources/png.py``, JPEG SOI -> ``sources/jpeg.py``, RIFF/WEBP ->
    ``sources/webp.py`` (VP8L) — the mixed-format shape of a real
    crawl corpus."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from wrf_to_geodataframe_spark.sources.bmp import (
            decode_bmp,
            decode_pnm,
        )
        from wrf_to_geodataframe_spark.sources.avif import (
            decode_avif,
            is_avif,
        )
        from wrf_to_geodataframe_spark.sources.gif import decode_gif
        from wrf_to_geodataframe_spark.sources.jpeg import decode_jpeg
        from wrf_to_geodataframe_spark.sources.png import decode_png
        from wrf_to_geodataframe_spark.sources.tiff import decode_tiff
        from wrf_to_geodataframe_spark.sources.webp import decode_webp

        def _decode(b: bytes):
            if b[:8] == b"\x89PNG\r\n\x1a\n":
                return decode_png(b)
            if b[:2] == b"\xff\xd8":
                return decode_jpeg(b)
            if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
                return decode_webp(b)
            if b[:4] == b"GIF8":
                return decode_gif(b)
            if b[:4] in (b"II\x2a\x00", b"MM\x00\x2a"):
                return decode_tiff(b)
            if b[:2] == b"BM":
                return decode_bmp(b)
            if b[:2] in (b"P5", b"P6"):
                return decode_pnm(b)
            if is_avif(b):
                return decode_avif(b)  # gated on system libavif
            raise ValueError(
                "unknown image container "
                "(not PNG/JPEG/WebP/GIF/TIFF/BMP/PNM/AVIF)"
            )

        for pdf in it:
            ws, hs, cs, pxs = [], [], [], []
            for blob in pdf["png"]:
                w, h, c, px = _decode(bytes(blob))
                ws.append(w)
                hs.append(h)
                cs.append(c)
                pxs.append(px)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pd.Series(ws, dtype="int64"),
                    "height": pd.Series(hs, dtype="int64"),
                    "channels": pd.Series(cs, dtype="int64"),
                    "pixels": pxs,
                }
            )

    return with_png.mapInPandas(_batches, DECODE_SCHEMA)


def ahash_bands(buffers, side: int = 16):
    """Integer-exact 8x8 AVERAGE-HASH over a batch of equal-sized
    square grayscale pixel buffers, returned as eight 8-bit BANDS per
    image (the LSH banding unit of the perceptual near-dup family:
    Hamming <= 2 on the 64-bit hash leaves >= 6 of 8 bands identical,
    so a banded equi join is EXACT for that radius).

    The hash is the classic aHash (block mean vs global mean) kept in
    INTEGER arithmetic so the oracle can restate it exactly:
    ``bit = 64 * block_sum >= total`` — no float mean, no rounding
    drift.  Bit k of band j is hash bit ``j*8 + k`` (little bit
    order), matching the analytic SQL oracles.

    Vectorized across the whole Arrow batch: one ``frombuffer`` stack,
    one blocked ``sum``, one ``np.packbits`` — no per-image Python
    loop (this kernel sits inside the PNG-decode hot path of
    ``dedup_image_ahash`` and the frame fan-out of
    ``video_scene_cuts``).

    Returns an ``(n, 8)`` int64 array; ``.tolist()`` gives the
    ``array<long>`` column value per row.
    """
    import numpy as np

    n = len(buffers)
    if n == 0:
        return np.empty((0, 8), dtype="int64")
    blk = side // 8
    if blk * 8 != side:
        raise ValueError(f"ahash_bands needs side % 8 == 0, got {side}")
    bufs = [bytes(b) for b in buffers]
    want = side * side
    for i, b in enumerate(bufs):
        if len(b) != want:
            raise ValueError(
                f"ahash_bands: buffer {i} is {len(b)} bytes, expected "
                f"{want} ({side}x{side}) — a total-length check alone "
                "would let mismatched sizes shift pixels across images"
            )
    raw = b"".join(bufs)
    a = np.frombuffer(raw, "uint8").astype("int64")
    a = a.reshape(n, side, side)
    bs = a.reshape(n, 8, blk, 8, blk).sum(axis=(2, 4)).reshape(n, 64)
    total = a.reshape(n, -1).sum(axis=1)
    bits = (bs * 64 >= total[:, None]).astype("uint8")
    return (
        np.packbits(bits.reshape(n, 8, 8), axis=-1, bitorder="little")
        .reshape(n, 8)
        .astype("int64")
    )
