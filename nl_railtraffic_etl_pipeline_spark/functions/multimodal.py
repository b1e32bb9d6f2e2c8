"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` (the only place Python touches the data — everything before
and after stays JVM-side).  The decode itself is STUBBED deterministically
(no image/audio libraries in this environment, see ``decode_image_meta``);
the Spark-side plumbing — schema, batch iteration, partitioning — is real
and oracle-tested.

At 100 TB: binary columns ride in parquet alongside metadata, so filters on
metadata (format, size, dims) prune row groups WITHOUT decoding payloads;
``mapInPandas`` batches bound Python memory via
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Output schema of the stubbed decoder.
IMAGE_META = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def with_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Attach a deterministic binary payload column (UTF-8 bytes of the
    text — the stand-in for real image bytes) plus a media-type tag."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decoder: real implementations would call PIL/ffmpeg here.

    Deterministic fake: dimensions derived from the byte length, so the
    full Arrow round-trip (binary in, typed struct out) is exercised and
    oracle-checkable.  Raises nothing — a real decoder would quarantine
    failures into a null row instead of failing the task.
    """
    for pdf in batches:
        n = pdf["payload"].map(len).astype("int32")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n,
                "width": (n % 64 + 1).astype("int32"),
                "height": (n // 64 % 64 + 1).astype("int32"),
                "format": "fake",
            }
        )


def decode_image_meta(df_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched decode of binary payloads into typed image metadata."""
    return df_with_payload.select("doc_id", "payload").mapInPandas(
        _decode_batch, IMAGE_META
    )


#: JPEG start-of-frame markers that carry dimensions (SOF0-SOF15 minus the
#: non-frame DHT/JPG/DAC markers C4/C8/CC).
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _parse_header(b: bytes) -> tuple[int | None, int | None, str | None]:
    """(width, height, format) from REAL image container bytes.

    Pure byte parsing of the three dominant web-image containers — no
    media library needed, which is exactly why header metadata extraction
    does NOT belong behind the stubbed pixel decoder:

    - PNG: 8-byte signature, then IHDR payload at offset 16 holds
      big-endian u32 width/height (PNG spec, RFC 2083 §4.1.1).
    - JPEG: walk the FF-marker segment chain to the first SOFn frame
      header; its payload is [precision u8][height u16][width u16]
      big-endian (ITU T.81 §B.2.2).  Standalone markers (D0-D7 RST, 01
      TEM, D8 SOI) carry no length word.
    - GIF: 6-byte version signature, then little-endian u16 logical
      screen width/height (GIF89a spec §18).

    Unknown container / truncated header -> (None, None, None): the
    quarantine row, never an exception (a poisoned payload must not kill
    the task).
    """
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        return (
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
            "png",
        )
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xFF:
                i += 1
                continue
            if marker in _JPEG_SOF:
                return (
                    int.from_bytes(b[i + 7 : i + 9], "big"),
                    int.from_bytes(b[i + 5 : i + 7], "big"),
                    "jpeg",
                )
            i += 2 + int.from_bytes(b[i + 2 : i + 4], "big")
        return (None, None, "jpeg")
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        return (
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
            "gif",
        )
    return (None, None, None)


def _header_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        parsed = [_parse_header(bytes(p)) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "width": pd.array([p[0] for p in parsed], dtype="Int32"),
                "height": pd.array([p[1] for p in parsed], dtype="Int32"),
                "format": [p[2] for p in parsed],
            }
        )


def parse_image_headers(df_with_payload: DataFrame) -> DataFrame:
    """REAL image-metadata extraction from binary payloads: PNG / JPEG /
    GIF dimensions parsed directly from container bytes (see
    :func:`_parse_header`) — the production upgrade over the documented
    :func:`decode_image_meta` stub for everything that does not require
    pixel access.  Pixel-level decode (resize, embedding) still needs an
    image library and remains stubbed in this environment.

    Same Arrow ``mapInPandas`` shape as the stub: binary in, typed struct
    out, malformed payloads quarantined as null dims, Python memory
    bounded by ``arrow.maxRecordsPerBatch``.  Headers live in the first
    few hundred bytes, so at 100 TB this pairs with a payload-prefix
    column (store the first 1 KB beside the full blob) to parse metadata
    without ever reading full payload row groups.
    """
    return df_with_payload.select("doc_id", "payload").mapInPandas(
        _header_batch, IMAGE_META
    )


def sample_frames(
    df_with_payload: DataFrame, every_n_bytes: int = 97
) -> DataFrame:
    """Frame-sampling stand-in: take every Nth byte of the payload as a
    'frame' marker — demonstrates the explode-from-binary pattern used for
    video frame extraction (JVM-side, no Python)."""
    n = F.length("payload")
    idx = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(every_n_bytes))
    return df_with_payload.select(
        "doc_id",
        F.posexplode(idx).alias("frame_no", "byte_offset"),
    ).select(
        "doc_id",
        "frame_no",
        F.col("byte_offset").cast("int").alias("byte_offset"),
    )


def plan_audio_chunks(
    df: DataFrame,
    duration_col: str = "duration_ms",
    chunk_ms: int = 30_000,
    stride_ms: int = 25_000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Segmentation PLAN for long audio: overlapping fixed-length chunks
    (``chunk_ms`` window, ``stride_ms`` hop — the 30s/5s-overlap scheme a
    Whisper-style transcription pipeline feeds), computed from duration
    METADATA only.  The decode/slice of actual audio bytes happens
    downstream against this plan (stubbed in this environment like the
    image decoder); planning from metadata means the payload column is
    never read here — row groups prune on duration alone.

    Returns (id_col, chunk_idx, start_ms, end_ms): starts at every stride
    below the duration, ends clamped to it, zero-length chunks dropped.
    Pure sequence+explode — JVM-side, map-only, no shuffle.
    """
    dur = F.col(duration_col).cast("bigint")
    starts = F.sequence(
        F.lit(0).cast("bigint"),
        F.greatest(dur - 1, F.lit(0).cast("bigint")),
        F.lit(stride_ms).cast("bigint"),
    )
    exploded = df.select(
        F.col(id_col), dur.alias("_dur"), F.explode(starts).alias("start_ms")
    )
    end = F.least(F.col("start_ms") + chunk_ms, F.col("_dur"))
    return (
        exploded.filter(end > F.col("start_ms"))
        .select(
            F.col(id_col),
            F.expr(f"start_ms div {stride_ms}").cast("int").alias("chunk_idx"),
            F.col("start_ms"),
            end.alias("end_ms"),
        )
    )


# ---------------------------------------------------------------------------
# REAL pixel decode: pure-stdlib PNG (zlib inflate + scanline unfilter).
# Closes the "pixel decode is stubbed" gap for the one container that needs
# no media library: PNG's pixel path is DEFLATE (stdlib zlib) + five
# per-scanline predictors (PNG spec / RFC 2083 §6).  JPEG/video pixel
# decode still requires codec libraries and remains stubbed.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # grayscale, RGB, RGBA


def _png_decode_pixels(b: bytes):
    """Decode 8-bit non-interlaced PNG bytes -> (width, height, channels,
    numpy array h x w x channels), or None for anything unsupported /
    malformed (the quarantine contract: never raise).

    Supports color types 0/2/6 (gray, RGB, RGBA) at bit depth 8 and all
    five scanline filters (None/Sub/Up/Average/Paeth).  Filters 2 (Up)
    and 0 vectorize; Sub/Average/Paeth scan within the row — fine for the
    fixture-scale images this environment decodes; a production deployment
    swaps this kernel for PIL/libpng behind the SAME mapInPandas contract.
    """
    import struct
    import zlib

    import numpy as np

    if b[:8] != _PNG_SIG:
        return None
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(b):
        ln = int.from_bytes(b[pos : pos + 4], "big")
        typ = b[pos + 4 : pos + 8]
        if pos + 12 + ln > len(b):
            return None
        data = b[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            if ln != 13:
                return None
            w, h, bd, ct, _comp, _filt, inter = struct.unpack(
                ">IIBBBBB", data
            )
            if bd != 8 or ct not in _PNG_CHANNELS or inter != 0:
                return None
            meta = (w, h, _PNG_CHANNELS[ct])
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if meta is None or not idat:
        return None
    w, h, ch = meta
    if w == 0 or h == 0:
        return None
    stride = w * ch
    expected = (stride + 1) * h
    # A header can DECLARE absurd dimensions too — cap the inflated
    # buffer at 64 MiB (far above any fixture, far below executor RAM)
    # so the max_length bound below is itself bounded.
    if expected > 64 * 1024 * 1024:
        return None
    try:
        # Bound inflation by the declared dimensions BEFORE allocating:
        # a crafted decompression-bomb IDAT must quarantine (None), not
        # exhaust executor memory.  Valid streams inflate to exactly
        # `expected` bytes and are fully consumed.
        dec = zlib.decompressobj()
        raw = dec.decompress(b"".join(idat), expected)
        if dec.unconsumed_tail or dec.decompress(b"", 1):
            return None
    except zlib.error:
        return None
    if len(raw) != expected:
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        base = y * (stride + 1)
        f = raw[base]
        row = np.frombuffer(raw, np.uint8, stride, base + 1).copy()
        if f == 0:
            pass
        elif f == 1:  # Sub
            for x in range(ch, stride):
                row[x] = (int(row[x]) + int(row[x - ch])) & 0xFF
        elif f == 2:  # Up (uint8 addition wraps mod 256 by itself)
            row += prev
        elif f == 3:  # Average
            for x in range(stride):
                left = int(row[x - ch]) if x >= ch else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - ch]) if x >= ch else 0
                up = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                row[x] = (int(row[x]) + pred) & 0xFF
        else:
            return None
        out[y] = row
        prev = row
    return w, h, ch, out.reshape(h, w, ch)


#: Output schema of the pixel-stats decoder: exact integer channel sums so
#: the gate hash-matches an arithmetic oracle (no float means).
PIXEL_STATS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("ch0_sum", T.LongType()),
        T.StructField("ch1_sum", T.LongType()),
        T.StructField("ch2_sum", T.LongType()),
        T.StructField("decoded", T.BooleanType()),
    ]
)


def _pixel_stats_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            dec = _png_decode_pixels(bytes(payload))
            if dec is None:
                rows.append((doc_id, None, None, None, None, None, None, False))
                continue
            w, h, ch, px = dec
            sums = px.astype("int64").sum(axis=(0, 1))
            rows.append(
                (
                    doc_id,
                    w,
                    h,
                    ch,
                    int(sums[0]),
                    int(sums[1]) if ch >= 3 else None,
                    int(sums[2]) if ch >= 3 else None,
                    True,
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "width", "height", "channels",
                "ch0_sum", "ch1_sum", "ch2_sum", "decoded",
            ],
        ).astype(
            {
                "width": "Int32", "height": "Int32", "channels": "Int32",
                "ch0_sum": "Int64", "ch1_sum": "Int64", "ch2_sum": "Int64",
            }
        )


def decode_png_pixel_stats(df_with_payload: DataFrame) -> DataFrame:
    """REAL pixel decode over a binary PNG column: inflate + unfilter via
    :func:`_png_decode_pixels`, then exact per-channel pixel sums — the
    integer statistics an oracle can recompute, unlike a float mean.
    Unsupported/corrupt payloads come back quarantined
    (``decoded = false``, null stats), never as task failures.

    Same scale shape as the other kernels: Arrow ``mapInPandas``, map-only
    (zero shuffles), Python memory bounded by ``arrow.maxRecordsPerBatch``.
    """
    return df_with_payload.select("doc_id", "payload").mapInPandas(
        _pixel_stats_batch, PIXEL_STATS
    )


def png_encode_rgb(doc_id: int, width: int, height: int) -> bytes:
    """Deterministic RGB PNG fixture: pixel (p = y*width+x) channel c has
    value ``(doc_id*31 + p*3 + c) % 256`` — an arithmetic formula a SQL
    oracle reproduces without any image code, while the bytes themselves
    are a fully valid zlib-compressed PNG (filter 0 scanlines, CRC'd
    chunks).  The encode side of the decode gate; filters 1-4 and the
    gray/RGBA paths are pinned by pytest instead."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = width * 3
    base = doc_id * 31
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type None
        off = base + y * stride
        raw.extend((off + i) % 256 for i in range(stride))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
