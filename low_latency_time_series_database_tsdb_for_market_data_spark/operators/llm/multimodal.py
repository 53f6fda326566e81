"""Multimodal column plumbing (q63 + the binary-payload pipeline).

Design (BASELINE.json north-star): media travels as an opaque BINARY column
with typed metadata beside it; decode / feature-extraction runs as
Arrow-batched pandas iterators (mapInPandas), so payload bytes stream
through executors in columnar batches and never surface as Python
row objects.  Container-header decode (decode_media/decode_headers) is
REAL pure-stdlib parsing — PNG/GIF/BMP/JPEG dimensions, WAV audio params —
and audio sample decode (decode_audio) is REAL too: stdlib `wave` + numpy
PCM statistics.  Image PIXEL decode is REAL for the uncompressed formats
a stdlib can parse — 24-bit BMP and binary PPM round-trip through
decode -> nearest-neighbour resize -> re-encode in resize_images
(round 10) — while compressed formats (JPEG/PNG) and video frame decode
(sample_frames) keep deterministic stand-ins, since no codec library
exists in this build.  The Spark-side schema, partitioning, UDF
signatures and batch shapes are real and tested (tests/test_llm_ops.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ...catalog import table
from ...registry import query

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_mean", T.DoubleType(), True),
        T.StructField("magic_hex", T.StringType(), True),
    ]
)


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table: document text bytes as payload.
    Stands in for image/audio blobs so the pipeline is runnable here."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def decode_media(payload: bytes | None, mime: str | None = None) -> dict:
    """Pure-stdlib container decode: sniffs the format from magic bytes
    and parses the REAL header fields (image dimensions, audio channel
    layout) for PNG, GIF, BMP, JPEG and WAV — no codec libraries needed.
    Pixel/sample decode stays out of scope by design (resize_images /
    sample_frames document their deterministic stand-ins); header decode
    is the part every routing/filtering pipeline needs and it is fully
    implemented here.

    Returns {"fmt", "width", "height", "channels", "sample_rate"} with
    None for fields the format does not carry or unparseable input —
    never raises: at 100 TB a corrupt blob must degrade to nulls, not
    kill the stage."""
    import struct

    out: dict = {
        "fmt": None, "width": None, "height": None,
        "channels": None, "sample_rate": None,
    }
    if not payload:
        return out
    b = payload
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
            # IHDR is mandatory-first: width/height are big-endian u32 at 16
            out["fmt"] = "png"
            out["width"], out["height"] = struct.unpack(">II", b[16:24])
        elif b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            out["fmt"] = "gif"
            out["width"], out["height"] = struct.unpack("<HH", b[6:10])
        elif b[:2] == b"BM" and len(b) >= 26:
            # BITMAPINFOHEADER: signed LE i32 at 18/22 (height<0 = top-down)
            out["fmt"] = "bmp"
            w, h = struct.unpack("<ii", b[18:26])
            out["width"], out["height"] = w, abs(h)
        elif b[:2] == b"\xff\xd8":
            # JPEG: walk segments to the first SOF0/1/2 frame header
            out["fmt"] = "jpeg"
            i = 2
            while i + 9 <= len(b):
                if b[i] != 0xFF:
                    break
                marker = b[i + 1]
                if marker in (0xC0, 0xC1, 0xC2):
                    out["height"], out["width"] = struct.unpack(
                        ">HH", b[i + 5 : i + 9]
                    )
                    break
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2  # standalone markers carry no length
                    continue
                (seg_len,) = struct.unpack(">H", b[i + 2 : i + 4])
                i += 2 + seg_len
        elif b[:4] == b"RIFF" and b[8:12] == b"WAVE" and len(b) >= 36:
            # canonical layout: fmt chunk at 12
            if b[12:16] == b"fmt ":
                out["fmt"] = "wav"
                out["channels"], out["sample_rate"] = struct.unpack(
                    "<HI", b[22:28]
                )
    except (struct.error, IndexError):
        pass  # truncated header: keep whatever was parsed before the cut
    return out


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("channels", T.LongType(), True),
        T.StructField("sample_rate", T.LongType(), True),
    ]
)


def decode_headers(media: DataFrame) -> DataFrame:
    """The decode stage as a Spark op: mapInPandas over binary payloads,
    one output row per media row with parsed container metadata.  No
    shuffle, Arrow-batched, memory bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch — the 100 TB shape for
    a routing/filtering pass before any expensive pixel decode."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                decode_media(p, m)
                for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "fmt": [d["fmt"] for d in decoded],
                    "width": pd.array(
                        [d["width"] for d in decoded], dtype="Int64"
                    ),
                    "height": pd.array(
                        [d["height"] for d in decoded], dtype="Int64"
                    ),
                    "channels": pd.array(
                        [d["channels"] for d in decoded], dtype="Int64"
                    ),
                    "sample_rate": pd.array(
                        [d["sample_rate"] for d in decoded], dtype="Int64"
                    ),
                }
            )

    return media.mapInPandas(batches, DECODE_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow delivers the binary column as zero-copy buffers per batch; the
    per-batch pandas work is vectorized numpy over byte arrays.  At scale
    this is embarrassingly parallel: no shuffle, batch size bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)).astype("int64"),
                    "byte_mean": payloads.map(
                        lambda b: float(np.frombuffer(b, dtype=np.uint8).mean())
                        if b
                        else float("nan")
                    ),
                    "magic_hex": payloads.map(
                        lambda b: b[:4].hex().upper() if b else None
                    ),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


@query(
    "q63_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           upper(hex(encode(substr(text, 1, 4)))) AS magic_hex
    FROM documents
    """,
    category="llm-multimodal",
)
def q63_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata pass: payload size + 4-byte magic prefix —
    the cheap JVM-side sniffing stage that routes media to decoders."""
    d = table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.length(payload).cast("bigint").alias("n_bytes"),
        F.upper(F.hex(F.encode(F.substring("text", 1, 4), "UTF-8"))).alias(
            "magic_hex"
        ),
    )


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("channels", T.LongType(), True),
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_sec", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.DoubleType(), True),
    ]
)


def decode_audio(media: DataFrame) -> DataFrame:
    """REAL sample-level audio decode for WAV/PCM payloads — stdlib
    `wave` (always present) + vectorized numpy over the raw frames, no
    external codec library.  Emits per-clip signal stats (RMS, peak,
    duration) — the features an audio-curation pipeline filters on
    (silence, clipping, truncation).  Non-WAV or corrupt payloads
    degrade to null fields, never a stage failure.

    Same 100 TB shape as the other decode stages: mapInPandas over Arrow
    batches, zero shuffle, bytes never surface on the driver.  Image
    pixel decode remains a documented stand-in (no PIL in this build);
    this stage is the template for swapping a stand-in for a real codec
    without touching the Spark plumbing."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import math
        import wave as _wave

        import numpy as np

        _DTYPES = {1: np.uint8, 2: np.int16, 4: np.int32}

        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in AUDIO_SCHEMA.fields}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                row = dict.fromkeys(out, None)
                row["media_id"] = mid
                try:
                    with _wave.open(io.BytesIO(b)) as w:
                        ch, sw = w.getnchannels(), w.getsampwidth()
                        sr, nf = w.getframerate(), w.getnframes()
                        raw = w.readframes(nf)
                    dtype = _DTYPES.get(sw)
                    if dtype is not None and sr > 0:
                        arr = np.frombuffer(raw, dtype=dtype).astype(np.float64)
                        if sw == 1:  # 8-bit WAV PCM is unsigned
                            arr -= 128.0
                        row.update(
                            channels=ch,
                            sample_rate=sr,
                            n_frames=nf,
                            duration_sec=nf / sr,
                            rms=float(math.sqrt((arr * arr).mean()))
                            if arr.size
                            else 0.0,
                            peak=float(np.abs(arr).max()) if arr.size else 0.0,
                        )
                except Exception:
                    pass  # not a WAV / truncated: null fields by design
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(out["media_id"], dtype="int64"),
                    "channels": pd.array(out["channels"], dtype="Int64"),
                    "sample_rate": pd.array(out["sample_rate"], dtype="Int64"),
                    "n_frames": pd.array(out["n_frames"], dtype="Int64"),
                    "duration_sec": pd.array(
                        out["duration_sec"], dtype="float64"
                    ),
                    "rms": pd.array(out["rms"], dtype="float64"),
                    "peak": pd.array(out["peak"], dtype="float64"),
                }
            )

    return media.mapInPandas(batches, AUDIO_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


# ---------------------------------------------------------------------------
# Real uncompressed-image codecs (round 10, r9 verdict item #7): BMP
# (24-bit bottom-up, the classic BITMAPINFOHEADER layout) and binary PPM
# (P6, maxval 255) — pure stdlib struct parsing + numpy pixel arrays, no
# codec library needed.  resize_images now REALLY decodes, resizes, and
# re-encodes these two formats end-to-end; compressed formats the
# environment cannot decode keep the documented deterministic stand-in.
# ---------------------------------------------------------------------------


def decode_bmp(b: bytes):
    """(h, w, 3) uint8 RGB array from a 24-bit uncompressed BMP
    (BITMAPINFOHEADER, bottom-up or top-down rows, 4-byte row padding).
    Returns None when the payload is not such a BMP."""
    import struct

    import numpy as np

    if len(b) < 54 or b[:2] != b"BM":
        return None
    off = struct.unpack_from("<I", b, 10)[0]
    hdr = struct.unpack_from("<I", b, 14)[0]
    if hdr < 40:
        return None
    w, h = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    comp = struct.unpack_from("<I", b, 30)[0]
    if planes != 1 or bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if off + stride * h > len(b):
        return None
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(arr) -> bytes:
    """24-bit bottom-up BMP bytes from an (h, w, 3) uint8 RGB array."""
    import struct

    import numpy as np

    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB -> BGR
    data = body.tobytes()
    off = 54
    header = struct.pack(
        "<2sIHHI", b"BM", off + len(data), 0, 0, off
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


def decode_ppm(b: bytes):
    """(h, w, 3) uint8 RGB array from a binary PPM (P6, maxval <= 255).
    Returns None when the payload is not such a PPM."""
    import numpy as np

    if len(b) < 10 or b[:2] != b"P6":
        return None
    pos, fields = 2, []
    while len(fields) < 3 and pos < len(b):
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        if not b[start:pos].isdigit():
            return None
        fields.append(int(b[start:pos]))
    if len(fields) < 3:
        return None
    w, h, maxval = fields
    pos += 1  # single whitespace after maxval
    if maxval > 255 or w <= 0 or h <= 0 or pos + w * h * 3 > len(b):
        return None
    return (
        np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


def encode_ppm(arr) -> bytes:
    h, w = arr.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(b: bytes):
    """(h, w, 3) uint8 RGB array from an 8-bit truecolor
    (color type 2), non-interlaced PNG — pure stdlib (round 11, r10
    verdict item #6): zlib inflate of the concatenated IDAT stream,
    then per-row unfiltering of all five standard filters (None, Sub,
    Up, Average, Paeth — RFC 2083 §6).  Sub/Average/Paeth recur along
    the row, so those rows decode with a per-pixel loop; None/Up are
    vectorized.  Returns None for anything else (other bit depths,
    palette/alpha color types, interlacing, truncated or corrupt
    streams) — the caller falls through to the next decoder."""
    import struct
    import zlib

    import numpy as np

    if len(b) < 8 or b[:8] != _PNG_SIG:
        return None
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(b):
        ln, typ = struct.unpack(">I4s", b[pos : pos + 8])
        pos += 8
        if pos + ln + 4 > len(b):
            return None
        data = b[pos : pos + ln]
        # per-chunk CRC-32 over type + payload (RFC 2083 §3.4) — a
        # bit-flipped but still zlib-inflatable stream must fall
        # through to the deterministic stand-in like any other corrupt
        # payload, not silently decode wrong pixels (ADVICE r11)
        crc = struct.unpack(">I", b[pos + ln : pos + ln + 4])[0]
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            return None
        pos += ln + 4  # payload + CRC
        if typ == b"IHDR":
            if ln != 13:
                return None
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.extend(data)
        elif typ == b"IEND":
            break
    if ihdr is None:
        return None
    w, h, depth, ctype, comp, filt, inter = ihdr
    if (depth, ctype, comp, filt, inter) != (8, 2, 0, 0, 0):
        return None
    if w <= 0 or h <= 0:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * 3
    if len(raw) != h * (stride + 1):
        return None
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int32)
        if ft == 0:
            rec = line
        elif ft == 1:  # Sub: left-neighbour recurrence == per-channel
            # prefix sum mod 256 (vectorized; w*3 Python iterations per
            # row would dominate the mapInPandas hot path on large rows)
            rec = (
                np.cumsum(line.reshape(w, 3), axis=0, dtype=np.int64) & 0xFF
            ).reshape(stride).astype(np.int32)
        elif ft == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ft == 3:  # Average
            rec = line.copy()
            for x in range(stride):
                left = rec[x - 3] if x >= 3 else 0
                rec[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            rec = line.copy()
            for x in range(stride):
                a = int(rec[x - 3]) if x >= 3 else 0
                up = int(prev[x])
                c = int(prev[x - 3]) if x >= 3 else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                rec[x] = (line[x] + pred) & 0xFF
        else:
            return None
        out[y] = rec
        prev = rec
    return out.astype(np.uint8).reshape(h, w, 3)


def encode_png(arr) -> bytes:
    """8-bit truecolor non-interlaced PNG from an (h, w, 3) uint8 array
    — filter 0 rows, one zlib-compressed IDAT, CRC32 per chunk."""
    import struct
    import zlib

    h, w = arr.shape[:2]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_gif(b: bytes):
    """(h, w, 3) uint8 RGB array from the FIRST image of a
    non-interlaced GIF87a/GIF89a (round 12, r11 verdict item #7 — the
    LZW member of the pure-stdlib raster family beside BMP/PPM/PNG):
    logical-screen + color-table parse, extension blocks skipped, then
    a variable-width LSB-first LZW decode (GIF89a appendix F: clear /
    end-of-information codes, code width grows at table size 2^w, caps
    at 12 bits until the next clear).  Returns None for anything else
    (interlaced images, missing color table, truncated or corrupt
    streams, bad LZW codes) — the caller falls through to the
    deterministic stand-in."""
    import numpy as np

    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw = b[6] | (b[7] << 8)
    sh = b[8] | (b[9] << 8)
    packed = b[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(b):
            return None
        gct = np.frombuffer(b, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(b):
        blk = b[pos]
        pos += 1
        if blk == 0x3B:  # trailer before any image
            return None
        if blk == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
            continue
        if blk != 0x2C:
            return None
        break
    else:
        return None
    if pos + 9 > len(b):
        return None
    iw = b[pos + 4] | (b[pos + 5] << 8)
    ih = b[pos + 6] | (b[pos + 7] << 8)
    ip = b[pos + 8]
    pos += 9
    if ip & 0x40:  # interlaced: out of scope, stand-in
        return None
    table = gct
    if ip & 0x80:
        n = 2 << (ip & 0x07)
        if pos + 3 * n > len(b):
            return None
        table = np.frombuffer(b, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    if table is None or iw <= 0 or ih <= 0 or iw > sw or ih > sh:
        return None
    if pos >= len(b):
        return None
    mcs = b[pos]
    pos += 1
    if not 2 <= mcs <= 11:
        return None
    data = bytearray()
    while pos < len(b) and b[pos] != 0:
        ln = b[pos]
        if pos + 1 + ln > len(b):
            return None
        data.extend(b[pos + 1 : pos + 1 + ln])
        pos += 1 + ln

    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    dic = [(i,) for i in range(clear)] + [None, None]
    out: list[int] = []
    acc = nbits = 0
    prev_seq = None
    need = iw * ih
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                dic = [(i,) for i in range(clear)] + [None, None]
                width = mcs + 1
                prev_seq = None
                continue
            if code == eoi:
                nbits = 0
                break
            if prev_seq is None:
                if code >= len(dic) or dic[code] is None:
                    return None
                seq = dic[code]
            elif code < len(dic) and dic[code] is not None:
                seq = dic[code]
                dic.append(prev_seq + (seq[0],))
            elif code == len(dic):
                seq = prev_seq + (prev_seq[0],)
                dic.append(seq)
            else:
                return None
            out.extend(seq)
            prev_seq = seq
            if len(dic) == (1 << width) and width < 12:
                width += 1
            if len(out) >= need:
                nbits = 0
                break
        if len(out) >= need:
            break
    if len(out) < need:
        return None
    idx = np.array(out[:need], dtype=np.int64)
    if int(idx.max()) >= len(table):
        return None
    return table[idx].reshape(ih, iw, 3).copy()


def encode_gif(arr) -> bytes:
    """Non-interlaced GIF87a from an (h, w, 3) uint8 array with <= 256
    distinct colors: palette from the sorted unique colors, pixels LZW-
    compressed with the deflate-free scheme (a CLEAR whenever the
    decoder's table would force the code width past mcs+1 — valid LZW,
    literal codes only), LSB-first bit packing, 255-byte sub-blocks."""
    import numpy as np

    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    n = len(colors)
    if n > 256:
        raise ValueError("encode_gif: more than 256 distinct colors")
    bits = max(1, (n - 1).bit_length())
    table_bits = max(1, bits)  # GIF table sizes are 2 << k, k = bits-1
    pal = np.zeros((2 << (table_bits - 1), 3), dtype=np.uint8)
    pal[:n] = colors
    mcs = max(2, table_bits)

    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    # literal-only stream: after a CLEAR the decoder table holds
    # clear + 2 codes and adds one per emitted code after the first —
    # re-CLEAR before it reaches 2^(mcs+1) so width never grows
    budget = (1 << width) - (clear + 2) - 1
    codes = [clear]
    left = 0
    for px in idx:
        if left == 0:
            if codes[-1] != clear:
                codes.append(clear)
            left = budget
        codes.append(int(px))
        left -= 1
    codes.append(eoi)

    acc = nbits = 0
    packed = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        packed.append(acc & 0xFF)

    out = bytearray(b"GIF87a")
    out += bytes(
        [w & 0xFF, w >> 8, h & 0xFF, h >> 8,
         0x80 | (table_bits - 1), 0, 0]
    )
    out += pal.tobytes()
    out += bytes([0x2C, 0, 0, 0, 0, w & 0xFF, w >> 8, h & 0xFF, h >> 8, 0])
    out += bytes([mcs])
    for i in range(0, len(packed), 255):
        sub = packed[i : i + 255]
        out += bytes([len(sub)]) + sub
    out += bytes([0, 0x3B])
    return bytes(out)


def resize_nearest(arr, width: int, height: int):
    """Deterministic nearest-neighbour resize: source index =
    floor((i + 0.5) * src / dst) — the standard pixel-center rule, pure
    integer-decided (no float ties: src/dst are exact small rationals)."""
    import numpy as np

    h, w = arr.shape[:2]
    ys = ((np.arange(height) * 2 + 1) * h) // (2 * height)
    xs = ((np.arange(width) * 2 + 1) * w) // (2 * width)
    return arr[ys][:, xs]


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize stage: mapInPandas, one output row per input row.

    REAL for BMP (24-bit), PPM (P6), PNG (8-bit truecolor, all five
    row filters, pure-stdlib zlib inflate — round 11), and GIF
    (non-interlaced 87a/89a, variable-width LZW — round 12): the
    payload is decoded to pixels, nearest-neighbour resized, and
    re-encoded in its own format — end-to-end pixel-true, tested
    against generated known-pixel images.  Payloads in formats that
    need an entropy decoder this environment lacks (JPEG/WebP/...)
    keep the deterministic hash stand-in, so the stage stays total; a
    deployment swaps that branch for PIL/opencv.
    The Spark plumbing (Arrow batches, no shuffle, bounded memory per
    batch) is identical on both branches."""
    import hashlib

    def _fake_resize(b: bytes) -> bytes:
        out = bytearray()
        seed = b[:64]
        while len(out) < width * height:
            seed = hashlib.sha256(seed).digest()
            out.extend(seed)
        return bytes(out[: width * height])

    def _resize(b: bytes | None) -> bytes | None:
        if b is None:
            return None
        b = bytes(b)
        arr = decode_bmp(b)
        if arr is not None:
            return encode_bmp(resize_nearest(arr, width, height))
        arr = decode_ppm(b)
        if arr is not None:
            return encode_ppm(resize_nearest(arr, width, height))
        arr = decode_png(b)
        if arr is not None:
            return encode_png(resize_nearest(arr, width, height))
        arr = decode_gif(b)
        if arr is not None:
            return encode_gif(resize_nearest(arr, width, height))
        return _fake_resize(b)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].map(_resize),
                }
            )

    return media.mapInPandas(batches, RESIZE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame-sampling stage: mapInPandas, one-to-many (video -> frames).

    The decoder is STUBBED: "frames" are fixed-stride byte slices of the
    payload standing in for decoded video frames.  Demonstrates the
    fan-out shape (explode inside the Arrow batch, not a generator join)
    and the per-frame metadata contract."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                if b is None:
                    continue
                for i in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(b[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.mapInPandas(batches, FRAME_SCHEMA)
