"""Multimodal (image/audio/video) column plumbing.

Re-expresses the reference's image dataflow Spark-first: the reference
iterates pickled Rows per partition and writes files as a side effect
(reference: src/piper/spark/data_augment.py:28-75,129-136); here the
binary payload is an opaque `binary` COLUMN with typed metadata, and
all per-item work runs through Arrow-batched `mapInPandas` /
`pandas_udf` — the JVM↔Python crossing is columnar, not row pickling.

The compressed-image libraries (OpenCV/Pillow) are not in this
container, so `decode_image` handles what a pure reader can: binary
PPM/PGM (P6/P5), BI_RGB BMP (24/32-bit), non-interlaced 8-bit PNG
(stdlib zlib + numpy unfiltering; gray, gray+alpha, RGB, RGBA,
palette), and GIF87a/89a (full pure-Python LZW, interlace, palettes).
Of the reference's five accepted formats (constants.py:2 lists
.jpg .jpeg .png .bmp .gif; decode at data_augment.py:41-54) only JPEG
still needs an external codec — and GIF support EXCEEDS the reference,
whose cv2.imdecode cannot decode GIF (rows silently dropped). Unknown
payloads raise — unlike the reference, which silently skips the row on
a failed decode (data_augment.py:74-75). `fake_decode_meta` remains
the deterministic stand-in that lets the DuckDB oracle reproduce the
metadata path (`img_meta`, `img_resize`); `img_decode_png` /
`img_decode_gif` run REAL pixels through encode→decode and are
oracle-checked against cyclic byte arithmetic.

Numeric semantics mirrored from the reference (tested in tests/):
  decode        — data_augment.py:41-54 (cv2.imdecode → HWC u8)
  resize        — data_augment.py:57 (cv2.resize INTER_AREA) →
                  `resize_area`, exact area-weighted box filter
  scale u8→f32  — conversion.rs:9-26 (x / 255.0)
  normalize     — normalize.rs:8-28 ((x - mean) / std, ImageNet stats)
  color jitter  — data_augment.py:21-22 (clamp(x*1.2 + 10) to u8)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from piper_spark.registry import register
from piper_spark.session import table

#: Spark's built-in image-source schema (what `spark.read.format("image")`
#: yields; reference data_augment.py:42-62 consumes exactly these fields).
IMAGE_STRUCT = (
    "origin string, height int, width int, nChannels int, mode int, data binary"
)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, RGB) / PGM (P5, gray) → HWC uint8 (gray → 3ch)."""
    # Header: magic, width, height, maxval as whitespace-separated
    # tokens; '#' comments run to end-of-line; pixel data starts after
    # the single whitespace byte following maxval.
    magic = payload[:2]
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (only 8-bit)")
    ch = 3 if magic == b"P6" else 1
    data = np.frombuffer(payload, dtype=np.uint8, count=h * w * ch, offset=pos)
    img = data.reshape(h, w, ch)
    return np.repeat(img, 3, axis=2) if ch == 1 else img


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed (BI_RGB) 24/32-bit BMP → HWC uint8 RGB."""
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    nch = bpp // 8
    stride = (w * nch + 3) & ~3  # rows padded to 4 bytes
    rows = abs(h)
    data = np.frombuffer(payload, dtype=np.uint8, count=stride * rows, offset=off)
    img = data.reshape(rows, stride)[:, : w * nch].reshape(rows, w, nch)
    if h > 0:  # positive height = bottom-up row order
        img = img[::-1]
    return img[:, :, [2, 1, 0]]  # BGR(A) stored → RGB out, alpha dropped


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: channels per PNG color type (3 = palette: one index byte per pixel)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): nearest of left/up/up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter_scanlines(raw: bytes, w: int, h: int, ch: int) -> np.ndarray:
    """Reverse PNG per-scanline filtering → (h, w·ch) uint8 matrix.

    Filters 0/1/2 vectorize (none; sub is a per-lane running sum mod 256;
    up adds the prior reconstructed row). Average and Paeth depend on the
    in-progress left pixel, so they fall back to a per-byte loop — fine
    for the bounded images this container decodes; a production build
    would push this into a C kernel exactly as libpng does.
    """
    stride = w * ch
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG: decompressed length mismatch")
    recon = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub: running sum per byte lane, mod 256
            cur = line.copy()
            for lane in range(ch):
                cur[lane::ch] = np.cumsum(cur[lane::ch]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                c = int(prev[x - ch]) if x >= ch else 0
                cur[x] = (line[x] + _paeth(a, int(prev[x]), c)) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        recon[y] = cur.astype(np.uint8)
        prev = cur
    return recon


def _decode_png(payload: bytes) -> np.ndarray:
    """Non-interlaced 8-bit PNG → HWC uint8 RGB, stdlib zlib + numpy.

    Covers color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
    6 (RGBA); alpha is dropped and gray replicated to 3 channels, the
    same channel policy as cv2.imdecode's default IMREAD_COLOR
    (reference data_augment.py:53). Interlaced (Adam7) or 16-bit images
    raise.
    """
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("PNG: bad signature")
    pos, idat, plte = 8, [], None
    w = h = depth = color = interlace = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # 4 len + 4 type + data + 4 CRC
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG: missing IHDR")
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise ValueError(
            f"PNG: unsupported (depth={depth}, color={color}, "
            f"interlace={interlace}) — only non-interlaced 8-bit"
        )
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    img = _unfilter_scanlines(raw, w, h, ch).reshape(h, w, ch)
    if color == 0:
        return np.repeat(img, 3, axis=2)
    if color == 2:
        return img
    if color == 3:
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        return plte[img[:, :, 0]]
    if color == 4:
        return np.repeat(img[:, :, :1], 3, axis=2)
    return img[:, :, :3]  # RGBA → RGB


def _gif_lzw_decode(data: bytes, min_size: int) -> list[int]:
    """GIF-variant LZW (GIF89a spec appendix F): variable-width codes
    LSB-first, clear/end codes, dictionary capped at 12 bits."""
    clear, end = 1 << min_size, (1 << min_size) + 1
    width = min_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    bitpos, total = 0, len(data) * 8
    while bitpos + width <= total:
        code = 0
        for i in range(width):
            code |= ((data[(bitpos + i) >> 3] >> ((bitpos + i) & 7)) & 1) << i
        bitpos += width
        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            width, prev = min_size + 1, None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:  # dictionary frozen at 12 bits
                table.append(prev + [entry[0]])
        elif code == len(table) and len(table) < 4096:  # KwKwK
            entry = prev + [prev[0]]
            table.append(entry)
        else:
            raise ValueError("GIF: corrupt LZW code")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out


#: Adam-style GIF interlace passes: (row offset, row step)
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/GIF89a first frame → HWC uint8 RGB, pure Python/numpy.

    Full LZW inflate, local/global palettes, interlacing, frame rect
    composited onto the background-filled logical screen. NOTE: the
    reference lists .gif as accepted (constants.py:2) but cv2.imdecode
    cannot decode GIF at all — it returns None, the blanket except at
    data_augment.py:74-75 fires, and the row is SILENTLY DROPPED. This
    engine decodes GIF for real.
    """
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("GIF: bad signature")
    import struct

    sw, sh, flags, bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + length-prefixed sub-blocks
            pos += 2
            while payload[pos]:
                pos += payload[pos] + 1
            pos += 1
        elif block == 0x2C:  # image descriptor — decode the FIRST frame
            left, top, w, h, iflags = struct.unpack("<HHHHB", payload[pos + 1 : pos + 10])
            pos += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(-1, 3)
                pos += n * 3
            if pal is None:
                raise ValueError("GIF: no palette")
            min_size = payload[pos]
            pos += 1
            chunks = []
            while payload[pos]:
                ln = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + ln])
                pos += ln + 1
            idx = _gif_lzw_decode(b"".join(chunks), min_size)
            if len(idx) < w * h:
                raise ValueError("GIF: truncated pixel data")
            frame = np.array(idx[: w * h], dtype=np.uint8).reshape(h, w)
            if iflags & 0x40:  # interlaced: rows arrive in 4 passes
                ordered = np.empty_like(frame)
                src = 0
                for off, step in _GIF_INTERLACE:
                    rows = range(off, h, step)
                    for r in rows:
                        ordered[r] = frame[src]
                        src += 1
                frame = ordered
            canvas = np.full((sh, sw), bg if gct is not None else 0, dtype=np.uint8)
            canvas[top : top + h, left : left + w] = frame
            return pal[canvas]
        elif block == 0x3B:  # trailer before any frame
            break
        else:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
    raise ValueError("GIF: no image frame")


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an encoded image payload to an HWC uint8 RGB array.

    Pure-Python/numpy decoders: PPM/PGM (P6/P5), BI_RGB BMP,
    non-interlaced 8-bit PNG (stdlib zlib inflate + numpy unfiltering),
    and GIF87a/89a (full LZW). Of the reference's accepted formats
    (.jpg .jpeg .png .bmp .gif — constants.py:2, cv2.imdecode at
    data_augment.py:53) only JPEG still requires a codec library this
    container lacks and raises — and for GIF this engine EXCEEDS the
    reference, whose cv2.imdecode cannot decode GIF and silently drops
    the row. A bad payload raises — never the reference's silent
    per-row skip (data_augment.py:74-75).
    """
    if payload[:2] in (b"P6", b"P5"):
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload)
    raise ValueError(
        "unrecognized image payload (pure decoders cover PPM/PGM/BMP/PNG/GIF; "
        "JPEG needs an image codec library)"
    )


def encode_ppm(img: np.ndarray) -> bytes:
    """HWC uint8 RGB → binary PPM (P6) payload — the sink-side twin of
    `decode_image` (reference encodes via cv2.imencode, data_augment.py:78-81)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img).tobytes()


def encode_png(img: np.ndarray, cycle_filters: bool = False) -> bytes:
    """uint8 image → non-interlaced 8-bit PNG, stdlib zlib only.

    Accepts (h, w) or (h, w, 1) gray, (h, w, 3) RGB, (h, w, 4) RGBA.
    With ``cycle_filters`` each scanline y uses filter type y % 5, which
    makes every encoded image exercise ALL five PNG filters on decode —
    the adversarial payload `img_decode_png` uses to prove the
    unfiltering math bit-exact against an arithmetic oracle.
    """
    import struct
    import zlib

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    img = np.ascontiguousarray(img, dtype=np.uint8)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    flat = img.reshape(h, w * ch).astype(np.int32)
    out = bytearray()
    for y in range(h):
        ftype = y % 5 if cycle_filters else 0
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(w * ch, dtype=np.int32)
        if ftype == 0:
            enc = cur
        elif ftype == 1:
            left = np.concatenate([np.zeros(ch, dtype=np.int32), cur[:-ch]])
            enc = cur - left
        elif ftype == 2:
            enc = cur - prev
        elif ftype == 3:
            left = np.concatenate([np.zeros(ch, dtype=np.int32), cur[:-ch]])
            enc = cur - ((left + prev) >> 1)
        else:  # Paeth
            left = np.concatenate([np.zeros(ch, dtype=np.int32), cur[:-ch]])
            upleft = np.concatenate([np.zeros(ch, dtype=np.int32), prev[:-ch]])
            pred = np.array(
                [_paeth(int(a), int(b), int(c)) for a, b, c in zip(left, prev, upleft)],
                dtype=np.int32,
            )
            enc = cur - pred
        out.append(ftype)
        out.extend((enc & 0xFF).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + chunk(b"IEND", b"")
    )


def encode_gif(img: np.ndarray, real_lzw: bool = True) -> bytes:
    """uint8 gray (h, w) or (h, w, 1) image → GIF89a payload, pure Python.

    The palette is the 256-gray identity ramp, so pixel index == gray
    value and `_decode_gif`'s palette lookup replicates each byte to
    RGB. With ``real_lzw`` the stream uses genuine dictionary-building
    LZW (exercising the decoder's dict-growth and width-increase paths);
    without it, every symbol is preceded by a CLEAR code — still a
    spec-valid stream, but the decoder's dictionary never grows (the
    degenerate baseline the tests compare against).
    """
    import struct

    if img.ndim == 3:
        img = img[:, :, 0]
    h, w = img.shape
    flat = img.astype(np.uint8).reshape(-1).tolist()
    min_size = 8  # 256-entry palette
    clear, end = 1 << min_size, (1 << min_size) + 1

    codes: list[tuple[int, int]] = [(clear, 9)]  # (code, width at emit time)
    if real_lzw:
        # Standard GIF-LZW compressor mirroring the decoder's table
        # evolution: width grows when the NEXT code to be added would
        # overflow, reset at 4096.
        table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
        next_code, width = end + 1, min_size + 1
        seq: tuple[int, ...] = ()
        for px in flat:
            cand = seq + (px,)
            if cand in table:
                seq = cand
                continue
            codes.append((table[seq], width))
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
            if next_code == 4096:
                codes.append((clear, width))
                table = {(i,): i for i in range(clear)}
                next_code, width = end + 1, min_size + 1
            seq = (px,)
        if seq:
            codes.append((table[seq], width))
            # The decoder appends one more entry when it consumes this
            # final code; if that lands exactly on 2^width it reads END
            # at width+1 — mirror that boundary.
            if next_code == (1 << width) and width < 12:
                width += 1
        codes.append((end, width))
    else:
        for px in flat:
            codes.append((px, 9))
            codes.append((clear, 9))
        codes.append((end, 9))

    bits = bytearray()
    acc = nbits = 0
    for code, width in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        bits.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # GCT, 256 entries
    out += bytes(v for g in range(256) for v in (g, g, g))  # gray ramp
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
    out.append(min_size)
    for i in range(0, len(bits), 255):
        chunk = bits[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def fake_decode_meta(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: (width, height, n_bytes).

    Pure arithmetic on the payload length so the DuckDB oracle can
    reproduce it (img_meta below).
    """
    n = len(payload)
    return 1 + n % 64, 1 + n % 48, n


def _area_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out × n_in) row-stochastic weights: W[i, r] = |overlap of source
    pixel r with destination interval [i·s, (i+1)·s)| / s, s = n_in/n_out.

    This is exactly cv2.INTER_AREA for downscale; for upscale the
    intervals shrink below one source pixel and it degenerates to a
    (correct but unsmoothed) box sample, same as INTER_AREA's behavior
    of not interpolating new detail.
    """
    s = n_in / n_out
    w = np.zeros((n_out, n_in))
    for i in range(n_out):
        lo, hi = i * s, (i + 1) * s
        for r in range(int(np.floor(lo)), min(int(np.ceil(hi)), n_in)):
            w[i, r] = (min(r + 1, hi) - max(r, lo)) / s
    return w


def resize_area(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Area-weighted resize (reference S6: cv2.resize INTER_AREA,
    data_augment.py:57) as two weight-matrix contractions — exact
    fractional-overlap box filter, pure numpy.
    """
    wy = _area_weights(img.shape[0], out_h)
    wx = _area_weights(img.shape[1], out_w)
    tmp = np.tensordot(wy, img.astype(np.float64), axes=(1, 0))  # (oh, w, c)
    out = np.tensordot(tmp, wx, axes=(1, 1))  # (oh, c, ow)
    out = np.moveaxis(out, 1, 2)
    if img.dtype == np.uint8:
        return np.clip(np.round(out), 0, 255).astype(np.uint8)
    return out.astype(img.dtype)


def scale_u8_to_f32(img: np.ndarray) -> np.ndarray:
    """u8 → f32 in [0,1] (reference conversion.rs:9-26)."""
    return img.astype(np.float32) / 255.0


def normalize_imagenet(img: np.ndarray) -> np.ndarray:
    """Per-channel (x - mean)/std, HWC layout (reference normalize.rs:8-28)."""
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def color_jitter(img: np.ndarray, alpha: float = 1.2, beta: float = 10.0) -> np.ndarray:
    """clamp(round(x*alpha + beta), 0, 255) on u8 (reference data_augment.py:21-22).

    Vectorized twin of cv2.convertScaleAbs for non-negative inputs.
    """
    return np.clip(np.round(img.astype(np.float64) * alpha + beta), 0, 255).astype(
        np.uint8
    )


def with_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload column (here: utf-8 of the text).

    In production this column comes straight from parquet `binary` or
    `spark.read.format("binaryFile")`.
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def _meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: decode-metadata per payload, Arrow-batched."""
    for pdf in batches:
        meta = [fake_decode_meta(p) for p in pdf["payload"]]
        out = pd.DataFrame(meta, columns=["width", "height", "n_bytes"])
        out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
        yield out


@register(
    "img_meta",
    oracle="""
SELECT doc_id,
       1 + octet_length(encode(text)) % 64 AS width,
       1 + octet_length(encode(text)) % 48 AS height,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
""",
)
def img_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction through real mapInPandas plumbing.

    documents.text stands in for an encoded media payload; the Python
    side sees Arrow batches (never pickled Rows) and returns typed
    metadata columns.
    """
    d = with_payload(table(spark, sf_dir, "documents")).select("doc_id", "payload")
    return d.mapInPandas(
        _meta_batches, schema="doc_id long, width long, height long, n_bytes long"
    )


#: img_resize target dims — the reference's resize is 224×224
#: (luigi_tasks.py:20-21); smaller here to keep the per-row cost tiny.
RESIZE_OUT_W, RESIZE_OUT_H = 32, 24


def fake_image(payload: bytes) -> np.ndarray:
    """Deterministic HWC u8 image from a payload: bytes tiled cyclically
    into the fake-decoded (h, w, 3) shape — so the oracle can reproduce
    integer facts about the pixels with modular arithmetic.
    """
    w, h, _ = fake_decode_meta(payload)
    return np.resize(np.frombuffer(payload, dtype=np.uint8), (h, w, 3))


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: payload → fake image → REAL resize_area."""
    rows = []
    for pdf in batches:
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            img = fake_image(payload)
            resized = resize_area(img, RESIZE_OUT_W, RESIZE_OUT_H)
            rows.append(
                (
                    doc_id,
                    img.shape[1],
                    img.shape[0],
                    resized.shape[1],
                    resized.shape[0],
                    int(img.sum(dtype=np.int64)),
                )
            )
        yield pd.DataFrame(
            rows, columns=["doc_id", "in_w", "in_h", "out_w", "out_h", "pix_sum"]
        )
        rows = []


#: video_frames sampling config: frame geometry + every-k-th sampling.
#: Small frames so a ~300-byte document payload holds several.
FRAME_W, FRAME_H, FRAME_STEP = 6, 4, 2


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: payload → frame-sampled fake video.

    A payload of n bytes is a video of floor(n / frame_bytes) complete
    frames (frame_bytes = W*H*3); sampling keeps every FRAME_STEP-th
    frame starting at 0. Emits one row per SAMPLED frame with its exact
    byte sum — the plumbing (schema, per-frame explode, batch shape) is
    real; only the codec is the deterministic byte-slice stand-in.
    """
    frame_bytes = FRAME_W * FRAME_H * 3
    rows = []
    for pdf in batches:
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = np.frombuffer(payload, dtype=np.uint8)
            n_frames = len(data) // frame_bytes
            for f in range(0, n_frames, FRAME_STEP):
                frame = data[f * frame_bytes : (f + 1) * frame_bytes]
                rows.append((doc_id, f, int(frame.sum(dtype=np.int64))))
        yield pd.DataFrame(rows, columns=["doc_id", "frame_no", "frame_sum"])
        rows = []


@register(
    "video_frames",
    oracle=f"""
WITH d AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n
  FROM documents
),
f AS (
  SELECT doc_id, text,
         unnest(range(0, n // {FRAME_W * FRAME_H * 3}, {FRAME_STEP})) AS frame_no
  FROM d
)
SELECT doc_id, CAST(frame_no AS INTEGER) AS frame_no,
       CAST(list_sum([ord(substring(text, {FRAME_W * FRAME_H * 3} * frame_no + i, 1))
                      FOR i IN range(1, {FRAME_W * FRAME_H * 3} + 1)]) AS BIGINT)
         AS frame_sum
FROM f
""",
)
def video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling over a video-style binary column: payload → frame
    boundaries → every-4th-frame sample → per-frame facts, one output
    row per sampled frame (a mapInPandas UDTF shape). The oracle
    recomputes the sampled frame numbers and byte sums arithmetically.
    At scale this is the shape of real frame extraction: opaque binary
    in, per-frame rows out, no driver involvement, codec in the worker.
    """
    d = with_payload(table(spark, sf_dir, "documents")).select("doc_id", "payload")
    return d.mapInPandas(
        _frame_batches, schema="doc_id long, frame_no int, frame_sum long"
    )


def _png_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: payload → gray image → REAL PNG encode (all
    five filter types cycled) → REAL PNG decode → pixel facts."""
    rows = []
    for pdf in batches:
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, _ = fake_decode_meta(payload)
            gray = np.resize(np.frombuffer(payload, dtype=np.uint8), (h, w))
            rgb = decode_image(encode_png(gray, cycle_filters=True))
            rows.append((doc_id, w, h, int(rgb.sum(dtype=np.int64))))
        yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "pix_sum"])
        rows = []


@register(
    "img_decode_png",
    oracle="""
WITH d AS (
  SELECT doc_id, text,
         octet_length(encode(text)) AS n,
         1 + octet_length(encode(text)) % 64 AS w,
         1 + octet_length(encode(text)) % 48 AS h
  FROM documents
)
SELECT doc_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(3 * ((h * w // n)
                   * list_sum([ord(substring(text, i, 1))
                               FOR i IN range(1, n + 1)])
                 + coalesce(list_sum([ord(substring(text, i, 1))
                                      FOR i IN range(1, (h * w) % n + 1)]), 0))
            AS BIGINT) AS pix_sum
FROM d
""",
)
def img_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG codec round-trip, oracle-checked: each payload's bytes
    are tiled into a gray image, PNG-encoded with stdlib zlib using all
    five scanline filters (y % 5), then run through `decode_image`'s
    inflate + unfilter path. The emitted pixel sum equals 3× the tiled
    byte sum ONLY if sub/up/average/Paeth unfiltering is bit-exact, and
    the DuckDB oracle recomputes that sum with cyclic-index arithmetic —
    so this query is a distributed correctness proof of the PNG decoder
    (reference decode path: constants.py:2, data_augment.py:41-54).
    """
    d = with_payload(table(spark, sf_dir, "documents")).select("doc_id", "payload")
    return d.mapInPandas(
        _png_batches, schema="doc_id long, width int, height int, pix_sum long"
    )


def _gif_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: payload → gray image → REAL GIF encode
    (dictionary-building LZW) → REAL GIF decode → pixel facts."""
    rows = []
    for pdf in batches:
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, _ = fake_decode_meta(payload)
            gray = np.resize(np.frombuffer(payload, dtype=np.uint8), (h, w))
            rgb = decode_image(encode_gif(gray))
            rows.append((doc_id, w, h, int(rgb.sum(dtype=np.int64))))
        yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "pix_sum"])
        rows = []


@register(
    "img_decode_gif",
    oracle="""
WITH d AS (
  SELECT doc_id, text,
         octet_length(encode(text)) AS n,
         1 + octet_length(encode(text)) % 64 AS w,
         1 + octet_length(encode(text)) % 48 AS h
  FROM documents
)
SELECT doc_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(3 * ((h * w // n)
                   * list_sum([ord(substring(text, i, 1))
                               FOR i IN range(1, n + 1)])
                 + coalesce(list_sum([ord(substring(text, i, 1))
                                      FOR i IN range(1, (h * w) % n + 1)]), 0))
            AS BIGINT) AS pix_sum
FROM d
""",
)
def img_decode_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF codec round-trip, oracle-checked (`img_decode_png`'s
    sibling): payload bytes tiled to a gray image, GIF-encoded with
    genuine dictionary-building LZW (width growth, KwKwK, 4096 reset
    all reachable), decoded back through `decode_image`'s LZW inflate +
    palette path. Pixel sum == 3× tiled byte sum only if the LZW math
    is bit-exact; the oracle recomputes the sum arithmetically. Note
    the reference ACCEPTS .gif (constants.py:2) but cv2.imdecode cannot
    decode it — rows are silently dropped at data_augment.py:74-75;
    this engine decodes GIF for real.
    """
    d = with_payload(table(spark, sf_dir, "documents")).select("doc_id", "payload")
    return d.mapInPandas(
        _gif_batches, schema="doc_id long, width int, height int, pix_sum long"
    )


def _channel_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: per-channel integer byte sums of the fake image."""
    rows = []
    for pdf in batches:
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            img = fake_image(payload)
            sums = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            for c in range(3):
                rows.append((doc_id, c, int(sums[c])))
        yield pd.DataFrame(rows, columns=["doc_id", "channel", "ch_sum"])
        rows = []


@register(
    "img_channels",
    oracle="""
WITH d AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n,
         (1 + octet_length(encode(text)) % 64)
           * (1 + octet_length(encode(text)) % 48) AS px
  FROM documents
)
SELECT doc_id, CAST(c AS INTEGER) AS channel,
       CAST(list_sum([ord(substring(text, ((3 * j + c) % n) + 1, 1))
                      FOR j IN range(0, px)]) AS BIGINT) AS ch_sum
FROM d, unnest([0, 1, 2]) AS t(c)
""",
)
def img_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel feature extraction (the feature-extract step of the
    multimodal mandate): HWC image → per-channel integer byte sums via
    numpy over Arrow batches. Channel c of the tiled fake image is the
    bytes at flat positions ≡ c (mod 3), which the oracle reproduces
    with cyclic-index arithmetic.
    """
    d = with_payload(table(spark, sf_dir, "documents")).select("doc_id", "payload")
    return d.mapInPandas(
        _channel_batches, schema="doc_id long, channel int, ch_sum long"
    )


@register(
    "img_resize",
    oracle="""
WITH d AS (
  SELECT doc_id, text,
         octet_length(encode(text)) AS n,
         1 + octet_length(encode(text)) % 64 AS w,
         1 + octet_length(encode(text)) % 48 AS h
  FROM documents
)
SELECT doc_id,
       CAST(w AS INTEGER) AS in_w,
       CAST(h AS INTEGER) AS in_h,
       32 AS out_w,
       24 AS out_h,
       CAST((h * w * 3 // n)
              * list_sum([ord(substring(text, i, 1)) FOR i IN range(1, n + 1)])
            + coalesce(list_sum([ord(substring(text, i, 1))
                                 FOR i IN range(1, (h * w * 3) % n + 1)]), 0)
            AS BIGINT) AS pix_sum
FROM d
""",
)
def img_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference S6 (resize) through the real Arrow path: each payload
    becomes a deterministic fake image, `resize_area` runs for real, and
    the query emits integer-exact facts the oracle can recompute —
    input dims (modular arithmetic), output dims (from the actual
    resized array, pinned to constants in SQL), and the pixel byte sum
    of the tiled image (cyclic-sum arithmetic). The pixel MATH of
    resize_area is unit-tested against the area-filter formula.
    """
    d = with_payload(table(spark, sf_dir, "documents")).select("doc_id", "payload")
    return d.mapInPandas(
        _resize_batches,
        schema="doc_id long, in_w int, in_h int, out_w int, out_h int, pix_sum long",
    )
