"""Real pure-Python image codecs for the media-decode injection point.

The reference's page-image step (ref: dataextractai/parsers_core/...) shells
out to native decoders; this container has no image libraries, so
``operators/multimodal.py`` stubs the REAL decode behind a ``decoder=``
parameter. This module makes that injection point non-hypothetical: two
complete, spec-faithful, dependency-free codecs —

- **BMP** (Windows BITMAPINFOHEADER, 24-bit uncompressed): bottom-up AND
  top-down (negative height) rows, 4-byte row padding, pixel-array offset
  honored from the file header (robust to gap bytes / extended headers).
- **PNG** (8-bit truecolor, non-interlaced): full chunk walk with CRC-32
  verification, zlib inflate, and ALL FIVE scanline filters (None/Sub/Up/
  Average/Paeth) de-filtered per the PNG spec, not just the inverse of our
  own encoder.

``real_media_decoder`` dispatches on magic bytes and produces the 8-double
feature vector consumed by ``extract_media_features(decoder=...)`` with
``allow_fake=False`` — the production example the stub guard documents.
Everything is executor-side Python over Arrow batches (mapInPandas); at
100 TB the payload column never reaches a plan that doesn't decode (column
pruning), and decode batches stay bounded by arrow maxRecordsPerBatch.
"""

from __future__ import annotations

import struct
import zlib

# ---------------------------------------------------------------------------
# BMP — 24-bit uncompressed (BI_RGB), BITMAPFILEHEADER + BITMAPINFOHEADER
# ---------------------------------------------------------------------------

_BMP_PIXEL_OFFSET = 14 + 40  # file header + info header, no palette


def encode_bmp24(width: int, height: int, rgb: bytes, top_down: bool = False) -> bytes:
    """Encode row-major top-down RGB bytes as a standard 24-bit BMP.

    ``top_down=False`` writes the conventional bottom-up pixel array with a
    positive biHeight; ``top_down=True`` writes rows as-is with a negative
    biHeight (both are spec-legal and both must decode)."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"rgb length {len(rgb)} != {width}x{height}x3")
    stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (stride - width * 3)
    rows = range(height) if top_down else range(height - 1, -1, -1)
    body = bytearray()
    for y in rows:
        row = rgb[y * width * 3 : (y + 1) * width * 3]
        # BMP stores BGR triplets
        bgr = bytearray(len(row))
        bgr[0::3] = row[2::3]
        bgr[1::3] = row[1::3]
        bgr[2::3] = row[0::3]
        body += bgr + pad
    file_size = _BMP_PIXEL_OFFSET + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, _BMP_PIXEL_OFFSET)
    bi_height = -height if top_down else height
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, bi_height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + info + bytes(body)


def decode_bmp24(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a 24-bit uncompressed BMP to (width, height, top-down RGB).

    Honors the pixel-array offset from the file header (so files with gap
    bytes or a larger-than-40-byte DIB header still decode), positive
    (bottom-up) and negative (top-down) heights, and per-row padding."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (_, _file_size, _, _, data_offset) = struct.unpack_from("<2sIHHI", payload, 0)
    (bi_size, width, bi_height, planes, bitcount, compression) = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bi_size < 40:
        raise ValueError(f"unsupported DIB header size {bi_size}")
    if planes != 1 or bitcount != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (planes={planes}, bpp={bitcount}, "
            f"compression={compression}); only 24-bit BI_RGB is implemented"
        )
    top_down = bi_height < 0
    height = -bi_height if top_down else bi_height
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{bi_height}")
    stride = (width * 3 + 3) & ~3
    if data_offset + stride * height > len(payload):
        raise ValueError("truncated BMP pixel array")
    rgb = bytearray(width * height * 3)
    for i in range(height):
        y = i if top_down else height - 1 - i
        row = payload[data_offset + i * stride : data_offset + i * stride + width * 3]
        out = bytearray(width * 3)
        out[0::3] = row[2::3]
        out[1::3] = row[1::3]
        out[2::3] = row[0::3]
        rgb[y * width * 3 : (y + 1) * width * 3] = out
    return width, height, bytes(rgb)


# ---------------------------------------------------------------------------
# PNG — 8-bit truecolor (color type 2), non-interlaced
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _filter_row(ftype: int, row: bytes, prev: bytes, bpp: int) -> bytes:
    """Apply PNG filter ``ftype`` to a raw scanline (encoder side)."""
    n = len(row)
    out = bytearray(n)
    if ftype == 0:
        return bytes(row)
    for i in range(n):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            out[i] = (row[i] - a) & 0xFF
        elif ftype == 2:
            out[i] = (row[i] - b) & 0xFF
        elif ftype == 3:
            out[i] = (row[i] - (a + b) // 2) & 0xFF
        else:  # 4: Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (row[i] - pred) & 0xFF
    return bytes(out)


def _unfilter_row(ftype: int, row: bytearray, prev: bytes, bpp: int) -> None:
    """Reverse a PNG scanline filter in place (decoder side, spec 9.2)."""
    n = len(row)
    if ftype == 0:
        return
    if ftype == 1:
        for i in range(bpp, n):
            row[i] = (row[i] + row[i - bpp]) & 0xFF
    elif ftype == 2:
        for i in range(n):
            row[i] = (row[i] + prev[i]) & 0xFF
    elif ftype == 3:
        for i in range(n):
            a = row[i - bpp] if i >= bpp else 0
            row[i] = (row[i] + (a + prev[i]) // 2) & 0xFF
    elif ftype == 4:
        for i in range(n):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            row[i] = (row[i] + pred) & 0xFF
    else:
        raise ValueError(f"unknown PNG filter type {ftype}")


def encode_png_rgb(
    width: int, height: int, rgb: bytes, filter_per_row: bool = True
) -> bytes:
    """Encode top-down RGB bytes as an 8-bit truecolor PNG.

    ``filter_per_row=True`` applies filter ``y % 5`` to row ``y`` so a
    roundtrip exercises every de-filter path in the decoder (a real encoder
    would pick per-row by heuristic; deterministic rotation keeps oracles
    exact). ``False`` emits filter 0 everywhere."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"rgb length {len(rgb)} != {width}x{height}x3")
    bpp = 3
    raw = bytearray()
    prev = bytes(width * bpp)
    for y in range(height):
        row = rgb[y * width * bpp : (y + 1) * width * bpp]
        ftype = (y % 5) if filter_per_row else 0
        raw.append(ftype)
        raw += _filter_row(ftype, row, prev, bpp)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png_rgb(payload: bytes) -> tuple[int, int, bytes]:
    """Decode an 8-bit truecolor non-interlaced PNG to (w, h, top-down RGB).

    Walks chunks verifying each CRC-32, concatenates IDAT streams, inflates,
    and reverses all five scanline filters."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    width, height, depth, ctype_, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or ctype_ != 2 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={ctype_}, "
            f"interlace={interlace}); only 8-bit truecolor non-interlaced"
        )
    raw = zlib.decompress(bytes(idat))
    bpp, rowlen = 3, width * 3
    if len(raw) != height * (rowlen + 1):
        raise ValueError("inflated scanline length mismatch")
    rgb = bytearray(height * rowlen)
    prev = bytes(rowlen)
    for y in range(height):
        off = y * (rowlen + 1)
        row = bytearray(raw[off + 1 : off + 1 + rowlen])
        _unfilter_row(raw[off], row, prev, bpp)
        rgb[y * rowlen : (y + 1) * rowlen] = row
        prev = bytes(row)
    return width, height, bytes(rgb)


# ---------------------------------------------------------------------------
# feature extraction over decoded pixels — the production decoder= example
# ---------------------------------------------------------------------------


def pixel_features(width: int, height: int, rgb: bytes) -> list[float]:
    """8 deterministic doubles from decoded pixels: dimensions, per-channel
    sums (mod 1e6 to stay exact in a double), byte min/max, and an adler32
    whole-buffer checksum — so a single wrong byte anywhere in the decode
    roundtrip changes the feature vector."""
    return [
        float(width),
        float(height),
        float(sum(rgb[0::3]) % 1000000),
        float(sum(rgb[1::3]) % 1000000),
        float(sum(rgb[2::3]) % 1000000),
        float(min(rgb)),
        float(max(rgb)),
        float(zlib.adler32(rgb) % 1000000),
    ]


def real_media_decoder(payload: bytes, kind: str) -> list[float]:
    """REAL decoder for ``extract_media_features(decoder=..., allow_fake=
    False)``: dispatches on magic bytes (BMP / PNG), decodes fully (CRC,
    filters, padding), and featurizes the pixels. Raises on any payload it
    cannot genuinely decode — no silent fake fallback."""
    if payload[:2] == b"BM":
        return pixel_features(*decode_bmp24(payload))
    if payload[:8] == _PNG_SIG:
        return pixel_features(*decode_png_rgb(payload))
    raise ValueError(f"unsupported media magic {payload[:8]!r} for kind={kind}")


def synth_media_real(spark, n: int, partitions: int = 8):
    """Deterministic media table whose payloads are REAL encoded images:
    even ids carry 24-bit BMP (alternating bottom-up / top-down via id//2
    parity), odd ids carry 8-bit truecolor PNG with the per-row filter
    rotation — so a full scan decode exercises every codec path. Shape
    mirrors ``multimodal.synth_media`` (MEDIA schema); no external data."""
    import pandas as pd

    from .multimodal import MEDIA

    def gen(batches):
        for pdf in batches:
            rows = []
            for k in pdf["id"]:
                k = int(k)
                w, h = 8 + k % 9, 6 + k % 7
                rgb = synth_pixels(k, w, h)
                if k % 2 == 0:
                    payload = encode_bmp24(w, h, rgb, top_down=(k // 2) % 2 == 1)
                    codec = "bmp"
                else:
                    payload = encode_png_rgb(w, h, rgb, filter_per_row=True)
                    codec = "png"
                rows.append(
                    {
                        "media_id": k,
                        "kind": "image",
                        "payload": payload,
                        "meta": {"codec": codec, "width": str(w), "height": str(h)},
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).repartition(partitions).mapInPandas(gen, schema=MEDIA)


def synth_pixels(k: int, width: int, height: int) -> bytes:
    """Deterministic pixel pattern for media id ``k`` — closed-form per
    (x, y, channel) so oracles can recompute features WITHOUT running the
    encoder or decoder (genuine roundtrip independence)."""
    out = bytearray(width * height * 3)
    i = 0
    for y in range(height):
        for x in range(width):
            base = k * 31 + y * 17 + x * 7
            out[i] = base % 256
            out[i + 1] = (base + 13) % 256
            out[i + 2] = (base + 26) % 256
            i += 3
    return bytes(out)
