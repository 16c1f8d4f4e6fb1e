"""Minimal pure-stdlib PNG decoder for the multimodal "real" tier.

This container ships no codec libraries (PIL/cv2), but PNG's data path
is all Python stdlib: chunked container parsing (struct) + DEFLATE
(zlib) + per-scanline unfiltering. Implementing it here makes
``decode_images(mode="real")`` genuinely functional instead of a
NotImplementedError stub, without any new dependency. When PIL *is*
present (production images at scale), the operator prefers it — this
decoder is the dependency-free fallback and the correctness yardstick
for it.

Supported: 8-bit depth, non-interlaced, color types 0 (gray),
2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA) — i.e. everything a
typical training-data PNG uses. 16-bit and Adam7 interlacing raise
``ValueError`` (decode those with PIL).

Reference: the PNG specification (RFC 2083) §§ 4-6; filter types
0-4 per § 6.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: channels per color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == PNG_MAGIC


def decode_png(data: bytes) -> tuple[int, int, int, float]:
    """Decode a PNG payload → (width, height, n_channels, mean_pixel).

    ``mean_pixel`` is the mean over every decoded channel sample,
    normalized to [0, 1] (palette images are expanded to RGB first so
    the statistic reflects colors, not palette indices).
    """
    data = bytes(data)
    if not is_png(data):
        raise ValueError("not a PNG payload (bad signature)")
    pos = 8
    width = height = bit_depth = color_type = interlace = None
    idat = bytearray()
    plte = b""
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        pos += 8
        chunk = data[pos:pos + length]
        pos += length + 4  # payload + CRC (CRC not verified: zlib's
        # adler32 on the pixel stream already catches corruption)
        if ctype == b"IHDR":
            (width, height, bit_depth, color_type,
             _comp, _filt, interlace) = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"PLTE":
            plte = chunk
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG: missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"PNG: unsupported bit depth {bit_depth}")
    if interlace != 0:
        raise ValueError("PNG: Adam7 interlacing not supported")
    if color_type not in _CHANNELS:
        raise ValueError(f"PNG: unsupported color type {color_type}")
    n_ch = _CHANNELS[color_type]
    stride = width * n_ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG: decompressed size mismatch")

    out = bytearray()
    prev = bytearray(stride)
    rpos = 0
    for _row in range(height):
        ftype = raw[rpos]
        line = bytearray(raw[rpos + 1:rpos + 1 + stride])
        rpos += 1 + stride
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(n_ch, stride):
                line[i] = (line[i] + line[i - n_ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - n_ch] if i >= n_ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - n_ch] if i >= n_ch else 0
                b = prev[i]
                c = prev[i - n_ch] if i >= n_ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out += line
        prev = line

    if color_type == 3:  # expand palette indices to RGB
        if not plte:
            raise ValueError("PNG: palette image without PLTE chunk")
        rgb = bytearray()
        for v in out:
            rgb += plte[3 * v:3 * v + 3]
        out = rgb
        n_ch = 3
    mean_pixel = (sum(out) / len(out) / 255.0) if out else 0.0
    return width, height, n_ch, mean_pixel
