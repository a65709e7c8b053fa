"""Dependency-free image codecs: PNG (zlib DEFLATE, filters 0-4), binary
PPM, baseline JPEG (via ``kernels/jpegcodec.py`` — stdlib parsing + numpy
DCT), and GIF87a/89a (via ``kernels/gifcodec.py`` — full LZW, interlace).

Closes the round-2 "image decode honestly stubbed" gap for the formats
decodable without PIL/libvips: PNG is zlib + per-scanline filters, PPM a
header + raw bytes, baseline JPEG is implemented outright in jpegcodec,
and GIF in gifcodec. operators/multimodal.py uses this as its REAL decode
path; the remaining stubs are WebP and inter-frame video codecs
(H.264/VP9) — those raise NotImplementedError (swap in libvips/ffmpeg in
production; the Spark-side plumbing is format-agnostic). MJPEG-in-MP4
frame extraction is real via kernels/mp4codec.py + decode_jpeg.

Scope (deliberately small, fully tested): 8-bit depth; PNG color types
0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA); no interlace, no palette.
Decoded form: (width, height, channels, pixels) with ``pixels`` a flat
``bytearray`` of row-major samples — cheap to slice into Arrow buffers and
dependency-free.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff_format(payload: bytes) -> str | None:
    """'png' | 'ppm' | 'jpeg' | 'gif' | None for anything else."""
    if payload.startswith(_PNG_SIG):
        return "png"
    if payload.startswith(b"P6"):
        return "ppm"
    if payload.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return None


# --- PNG ---------------------------------------------------------------------


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> tuple[int, int, int, bytearray]:
    """-> (width, height, channels, flat row-major samples)."""
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos = len(_PNG_SIG)
    width = height = None
    channels = 0
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth}")
            if color not in _CHANNELS:
                raise NotImplementedError(f"PNG color type {color}")
            if interlace:
                raise NotImplementedError("interlaced PNG")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG size mismatch")
    out = bytearray(stride * height)
    for y in range(height):
        fbyte = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        o = y * stride
        if fbyte == 0:  # None
            out[o : o + stride] = line
        elif fbyte == 1:  # Sub
            for i, v in enumerate(line):
                left = out[o + i - channels] if i >= channels else 0
                out[o + i] = (v + left) & 0xFF
        elif fbyte == 2:  # Up
            if y == 0:
                out[o : o + stride] = line
            else:
                for i, v in enumerate(line):
                    out[o + i] = (v + out[o + i - stride]) & 0xFF
        elif fbyte == 3:  # Average
            for i, v in enumerate(line):
                left = out[o + i - channels] if i >= channels else 0
                up = out[o + i - stride] if y > 0 else 0
                out[o + i] = (v + (left + up) // 2) & 0xFF
        elif fbyte == 4:  # Paeth
            for i, v in enumerate(line):
                left = out[o + i - channels] if i >= channels else 0
                up = out[o + i - stride] if y > 0 else 0
                ul = (
                    out[o + i - stride - channels]
                    if (y > 0 and i >= channels)
                    else 0
                )
                out[o + i] = (v + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"PNG filter {fbyte}")
    return width, height, channels, out


def encode_png(
    width: int, height: int, channels: int, pixels: bytes | bytearray
) -> bytes:
    """Filter-0 PNG encoder (valid, unoptimized)."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw.extend(pixels[y * stride : (y + 1) * stride])
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


# --- PPM (P6, maxval 255) ----------------------------------------------------


def decode_ppm(payload: bytes) -> tuple[int, int, int, bytearray]:
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM")
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> data
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to EOL
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise NotImplementedError(f"PPM maxval {maxval}")
    need = width * height * 3
    data = payload[i : i + need]
    if len(data) != need:
        raise ValueError("PPM truncated")
    return width, height, 3, bytearray(data)


def encode_ppm(width: int, height: int, pixels: bytes | bytearray) -> bytes:
    return b"P6\n%d %d\n255\n" % (width, height) + bytes(pixels)


# --- ops over decoded pixels -------------------------------------------------


def decode_image(payload: bytes) -> tuple[int, int, int, bytearray]:
    fmt = sniff_format(payload)
    if fmt == "png":
        return decode_png(payload)
    if fmt == "ppm":
        return decode_ppm(payload)
    if fmt == "jpeg":
        from xwikire_spark.kernels.jpegcodec import decode_jpeg

        return decode_jpeg(payload)
    if fmt == "gif":
        from xwikire_spark.kernels.gifcodec import decode_gif

        return decode_gif(payload)
    raise NotImplementedError(
        "only PNG/PPM/baseline-JPEG/GIF decode in-container; other codecs "
        "(WebP/video frames) need PIL/libvips in production"
    )


def encode_image(
    fmt: str | None,
    width: int,
    height: int,
    channels: int,
    pixels: bytes | bytearray,
) -> bytes:
    """Family-preserving re-encode: ppm stays ppm, jpeg stays jpeg
    (baseline 4:4:4), gif stays gif (nearest-resized GIF pixels are a
    palette subset, so <=256 colors is guaranteed; >256 falls back to
    PNG), everything else becomes PNG (lossless container for any channel
    count)."""
    if fmt == "ppm" and channels == 3:
        return encode_ppm(width, height, pixels)
    if fmt == "jpeg" and channels in (1, 3):
        from xwikire_spark.kernels.jpegcodec import encode_jpeg

        return encode_jpeg(width, height, channels, pixels)
    if fmt == "gif" and channels == 3:
        from xwikire_spark.kernels.gifcodec import encode_gif

        try:
            return encode_gif(width, height, pixels)
        except ValueError:  # >256 distinct colors (non-GIF-origin pixels)
            pass
    return encode_png(width, height, channels, pixels)


def resize_nearest(
    width: int,
    height: int,
    channels: int,
    pixels: bytes | bytearray,
    new_w: int,
    new_h: int,
) -> bytearray:
    """Nearest-neighbor resample (deterministic, dependency-free)."""
    out = bytearray(new_w * new_h * channels)
    for y in range(new_h):
        sy = min(y * height // new_h, height - 1)
        src_row = sy * width * channels
        dst_row = y * new_w * channels
        for x in range(new_w):
            sx = min(x * width // new_w, width - 1)
            s = src_row + sx * channels
            d = dst_row + x * channels
            out[d : d + channels] = pixels[s : s + channels]
    return out


def channel_stats(
    width: int, height: int, channels: int, pixels: bytes | bytearray
) -> list[float]:
    """8 deterministic features: w, h, c, then per-channel means (padded to
    4 with 0.0), global min — the REAL-decode feature vector multimodal
    emits (same length as the fake-path vector)."""
    n = width * height
    means = []
    for c in range(channels):
        means.append(sum(pixels[c::channels]) / max(n, 1))
    means += [0.0] * (4 - len(means))
    return [
        float(width),
        float(height),
        float(channels),
        *[round(m, 4) for m in means[:4]],
        float(min(pixels) if pixels else 0),
    ]
