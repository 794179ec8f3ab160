"""Pure-Python media codecs: binary PPM (P6), 24-bit uncompressed BMP,
and PCM16 WAV — real encode/decode, no external libraries.

The container ships no image/audio libraries (PIL/cv2/soundfile), but
these three formats are simple enough to implement from their public
specs, which upgrades the multimodal pipeline from "stubbed decode" to
a real decode path: payload bytes are genuinely parsed (headers
validated, row padding / channel order / sample widths handled) before
features are computed. Swapping in PIL/ffmpeg for JPEG/H.264 changes
only this module.

Reference parity: the reference (metasoarous/tripl) has no media
handling at all — this belongs to the driver-mandated training-data
extensions. The formats follow the public Netpbm spec, the Windows
BITMAPINFOHEADER layout, and the RIFF/WAVE PCM layout.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# PPM (P6, maxval 255)
# ---------------------------------------------------------------------------


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Binary PPM: ``P6 <w> <h> 255\\n`` header + raw RGB bytes."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(pixels)}")
    return b"P6 %d %d 255\n" % (width, height) + pixels


def decode_ppm(data: bytes, offset: int = 0) -> tuple[int, int, bytes, int]:
    """Parse one P6 image starting at ``offset``. Returns
    (width, height, rgb_pixels, next_offset) — ``next_offset`` supports
    concatenated-frame streams (our stand-in for video containers)."""
    if data[offset:offset + 2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic + 3 whitespace-separated ints, then ONE whitespace byte
    fields: list[int] = []
    i = offset + 2
    while len(fields) < 3:
        while data[i:i + 1].isspace():
            i += 1
        j = i
        # bound the token scan: past end-of-data the slice is b'' whose
        # isspace() is False, so an unbounded loop would spin forever on
        # a truncated header — raise instead of hanging the executor task
        while not data[j:j + 1].isspace():
            if j >= len(data):
                raise ValueError("truncated PPM header")
            j += 1
        if j == i:
            raise ValueError("malformed PPM header")
        fields.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    n = width * height * 3
    pixels = data[i:i + n]
    if len(pixels) != n:
        raise ValueError("truncated PPM pixel data")
    return width, height, pixels, i + n


# ---------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, 24-bit BI_RGB)
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """24-bit uncompressed BMP. ``pixels`` is top-down RGB; BMP stores
    bottom-up BGR rows padded to 4 bytes — this does the real layout."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(pixels)}")
    row_size = (width * 3 + 3) & ~3
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, 3)
    rows = bytearray()
    pad = b"\x00" * (row_size - width * 3)
    for y in range(height - 1, -1, -1):  # bottom-up
        rows += img[y, :, ::-1].tobytes() + pad  # RGB -> BGR
    data_size = row_size * height
    file_size = 14 + 40 + data_size
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       data_size, 2835, 2835, 0, 0)
    return header + info + bytes(rows)


def decode_bmp(data: bytes) -> tuple[int, int, bytes]:
    """Parse a 24-bit BI_RGB BMP → (width, height, top-down RGB bytes)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    header_size, width, height = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if header_size < 40 or bpp != 24 or compression != 0:
        raise ValueError("only 24-bit uncompressed BITMAPINFOHEADER supported")
    bottom_up = height > 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3
    out = np.empty((height, width, 3), dtype=np.uint8)
    for row in range(height):
        y = (height - 1 - row) if bottom_up else row
        start = pixel_offset + row * row_size
        bgr = np.frombuffer(data, dtype=np.uint8,
                            count=width * 3, offset=start).reshape(width, 3)
        out[y] = bgr[:, ::-1]
    return width, height, out.tobytes()


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM16 mono/stereo)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 8000,
               channels: int = 1) -> bytes:
    """PCM16 WAV from an int16 sample array (interleaved if stereo)."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, channels,
                      sample_rate, byte_rate, channels * 2, 16)
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE")
    return riff + fmt + data


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a PCM16 WAV → (sample_rate, channels, int16 samples).
    Walks RIFF chunks properly (fmt/data may have siblings)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, channels, pcm = 12, None, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only PCM16 supported")
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    return rate, channels, np.frombuffer(pcm, dtype="<i2")


# ---------------------------------------------------------------------------
# Raster ops on decoded pixels
# ---------------------------------------------------------------------------


def resize_nearest(width: int, height: int, pixels: bytes,
                   new_width: int, new_height: int) -> bytes:
    """Nearest-neighbor resample of an RGB byte grid (floor mapping —
    the standard src = floor(dst * src_dim / dst_dim))."""
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, 3)
    ys = (np.arange(new_height) * height) // new_height
    xs = (np.arange(new_width) * width) // new_width
    return img[ys][:, xs].tobytes()


def decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """Format-dispatching image decode (magic-byte sniffing), the real
    replacement for the round-1 stub."""
    if payload[:2] == b"P6":
        w, h, px, _ = decode_ppm(payload)
        return w, h, px
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise ValueError(f"unknown image format: {payload[:2]!r}")


def decode_frames(payload: bytes) -> list[tuple[int, int, bytes]]:
    """Decode a concatenated-PPM stream (our video stand-in container)
    into per-frame (width, height, rgb) tuples."""
    frames = []
    offset = 0
    while offset < len(payload):
        w, h, px, offset = decode_ppm(payload, offset)
        frames.append((w, h, px))
    return frames
