"""Pure-codec unit tests: round-trips, golden bytes for a checked-in
tiny image, layout edge cases (BMP row padding, WAV chunk alignment)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tripl_spark.operators import media_codecs as mc

# A golden 2x2 24-bit BMP (red, green / blue, white), verified
# byte-for-byte against the public BITMAPINFOHEADER layout: 54-byte
# header, bottom-up BGR rows, each row padded from 6 to 8 bytes.
GOLDEN_2X2_PIXELS = bytes(
    [255, 0, 0,   0, 255, 0,    # top row:    red, green
     0, 0, 255,   255, 255, 255]  # bottom row: blue, white
)
GOLDEN_2X2_BMP = (
    b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
    + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 2835, 2835, 0, 0)
    # bottom row first (bottom-up), BGR order, 2 pad bytes per row
    + bytes([255, 0, 0, 255, 255, 255, 0, 0])
    + bytes([0, 0, 255, 0, 255, 0, 0, 0])
)


def test_bmp_golden_encode():
    assert mc.encode_bmp(2, 2, GOLDEN_2X2_PIXELS) == GOLDEN_2X2_BMP


def test_bmp_golden_decode():
    w, h, px = mc.decode_bmp(GOLDEN_2X2_BMP)
    assert (w, h) == (2, 2)
    assert px == GOLDEN_2X2_PIXELS


@pytest.mark.parametrize("w,h", [(1, 1), (2, 2), (3, 5), (7, 4), (16, 16)])
def test_bmp_roundtrip_padded_widths(w, h):
    # odd widths exercise the 4-byte row-padding path
    rng = np.random.RandomState(w * 100 + h)
    px = rng.randint(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
    assert mc.decode_bmp(mc.encode_bmp(w, h, px)) == (w, h, px)


@pytest.mark.parametrize("w,h", [(1, 1), (4, 4), (13, 9)])
def test_ppm_roundtrip(w, h):
    rng = np.random.RandomState(w + h)
    px = rng.randint(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
    data = mc.encode_ppm(w, h, px)
    got_w, got_h, got_px, end = mc.decode_ppm(data)
    assert (got_w, got_h, got_px, end) == (w, h, px, len(data))


def test_ppm_concatenated_frames():
    frames = [
        np.full(4 * 4 * 3, i * 10, dtype=np.uint8).tobytes() for i in range(5)
    ]
    stream = b"".join(mc.encode_ppm(4, 4, f) for f in frames)
    decoded = mc.decode_frames(stream)
    assert [px for _, _, px in decoded] == frames


def test_decode_image_dispatch():
    px = bytes(range(12))
    assert mc.decode_image(mc.encode_bmp(2, 2, px)) == (2, 2, px)
    assert mc.decode_image(mc.encode_ppm(2, 2, px)) == (2, 2, px)
    with pytest.raises(ValueError):
        mc.decode_image(b"\x89PNG....")


def test_wav_roundtrip_includes_extreme_samples():
    samples = np.array([-32768, -1, 0, 1, 32767, 12345], dtype=np.int16)
    rate, ch, got = mc.decode_wav(mc.encode_wav(samples, 44100))
    assert (rate, ch) == (44100, 1)
    assert np.array_equal(got, samples)


def test_wav_odd_sized_sibling_chunk_is_skipped():
    # RIFF chunks are word-aligned; an odd-sized LIST chunk before data
    # must not derail the walk
    base = mc.encode_wav(np.array([5, -5], dtype=np.int16), 8000)
    riff_head, rest = base[:12], base[12:]
    odd_chunk = struct.pack("<4sI", b"LIST", 3) + b"abc" + b"\x00"  # pad byte
    patched = riff_head + odd_chunk + rest
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    rate, _, got = mc.decode_wav(patched)
    assert rate == 8000 and np.array_equal(got, np.array([5, -5], dtype=np.int16))


def test_resize_nearest_golden():
    # 2x2 -> 4x4 nearest: each source pixel becomes a 2x2 block
    src = GOLDEN_2X2_PIXELS
    out = mc.resize_nearest(2, 2, src, 4, 4)
    img = np.frombuffer(out, dtype=np.uint8).reshape(4, 4, 3)
    assert img[0, 0].tolist() == [255, 0, 0] and img[1, 1].tolist() == [255, 0, 0]
    assert img[0, 3].tolist() == [0, 255, 0]
    assert img[3, 0].tolist() == [0, 0, 255]
    assert img[3, 3].tolist() == [255, 255, 255]


def test_resize_nearest_identity():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=6 * 3 * 3, dtype=np.uint8).tobytes()
    assert mc.resize_nearest(6, 3, px, 6, 3) == px


def test_decode_ppm_truncated_header_raises():
    import pytest as _pytest

    from tripl_spark.operators.media_codecs import decode_ppm

    # truncated mid-header: must raise, not spin forever on the token scan
    with _pytest.raises(ValueError):
        decode_ppm(b"P6 12")
    with _pytest.raises((ValueError, IndexError)):
        decode_ppm(b"P6")
