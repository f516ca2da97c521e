"""Unit tests for the pure-stdlib PNG/WAV codecs (functions/codecs.py) —
the decode side is validated against hand-built blobs, including PNGs
exercising every scanline filter type and corrupted-chunk rejection."""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest

from kafka_streams_example_spark.functions import codecs as cx


def test_png_roundtrip_gray8():
    w, h = 19, 13
    px = (hashlib.md5(b"pixels").digest() * (w * h // 16 + 1))[: w * h]
    d = cx.decode_png(cx.encode_png_gray8(w, h, px))
    assert (d["width"], d["height"], d["bit_depth"], d["color_type"], d["channels"]) == (
        w, h, 8, 0, 1,
    )
    assert d["pixels"] == px


def _png_from_filtered(width, height, raw, color_type=0):
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        cx.PNG_SIG
        + cx._png_chunk(b"IHDR", ihdr)
        + cx._png_chunk(b"IDAT", zlib.compress(raw))
        + cx._png_chunk(b"IEND", b"")
    )


def test_png_decode_all_five_filter_types():
    """Hand-filter known pixels with filters 0..4 (one per scanline) and
    confirm the decoder reconstructs them — covers Sub/Up/Average/Paeth,
    which our encoder never emits but real PNGs in the wild do."""
    recon_rows = [bytes([10, 20, 30]), bytes([35, 40, 45]), bytes([50, 60, 70]),
                  bytes([71, 82, 93]), bytes([90, 100, 110])]
    raw = b""
    for y, (f, r) in enumerate(zip([0, 1, 2, 3, 4], recon_rows)):
        line = bytearray([f])
        for i, v in enumerate(r):
            left = r[i - 1] if i >= 1 else 0
            up = recon_rows[y - 1][i] if y > 0 else 0
            ul = recon_rows[y - 1][i - 1] if (y > 0 and i >= 1) else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) // 2, 4: cx._paeth(left, up, ul)}[f]
            line.append((v - pred) & 0xFF)
        raw += bytes(line)
    d = cx.decode_png(_png_from_filtered(3, 5, raw))
    assert d["pixels"] == b"".join(recon_rows)


def test_png_rgb_and_rgba_bpp():
    """Color types 2 (RGB) and 6 (RGBA) decode with the right channel
    count and byte-per-pixel stride in the filter math."""
    for color_type, bpp in ((2, 3), (6, 4)):
        w, h = 4, 3
        px = bytes(range(w * h * bpp))
        raw = b"".join(
            b"\x00" + px[y * w * bpp : (y + 1) * w * bpp] for y in range(h)
        )
        d = cx.decode_png(_png_from_filtered(w, h, raw, color_type))
        assert d["channels"] == bpp
        assert d["pixels"] == px


def test_png_crc_tamper_rejected():
    blob = bytearray(cx.encode_png_gray8(4, 4, bytes(range(16))))
    blob[40] ^= 0xFF  # flip a byte inside a chunk
    with pytest.raises(ValueError):
        cx.decode_png(bytes(blob))


def test_png_bad_signature_rejected():
    with pytest.raises(ValueError, match="signature"):
        cx.decode_png(b"JFIF" + b"\x00" * 64)


def test_resize_nearest_identity_and_downsample():
    w, h = 6, 4
    px = bytes(range(w * h))
    assert cx.resize_gray8_nearest(px, w, h, w, h) == px
    half = cx.resize_gray8_nearest(px, w, h, 3, 2)
    # nearest-neighbor: output (ox,oy) samples source (ox*w//ow, oy*h//oh)
    assert half == bytes(
        px[(oy * 4 // 2) * w + (ox * 6 // 3)] for oy in range(2) for ox in range(3)
    )


def test_wav_roundtrip_mono_and_stereo():
    ss = [((31 * 7 + 17 * i) % 65536) - 32768 for i in range(100)]
    d = cx.decode_wav(cx.encode_wav_pcm16(16000, ss))
    assert d["samples"] == ss
    assert (d["n_channels"], d["sample_rate"], d["bits_per_sample"], d["n_samples"]) == (
        1, 16000, 16, 100,
    )
    d2 = cx.decode_wav(cx.encode_wav_pcm16(8000, ss[:20], n_channels=2))
    assert (d2["n_channels"], d2["n_samples"]) == (2, 10)


def test_wav_truncation_rejected():
    blob = cx.encode_wav_pcm16(16000, [1, 2, 3, 4])
    with pytest.raises(ValueError, match="length"):
        cx.decode_wav(blob[:-2])
