"""Pure-stdlib media codecs: PNG (zlib/struct) and WAV (struct).

These are REAL codecs, not stubs: the PNG path writes spec-conformant
files (signature, CRC-32-checked chunks, zlib-compressed filtered
scanlines per the PNG spec, ISO/IEC 15948) and the decoder does the full
inverse — chunk walk with CRC verification, IDAT inflate, per-scanline
unfiltering for ALL five filter types (None/Sub/Up/Average/Paeth).
The WAV path writes/parses canonical RIFF PCM.

They exist because this container has no PIL/libsndfile: the multimodal
operators (operators/multimodal.py) need a decode stage that actually
executes, and PNG/WAV are the two open formats simple enough to implement
from their public specifications with nothing but ``zlib`` and ``struct``.
Production swaps these for libvips/ffmpeg workers behind the same
mapInPandas kernel shape; everything Spark-side (schema, batching,
partitioning) is identical.

Self-contained on purpose: no imports from the rest of the package, so
the module can be shipped whole to Spark's Python workers (via
``cloudpickle.register_pickle_by_value``) without requiring the repo on
the worker's ``sys.path``.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# bytes per pixel for the color types the decoder supports (8-bit depth)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png_gray8(
    width: int, height: int, pixels: bytes, filter_type: int = 0, zlevel: int = 6
) -> bytes:
    """Encode 8-bit grayscale pixels (row-major, ``width*height`` bytes)
    as a real PNG: one filter byte per scanline, one zlib IDAT stream.

    ``filter_type`` selects the per-scanline filter the ENCODER writes
    (0=None, 1=Sub, 2=Up — spec §9); the decoder reverses all five
    regardless. Two encodes of the same pixels with different filters (or
    zlib levels) are byte-different blobs with identical decoded content —
    the re-encode shape perceptual dedup must catch and byte dedup cannot.
    """
    if len(pixels) != width * height:
        raise ValueError(f"need {width * height} pixels, got {len(pixels)}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    lines = []
    for y in range(height):
        row = pixels[y * width : (y + 1) * width]
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub: delta vs left neighbor (bpp=1)
            filt = bytes((row[i] - (row[i - 1] if i else 0)) & 0xFF for i in range(width))
        elif filter_type == 2:  # Up: delta vs previous scanline
            prev = pixels[(y - 1) * width : y * width] if y else b"\x00" * width
            filt = bytes((row[i] - prev[i]) & 0xFF for i in range(width))
        else:
            raise ValueError(f"encoder supports filter types 0/1/2, got {filter_type}")
        lines.append(bytes([filter_type]) + filt)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines), zlevel))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytes:
    """Reverse PNG scanline filtering (spec §9 'Filtering'). ``raw`` is
    height scanlines of (1 filter byte + width*bpp data bytes)."""
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"IDAT size mismatch: {len(raw)} != {height}*({stride}+1)"
        )
    out = bytearray(height * stride)
    prev_off = -1  # offset of previous reconstructed scanline in `out`
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        off = y * stride
        if ftype == 0:  # None
            out[off : off + stride] = line
        elif ftype == 1:  # Sub
            for i in range(stride):
                left = out[off + i - bpp] if i >= bpp else 0
                out[off + i] = (line[i] + left) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                up = out[prev_off + i] if y > 0 else 0
                out[off + i] = (line[i] + up) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = out[off + i - bpp] if i >= bpp else 0
                up = out[prev_off + i] if y > 0 else 0
                out[off + i] = (line[i] + (left + up) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = out[off + i - bpp] if i >= bpp else 0
                up = out[prev_off + i] if y > 0 else 0
                ul = out[prev_off + i - bpp] if (y > 0 and i >= bpp) else 0
                out[off + i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        prev_off = off
    return bytes(out)


def decode_png(blob: bytes) -> dict:
    """Full PNG decode: signature check, chunk walk with CRC-32
    verification, IHDR parse, IDAT concat + inflate, scanline unfilter.
    Supports 8-bit depth, color types 0/2/4/6 (gray, RGB, gray+alpha,
    RGBA), no interlacing. Returns ``{width, height, bit_depth,
    color_type, channels, pixels}``."""
    if blob[:8] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        tag = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", blob, pos + 8 + length)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, height, bit_depth, color_type, comp, filt, interlace = ihdr
    if bit_depth != 8 or color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG: depth={bit_depth} color={color_type}")
    if comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("unsupported PNG compression/filter/interlace method")
    bpp = _PNG_CHANNELS[color_type]
    pixels = _unfilter(zlib.decompress(bytes(idat)), width, height, bpp)
    return {
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "color_type": color_type,
        "channels": bpp,
        "pixels": pixels,
    }


def resize_gray8_nearest(
    pixels: bytes, width: int, height: int, out_width: int, out_height: int
) -> bytes:
    """Nearest-neighbor resample of an 8-bit grayscale pixel buffer —
    the real geometry transform behind resize_images' stdlib path."""
    out = bytearray(out_width * out_height)
    for oy in range(out_height):
        sy = min(oy * height // out_height, height - 1)
        row = sy * width
        obase = oy * out_width
        for ox in range(out_width):
            out[obase + ox] = pixels[row + min(ox * width // out_width, width - 1)]
    return bytes(out)


def dhash60(
    pixels: bytes, width: int, height: int, grid_w: int = 11, grid_h: int = 6
) -> int:
    """Difference hash (dHash — Krawetz's public perceptual-hash scheme)
    of an 8-bit grayscale image: nearest-neighbor downsample to a
    ``grid_w × grid_h`` thumbnail, then one bit per horizontal neighbor
    pair — set iff the left pixel is strictly brighter. The default
    11×6 grid yields 60 bits, matching the engine's SimHash width so the
    same 4×15-bit banding/Hamming near-dup machinery applies unchanged.

    Perceptually-equal images (re-encodes, filter/zlib variants, minor
    brightness-preserving noise) hash identically or within a few bits;
    unrelated images differ by ~30 of 60 bits.
    """
    p = resize_gray8_nearest(pixels, width, height, grid_w, grid_h)
    f = 0
    for oy in range(grid_h):
        row = oy * grid_w
        for ox in range(grid_w - 1):
            if p[row + ox] > p[row + ox + 1]:
                f |= 1 << (oy * (grid_w - 1) + ox)
    return f


def encode_wav_pcm16(sample_rate: int, samples: list[int], n_channels: int = 1) -> bytes:
    """Canonical RIFF/WAVE with one PCM16 'data' chunk (WAVE spec,
    multimedia programming interface reference). ``samples`` are
    interleaved int16 values in [-32768, 32767]."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(blob: bytes) -> dict:
    """Parse a RIFF/WAVE blob: chunk walk to fmt/data, PCM16 samples out.
    Returns ``{n_channels, sample_rate, bits_per_sample, n_samples,
    samples}`` where n_samples counts frames (per channel)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    (riff_len,) = struct.unpack_from("<I", blob, 4)
    if riff_len != len(blob) - 8:
        raise ValueError(f"RIFF length mismatch: {riff_len} != {len(blob) - 8}")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        tag = blob[pos : pos + 4]
        (length,) = struct.unpack_from("<I", blob, pos + 4)
        chunk = blob[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", chunk)
        elif tag == b"data":
            data = chunk
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_channels, sample_rate, _byte_rate, _align, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"unsupported WAV: fmt={audio_fmt} bits={bits}")
    n_vals = len(data) // 2
    samples = list(struct.unpack(f"<{n_vals}h", data[: n_vals * 2]))
    return {
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "bits_per_sample": bits,
        "n_samples": n_vals // n_channels,
        "samples": samples,
    }
