"""Pure-stdlib media codecs: PNG (zlib/struct), baseline JPEG
(struct/math), and WAV (struct) — plus the dHash perceptual fingerprint
over decoded pixels.

These are REAL codecs, not stubs: the PNG path writes spec-conformant
files (signature, CRC-32-checked chunks, zlib-compressed filtered
scanlines per the PNG spec, ISO/IEC 15948) and the decoder does the full
inverse — chunk walk with CRC verification, IDAT inflate, per-scanline
unfiltering for ALL five filter types (None/Sub/Up/Average/Paeth).
The JPEG path implements baseline ITU-T T.81 for grayscale end-to-end
(DCT, quantization, zigzag, DC-difference + AC run-length Huffman with
the Annex K tables, byte stuffing; and the full decoder inverse).
The WAV path writes/parses canonical RIFF PCM.

They exist because this container has no PIL/libjpeg/libsndfile: the
multimodal operators (operators/multimodal.py) need a decode stage that
actually executes, and PNG/JPEG/WAV are open formats implementable from
their public specifications with nothing but ``zlib``/``struct``/``math``.
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


def _png_text_chunk_bytes(text_chunks) -> bytes:
    """Serialize (keyword, value) metadata pairs as spec-conformant
    ancillary chunks (spec §11.3.4): tEXt for plain latin-1 values, zTXt
    (deflate method 0) when the value is prefixed with ``"z:"`` — the
    marker is stripped; it only selects the chunk type. Keywords must be
    1-79 latin-1 chars per spec."""
    out = b""
    for keyword, value in text_chunks:
        kb = keyword.encode("latin-1")
        if not 1 <= len(kb) <= 79:
            raise ValueError(f"PNG keyword length out of range: {keyword!r}")
        if value.startswith("z:"):
            out += _png_chunk(
                b"zTXt", kb + b"\x00\x00" + zlib.compress(value[2:].encode("latin-1"))
            )
        else:
            out += _png_chunk(b"tEXt", kb + b"\x00" + value.encode("latin-1"))
    return out


def png_text_chunks(blob: bytes) -> list:
    """Parse a PNG's tEXt/zTXt ancillary metadata chunks into
    (keyword, value, compressed) tuples, CRC-verified like the pixel
    path. Other ancillary chunks are skipped; a malformed stream raises
    (callers map it to per-row degradation, same contract as decode)."""
    if blob[:8] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    out = []
    while pos < len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        tag = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", blob, pos + 8 + length)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"tEXt":
            kw, _, val = data.partition(b"\x00")
            out.append((kw.decode("latin-1"), val.decode("latin-1"), False))
        elif tag == b"zTXt":
            kw, _, rest = data.partition(b"\x00")
            if rest[:1] != b"\x00":
                raise ValueError("unsupported zTXt compression method")
            out.append(
                (kw.decode("latin-1"),
                 zlib.decompress(rest[1:]).decode("latin-1"), True)
            )
        elif tag == b"IEND":
            break
        pos += 12 + length
    return out


def encode_png_gray8(
    width: int, height: int, pixels: bytes, filter_type: int = 0, zlevel: int = 6,
    text_chunks=None,
) -> bytes:
    """Encode 8-bit grayscale pixels (row-major, ``width*height`` bytes)
    as a real PNG: one filter byte per scanline, one zlib IDAT stream.

    ``filter_type`` selects the per-scanline filter the ENCODER writes
    (0=None, 1=Sub, 2=Up — spec §9); the decoder reverses all five
    regardless. Two encodes of the same pixels with different filters (or
    zlib levels) are byte-different blobs with identical decoded content —
    the re-encode shape perceptual dedup must catch and byte dedup cannot.

    ``text_chunks`` (optional list of (keyword, value) pairs) writes
    tEXt/zTXt ancillary metadata between IHDR and IDAT — see
    _png_text_chunk_bytes; the pixel decode path skips them, the
    metadata path (png_text_chunks) parses them back.
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
        + (_png_text_chunk_bytes(text_chunks) if text_chunks else b"")
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


def _png_parse(blob: bytes) -> tuple[int, int, int, int, int, bytes]:
    """Shared PNG front end: signature check, chunk walk with CRC-32
    verification, IHDR parse, IDAT concat + inflate. Returns ``(width,
    height, bit_depth, color_type, bpp, raw)`` where ``raw`` is the
    decompressed filtered scanline stream (the unfilter stage — the only
    per-pixel work — is pluggable: stdlib loop here, numpy in
    codecs_np)."""
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
    return width, height, bit_depth, color_type, bpp, zlib.decompress(bytes(idat))


def decode_png(blob: bytes) -> dict:
    """Full PNG decode: signature check, chunk walk with CRC-32
    verification, IHDR parse, IDAT concat + inflate, scanline unfilter.
    Supports 8-bit depth, color types 0/2/4/6 (gray, RGB, gray+alpha,
    RGBA), no interlacing. Returns ``{width, height, bit_depth,
    color_type, channels, pixels}``."""
    width, height, bit_depth, color_type, bpp, raw = _png_parse(blob)
    pixels = _unfilter(raw, width, height, bpp)
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


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81 / ISO 10918-1) — grayscale, stdlib-only.
#
# A REAL codec, not a stub: the encoder writes spec-conformant baseline
# JFIF streams (DQT/SOF0/DHT/SOS markers, forward DCT, quantization,
# zigzag, DC-difference + AC run-length Huffman coding with the spec's
# Annex K example tables, 0xFF byte stuffing) and the decoder does the
# full inverse (marker walk, DHT canonical-code construction, bit reader
# with stuffing removal, entropy decode, dequantize, inverse zigzag,
# full 2D IDCT, level shift + clamp). Grayscale only — the one-component
# case needs no chroma subsampling/upsampling — and no progressive mode,
# restart markers, or arithmetic coding (rejected loudly, not silently
# mis-decoded). Production swaps this for libjpeg-turbo workers behind
# the same mapInPandas kernel; the wire format and block math here are
# the real thing.
# ---------------------------------------------------------------------------

# Annex K.3 example Huffman tables (luminance): BITS = code counts for
# lengths 1..16, VALS = symbols in code order. The tables ride the DHT
# segment, so the decoder always builds its codes from the FILE.
_JPG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPG_DC_VALS = list(range(12))
_JPG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# zigzag scan order: _JPG_ZIGZAG[k] = (row-major) coefficient index of the
# k-th zigzagged element (spec Figure 5)
_JPG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# DCT basis: _JPG_COS[x][u] = cos((2x+1) u pi / 16); C(0)=1/sqrt(2)
import math as _math

_JPG_COS = [
    [_math.cos((2 * x + 1) * u * _math.pi / 16) for u in range(8)] for x in range(8)
]
_JPG_C = [1 / _math.sqrt(2)] + [1.0] * 7


def _jpg_canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per the spec's canonical construction
    (Annex C): codes of each length assigned in value order."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _jpg_category(v: int) -> int:
    """Size category S: smallest S with |v| < 2^S (0 for v == 0)."""
    s, a = 0, abs(v)
    while a:
        s += 1
        a >>= 1
    return s


class _JpgBitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (spec F.1.2.3)
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            byte = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF  # 1-fill
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.acc, self.n = 0, 0
        return bytes(self.buf)


def _jpg_fdct(block: list[int]) -> list[float]:
    """Forward 2D DCT-II of one level-shifted 8×8 block (row-major)."""
    out = [0.0] * 64
    for v in range(8):
        for u in range(8):
            s = 0.0
            for y in range(8):
                cy = _JPG_COS[y][v]
                base = y * 8
                for x in range(8):
                    s += block[base + x] * _JPG_COS[x][u] * cy
            out[v * 8 + u] = 0.25 * _JPG_C[u] * _JPG_C[v] * s
    return out


def _jpg_idct(coef: list[int]) -> list[float]:
    """Inverse 2D DCT of one dequantized 8×8 coefficient block."""
    out = [0.0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                cv = _JPG_C[v] * _JPG_COS[y][v]
                base = v * 8
                for u in range(8):
                    c = coef[base + u]
                    if c:
                        s += _JPG_C[u] * c * _JPG_COS[x][u] * cv
            out[y * 8 + x] = 0.25 * s
    return out


# Encoder code tables are the fixed Annex K pair — build once at import
# (the decoder still constructs its tables from the FILE's DHT segment).
_JPG_DC_CODES = _jpg_canonical_codes(_JPG_DC_BITS, _JPG_DC_VALS)
_JPG_AC_CODES = _jpg_canonical_codes(_JPG_AC_BITS, _JPG_AC_VALS)


def _jpg_check_quant(quant: list[int] | None) -> list[int]:
    q = list(quant) if quant is not None else [1] * 64
    if len(q) != 64 or any(not (1 <= v <= 255) for v in q):
        raise ValueError("quant table must be 64 entries in 1..255")
    return q


def _jpg_entropy_encode(zz_blocks) -> bytes:
    """Entropy-code quantized blocks (each a 64-entry zigzag-order list)
    with DC-difference + AC run-length Huffman (Annex K tables) and byte
    stuffing; returns the flushed scan bytes. Shared between the stdlib
    and numpy encoders — only the DCT/quantize stage differs."""
    w = _JpgBitWriter()
    write = w.write
    dc_codes, ac_codes = _JPG_DC_CODES, _JPG_AC_CODES
    pred = 0
    for zz in zz_blocks:
        diff = zz[0] - pred
        pred = zz[0]
        s = _jpg_category(diff)
        write(*dc_codes[s])
        if s:
            write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        for k in range(1, 64):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                write(*ac_codes[0xF0])  # ZRL
                run -= 16
            s = _jpg_category(zz[k])
            write(*ac_codes[(run << 4) | s])
            write(zz[k] if zz[k] >= 0 else zz[k] + (1 << s) - 1, s)
            run = 0
        if run:
            write(*ac_codes[0x00])  # EOB
    return w.flush()


def _jpg_seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


# DHT and SOS segments are constants of the encoder (the Annex K tables
# ride every stream); the DQT segment depends only on the quant table,
# cached per table — rebuilding these per image was ~70us/image.
_JPG_DHT_SOS_SEGS = _jpg_seg(
    0xC4,
    bytes([0x00]) + bytes(_JPG_DC_BITS) + bytes(_JPG_DC_VALS)
    + bytes([0x10]) + bytes(_JPG_AC_BITS) + bytes(_JPG_AC_VALS),
) + _jpg_seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
_JPG_DQT_SEG_CACHE: dict[tuple, bytes] = {}


def _jpg_misc_segments(jfif, comments) -> bytes:
    """Serialize the tables/misc metadata segments (T.81 B.2.4.5-6) an
    encoder may place after SOI: a JFIF APP0 (JFIF 1.02 identifier +
    version/units/density, no thumbnail) and any number of COM segments
    (latin-1 text). Shared by the stdlib and numpy encoders so both
    emit identical wire bytes."""
    out = b""
    if jfif is not None:
        vmaj, vmin, units, xd, yd = jfif
        out += _jpg_seg(
            0xE0,
            b"JFIF\x00" + struct.pack(">BBBHHBB", vmaj, vmin, units, xd, yd, 0, 0),
        )
    for c in comments or ():
        out += _jpg_seg(0xFE, c.encode("latin-1"))
    return out


def jpeg_metadata(blob: bytes) -> dict:
    """Parse a JPEG's metadata segments without touching the pixel path:
    walks the header section with the same spec-conformance rules as
    ``_jpg_parse`` (0xFF fill bytes per B.1.1.2, length-less TEM/RSTn per
    B.1.1.3), collecting COM comment strings and the typed JFIF APP0
    fields, stopping at SOS. Returns ``{"comments": [str, ...],
    "jfif": None | {"version", "units", "x_density", "y_density"}}``."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    comments: list[str] = []
    jfif = None
    while pos + 2 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"marker sync lost at byte {pos}")
        while pos + 1 < len(blob) and blob[pos + 1] == 0xFF:
            pos += 1
        marker = blob[pos + 1]
        if marker in (0xD9, 0xDA):  # EOI / SOS: header section over
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(blob):
            raise ValueError("truncated JPEG: segment header past end")
        (seg_len,) = struct.unpack_from(">H", blob, pos + 2)
        payload = blob[pos + 4 : pos + 2 + seg_len]
        if marker == 0xFE:  # COM
            comments.append(payload.decode("latin-1"))
        elif marker == 0xE0 and payload[:5] == b"JFIF\x00":
            if len(payload) < 12:
                raise ValueError("truncated JFIF APP0")
            vmaj, vmin, units, xd, yd = struct.unpack_from(">BBBHH", payload, 5)
            jfif = {
                "version": f"{vmaj}.{vmin:02d}",
                "units": units,
                "x_density": xd,
                "y_density": yd,
            }
        pos += 2 + seg_len
    return {"comments": comments, "jfif": jfif}


def _jpg_wrap_stream(
    width: int, height: int, q: list[int], entropy: bytes, misc: bytes = b""
) -> bytes:
    """Assemble the JFIF stream: SOI, [misc metadata], DQT, SOF0, DHT,
    SOS, scan, EOI."""
    qk = tuple(q)
    dqt = _JPG_DQT_SEG_CACHE.get(qk)
    if dqt is None:
        zz_q = bytes(q[_JPG_ZIGZAG[k]] for k in range(64))
        dqt = _jpg_seg(0xDB, bytes([0x00]) + zz_q)  # DQT, table 0, 8-bit
        if len(_JPG_DQT_SEG_CACHE) >= 64:
            _JPG_DQT_SEG_CACHE.clear()
        _JPG_DQT_SEG_CACHE[qk] = dqt
    return (
        b"\xff\xd8"  # SOI
        + misc
        + dqt
        + _jpg_seg(
            0xC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
        )
        + _JPG_DHT_SOS_SEGS
        + entropy
        + b"\xff\xd9"  # EOI
    )


def encode_jpeg_gray8(
    width: int,
    height: int,
    pixels: bytes,
    quant: list[int] | None = None,
    jfif: tuple[int, int, int, int, int] | None = None,
    comments: list[str] | None = None,
) -> bytes:
    """Encode 8-bit grayscale pixels as a baseline JPEG (one component,
    no subsampling). ``quant`` is the 64-entry quantization table in
    row-major order (default all-1 = numerically lossless for blocks
    whose DCT quantizes to integers, e.g. per-block-constant images).
    Edge blocks replicate the last row/column (the conventional pad).
    ``jfif`` = (ver_major, ver_minor, units, x_density, y_density) emits
    a JFIF APP0 after SOI; ``comments`` emits COM text segments — both
    parse back via ``jpeg_metadata`` and are ignored by the pixel path."""
    if len(pixels) != width * height:
        raise ValueError(f"need {width * height} pixels, got {len(pixels)}")
    q = _jpg_check_quant(quant)

    zz_blocks = []
    for by in range(0, height, 8):
        for bx in range(0, width, 8):
            block = []
            for y in range(8):
                sy = min(by + y, height - 1)
                row = sy * width
                for x in range(8):
                    block.append(pixels[row + min(bx + x, width - 1)] - 128)
            coef = _jpg_fdct(block)
            # quantize (round half away from zero, the symmetric choice)
            zz = []
            for k in range(64):
                c = coef[_JPG_ZIGZAG[k]] / q[_JPG_ZIGZAG[k]]
                zz.append(int(c + 0.5) if c >= 0 else -int(-c + 0.5))
            zz_blocks.append(zz)
    return _jpg_wrap_stream(
        width, height, q, _jpg_entropy_encode(zz_blocks),
        misc=_jpg_misc_segments(jfif, comments),
    )


class _JpgBitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker in entropy stream")
                self.pos += 1  # skip stuffed 0x00
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _jpg_read_huff(reader: _JpgBitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _jpg_extend(v: int, s: int) -> int:
    """Sign-extend a received S-bit magnitude (spec F.2.2.1 EXTEND)."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# decode-table cache keyed on raw DHT bytes (see the DHT branch below)
_JPG_DHT_CACHE: dict[bytes, dict] = {}


def _jpg_parse(blob: bytes) -> tuple[int, int, list[int], dict, dict, bytes]:
    """Shared JPEG front end: marker walk, DQT/DHT/SOF0/SOS parse,
    canonical Huffman construction. Returns ``(width, height, q, dc_tbl,
    ac_tbl, entropy_bytes)`` — everything the back end (entropy decode +
    IDCT, stdlib here / numpy in codecs_np) consumes."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    scan = None
    while pos + 2 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"marker sync lost at byte {pos}")
        # Any number of 0xFF fill bytes may pad before a marker (spec
        # B.1.1.2); the marker id is the first non-0xFF byte after them.
        while pos + 1 < len(blob) and blob[pos + 1] == 0xFF:
            pos += 1
        marker = blob[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / RSTn:
            pos += 2  # standalone markers carry no length field (B.1.1.3)
            continue
        if pos + 4 > len(blob):
            raise ValueError("truncated JPEG: segment header past end")
        (seg_len,) = struct.unpack_from(">H", blob, pos + 2)
        payload = blob[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                prec, tid = payload[p] >> 4, payload[p] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = list(payload[p + 1 : p + 65])
                tbl = [0] * 64
                for k in range(64):
                    tbl[_JPG_ZIGZAG[k]] = zz[k]
                qtables[tid] = tbl
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                # (code,len)→symbol decode tables are cached on the raw
                # DHT bytes: table construction (~170 dict entries for
                # the Annex K AC table) was a third of per-image decode
                # time, and real corpora carry a handful of distinct
                # tables (most encoders ship the Annex K pair verbatim)
                key = bytes(payload[p + 1 : p + 17 + nv])
                tbl = _JPG_DHT_CACHE.get(key)
                if tbl is None:
                    vals = list(payload[p + 17 : p + 17 + nv])
                    codes = _jpg_canonical_codes(bits, vals)
                    tbl = {
                        (code, length): sym
                        for sym, (code, length) in codes.items()
                    }
                    if len(_JPG_DHT_CACHE) >= 64:  # adversarial-stream bound
                        _JPG_DHT_CACHE.clear()
                    _JPG_DHT_CACHE[key] = tbl
                htables[(cls, tid)] = tbl
                p += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8 or nc != 1:
                raise ValueError(f"unsupported JPEG: precision={prec} components={nc}")
            comp_id, sampling, tq = payload[6], payload[7], payload[8]
            if sampling != 0x11:
                raise ValueError("subsampled grayscale makes no sense; bad stream")
            sof = (w, h, tq)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline JPEG (SOF marker 0x{marker:02x})")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows the header
            ns = payload[0]
            if ns != 1:
                raise ValueError("multi-component scan unsupported")
            td, ta = payload[2] >> 4, payload[2] & 0x0F
            scan = (td, ta, pos + 2 + seg_len)
            break
        # APPn/COM/anything else: skip by length
        pos += 2 + seg_len
    if sof is None or scan is None:
        raise ValueError("missing SOF0/SOS")
    width, height, tq = sof
    td, ta, data_start = scan
    data_end = blob.rfind(b"\xff\xd9")
    if data_end < 0:
        raise ValueError("missing EOI")
    q = qtables[tq]
    dc_tbl, ac_tbl = htables[(0, td)], htables[(1, ta)]
    return width, height, q, dc_tbl, ac_tbl, blob[data_start:data_end]


def _jpg_entropy_decode(
    entropy: bytes, dc_tbl: dict, ac_tbl: dict, n_blocks: int
) -> list[int]:
    """Entropy-decode ``n_blocks`` blocks: Huffman read, EXTEND, DC
    prediction accumulation. Returns a flat ``n_blocks * 64`` list of
    ZIGZAG-ORDER coefficients (DC already un-differenced, NOT yet
    dequantized). Shared between the stdlib and numpy decoders — only
    dequant/IDCT/assembly differ."""
    reader = _JpgBitReader(entropy)
    out: list[int] = []
    pred = 0
    for _ in range(n_blocks):
        zz = [0] * 64
        s = _jpg_read_huff(reader, dc_tbl)
        diff = _jpg_extend(reader.bits(s), s) if s else 0
        pred += diff
        zz[0] = pred
        k = 1
        while k < 64:
            sym = _jpg_read_huff(reader, ac_tbl)
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                k += 16
                continue
            run, s = sym >> 4, sym & 0x0F
            k += run
            if k > 63:
                raise ValueError("AC coefficient index out of range")
            zz[k] = _jpg_extend(reader.bits(s), s)
            k += 1
        out.extend(zz)
    return out


def decode_jpeg(blob: bytes) -> dict:
    """Full baseline-JPEG decode for grayscale (1-component) streams:
    marker walk, DQT/DHT/SOF0/SOS parse, canonical Huffman construction,
    entropy decode with byte-unstuffing, dequantize, inverse zigzag,
    2D IDCT, level shift + clamp. Progressive/arithmetic/multi-component/
    restart-interval streams raise ValueError (unsupported, never
    mis-decoded). Returns ``{width, height, bit_depth, n_components,
    pixels}`` with pixels cropped to width×height row-major."""
    width, height, q, dc_tbl, ac_tbl, entropy = _jpg_parse(blob)
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    zz_flat = _jpg_entropy_decode(entropy, dc_tbl, ac_tbl, bw * bh)
    out = bytearray(bw * 8 * bh * 8)
    for bi in range(bw * bh):
        byi, bxi = bi // bw, bi % bw
        zz = zz_flat[bi * 64 : (bi + 1) * 64]
        coef = [0] * 64
        for kk in range(64):
            coef[_JPG_ZIGZAG[kk]] = zz[kk] * q[_JPG_ZIGZAG[kk]]
        spatial = _jpg_idct(coef)
        for y in range(8):
            orow = (byi * 8 + y) * bw * 8 + bxi * 8
            for x in range(8):
                v = int(round(spatial[y * 8 + x])) + 128
                out[orow + x] = 0 if v < 0 else (255 if v > 255 else v)
    # crop the padded MCU grid back to the declared dims
    pixels = bytes(
        out[y * bw * 8 + x] for y in range(height) for x in range(width)
    ) if (bw * 8 != width or bh * 8 != height) else bytes(out)
    return {
        "width": width,
        "height": height,
        "bit_depth": 8,
        "n_components": 1,
        "pixels": pixels,
    }
