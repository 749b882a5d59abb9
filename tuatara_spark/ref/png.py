"""Pure-NumPy PNG decoder (stdlib zlib + per-scanline unfiltering).

Implements the subset every reference fixture uses (8-bit depth, color
types 0 gray / 2 RGB / 3 palette / 4 gray+alpha / 6 RGBA, non-interlaced),
from the public PNG specification (W3C PNG spec / RFC 2083) — no image
codec library exists in this container. This un-stubs the pipeline's S1
ingest for the reference's own entry format: examples/resume.cpp:9 reads
``images/*.png`` via cv::imread; like cv::imread's default IMREAD_COLOR we
return a 3-channel image (alpha dropped, gray replicated).

Output is (H, W, 3) uint8 RGB, directly consumable by
``ref.pipeline.extract_page`` / ``engine.extract_df``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# samples per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth_row(filt: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Paeth (filter 4) reconstruction of one scanline — sequential in x
    (recon[x] depends on recon[x-bpp]), vectorized across the bpp lanes."""
    n = filt.shape[0]
    recon = np.empty(n, dtype=np.int32)
    f = filt.astype(np.int32)
    b = prev.astype(np.int32)
    for x in range(0, n, bpp):
        a = recon[x - bpp:x] if x >= bpp else np.zeros(bpp, dtype=np.int32)
        c = b[x - bpp:x] if x >= bpp else np.zeros(bpp, dtype=np.int32)
        bb = b[x:x + bpp]
        p = a + bb - c
        pa, pb, pc = np.abs(p - a), np.abs(p - bb), np.abs(p - c)
        pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, bb, c))
        recon[x:x + bpp] = (f[x:x + bpp] + pred) & 0xFF
    return recon.astype(np.uint8)


def _average_row(filt: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Average (filter 3) reconstruction — sequential in x like Paeth."""
    n = filt.shape[0]
    recon = np.empty(n, dtype=np.int32)
    f = filt.astype(np.int32)
    b = prev.astype(np.int32)
    for x in range(0, n, bpp):
        a = recon[x - bpp:x] if x >= bpp else np.zeros(bpp, dtype=np.int32)
        recon[x:x + bpp] = (f[x:x + bpp] + ((a + b[x:x + bpp]) >> 1)) & 0xFF
    return recon.astype(np.uint8)


def _sub_row(filt: np.ndarray, bpp: int) -> np.ndarray:
    """Sub (filter 1): per-lane prefix sum mod 256 — fully vectorized."""
    lanes = filt.reshape(-1, bpp).astype(np.int64)
    return (np.cumsum(lanes, axis=0) & 0xFF).astype(np.uint8).reshape(-1)


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters (types 0-4). ``raw`` is the
    decompressed stream of h * (1 + stride) bytes."""
    raw = raw.reshape(h, 1 + stride)
    ftypes = raw[:, 0]
    data = raw[:, 1:]
    out = np.empty((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = int(ftypes[y])
        prev = out[y - 1] if y else zero
        row = data[y]
        if ft == 0:
            out[y] = row
        elif ft == 1:
            out[y] = _sub_row(row, bpp)
        elif ft == 2:
            out[y] = row + prev  # uint8 wraparound == mod 256
        elif ft == 3:
            out[y] = _average_row(row, prev, bpp)
        elif ft == 4:
            out[y] = _paeth_row(row, prev, bpp)
        else:
            raise ValueError(f"bad PNG filter type {ft} at row {y}")
    return out


def encode_png(img: np.ndarray, compress_level: int = 6) -> bytes:
    """Encode an (H, W[, 3]) uint8 image as an 8-bit RGB PNG (filter type
    0 per scanline + zlib). Grayscale input is replicated to 3 channels.
    Round-trips exactly through decode_png; used by the S30 debug dumps so
    annotated pages open in any viewer (the reference writes its annotated
    overlay as a PNG, bindings/run_ocr.py:82)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if img.shape[2] != 3:
        img = np.ascontiguousarray(img[..., :3])
    h, w = img.shape[:2]
    flat = img.reshape(h, w * 3)
    raw = bytearray()
    for y in range(h):
        raw.append(0)                      # filter type 0 (None)
        raw.extend(flat[y].tobytes())
    idat = zlib.compress(bytes(raw), compress_level)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def decode_png(buf: bytes) -> np.ndarray:
    """Decode a PNG byte string to (H, W, 3) uint8 RGB (alpha dropped,
    grayscale replicated — cv::imread IMREAD_COLOR semantics, but RGB
    channel order as the pipeline's Python-binding entry expects)."""
    if bytes(buf[:8]) != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(buf):
        clen, ctype = struct.unpack(">I4s", buf[pos:pos + 8])
        body = buf[pos + 8:pos + 8 + clen]
        pos += 12 + clen  # len + type + data + crc (crc not verified)
        if ctype == b"IHDR":
            (width, height, bit_depth, color_type,
             _comp, _filt, interlace) = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} "
                         "(only 8-bit supported)")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != height * (1 + stride):
        raise ValueError("PNG IDAT size mismatch")
    px = _unfilter(raw, height, stride, bpp=ch).reshape(height, width, ch)
    if color_type == 0:                      # gray
        return np.repeat(px, 3, axis=2)
    if color_type == 2:                      # RGB
        return px
    if color_type == 3:                      # palette
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        return palette[px[..., 0]]
    if color_type == 4:                      # gray + alpha
        return np.repeat(px[..., :1], 3, axis=2)
    return np.ascontiguousarray(px[..., :3])  # RGBA → RGB
