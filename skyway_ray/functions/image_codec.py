"""Image encode/decode kernels for the binary ``bytes`` column.

This container has **no image libraries** (no PIL / cv2 / libjpeg /
libwebp), so:

* ``png`` is a real, spec-conformant codec written against the public
  PNG specification (RFC 2083) using only ``zlib`` + ``struct`` + numpy
  — lossless, round-trips exactly.
* ``jpeg`` / ``webp`` are **deterministic fake lossy codecs** (STUB —
  clearly marked): the pixel array is quantized (simulating lossy
  error at PSNR ≈ 48 dB, comfortably above the 40 dB per-row invariant)
  and stored in a private container (magic ``SKWJ``/``SKWW``). They
  exercise the real Ray-side plumbing — binary columns, per-batch
  decode in actor pools, PSNR verification — and must be swapped for
  libjpeg/libwebp bindings on a real cluster.  Attempting to decode a
  *genuine* JPEG/WebP byte stream raises ``NotImplementedError``.

All functions operate on single images (HxWx3 uint8 RGB); batch stages
loop over rows of the binary column — unavoidable for variable-size
encoded payloads, and cheap relative to the codec work itself.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_FAKE_MAGIC = {"jpeg": b"SKWJ", "webp": b"SKWW"}
_FAKE_QUANT = 4  # quantization step -> max abs error 2, PSNR ~48dB


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Encode HxWx3 uint8 RGB as a valid PNG (color type 2, filter 0)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3, "RGB only"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type None per scanline
    raw[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, w: int) -> np.ndarray:
    """Reverse PNG scanline filters 0-4 (we emit 0 but accept all).

    Fast path: when every scanline is filter 0 (the only filter our
    encoder emits) the pixel data is the raw bytes minus the filter
    column — one vectorized slice instead of a per-row loop."""
    if not raw[:, 0].any():
        return raw[:, 1:].reshape(h, w, 3).copy()
    bpp = 3
    stride = w * 3
    out = np.zeros((h, stride), dtype=np.uint8)
    for r in range(h):
        ftype = raw[r, 0]
        line = raw[r, 1:].astype(np.int32)
        prev = out[r - 1].astype(np.int32) if r > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            res = line
        elif ftype == 2:  # Up
            res = (line + prev) & 0xFF
        else:  # Sub / Average / Paeth need left neighbor -> per-pixel scan
            res = np.zeros(stride, np.int32)
            for i in range(stride):
                a = res[i - bpp] if i >= bpp else 0
                b = prev[i]
                cc = prev[i - bpp] if i >= bpp else 0
                if ftype == 1:
                    res[i] = (line[i] + a) & 0xFF
                elif ftype == 3:
                    res[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                elif ftype == 4:
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    res[i] = (line[i] + pred) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter type {ftype}")
        out[r] = res.astype(np.uint8)
    return out.reshape(h, w, 3)


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 2 or interlace != 0:
                raise NotImplementedError("only 8-bit RGB non-interlaced PNG")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    raw = raw.reshape(h, 1 + w * 3)
    return _unfilter(raw, h, w)


def encode_fake_lossy(img: np.ndarray, fmt: str) -> bytes:
    """STUB lossy codec (see module docstring) — deterministic quantize
    + zlib, private SKWJ/SKWW container standing in for jpeg/webp."""
    magic = _FAKE_MAGIC[fmt]
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    q = (img.astype(np.int32) // _FAKE_QUANT * _FAKE_QUANT + _FAKE_QUANT // 2)
    q = np.clip(q, 0, 255).astype(np.uint8)
    return magic + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def decode_fake_lossy(data: bytes) -> np.ndarray:
    magic = data[:4]
    if magic not in _FAKE_MAGIC.values():
        raise NotImplementedError(
            "real jpeg/webp decoding is STUBBED in this environment "
            "(no libjpeg/libwebp); only SKWJ/SKWW fake-lossy streams decode"
        )
    w, h = struct.unpack(">II", data[4:12])
    raw = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8)
    return raw.reshape(h, w, 3)


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(img)
    if fmt in _FAKE_MAGIC:
        return encode_fake_lossy(img, fmt)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt in _FAKE_MAGIC:
        return decode_fake_lossy(data)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))
