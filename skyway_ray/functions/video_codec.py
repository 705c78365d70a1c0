"""SKWV — the deterministic synthetic video container.

No real video codec (ffmpeg/libav class) exists in this environment,
so — exactly like the SKWJ/SKWW image stubs in image_codec.py — SKWV is
an honest stand-in that makes every piece of the Ray-side PLUMBING
real and testable: container parse, per-frame decode, frame sampling,
scene-cut deltas, batched actor/task stages, blob-free driver outputs.
On a real cluster only this module is swapped for an ffmpeg binding;
the stages do not change.

Layout (little-endian):
  magic  b"SKWV"
  uint16 n_frames, height, width
  then per frame: uint32 compressed byte length + zlib(raw RGB bytes,
  level 6) of shape (height, width, 3) row-major uint8.

zlib at a fixed level is bit-deterministic, so fixtures are stable;
decode round-trips exactly (lossless), which is what lets the frame
kernels be hash-verified against the fixture's closed-form pixel
generator (fixtures.py::_gen_pixels replayed in SQL).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"SKWV"


def encode_video(frames: np.ndarray) -> bytes:
    """frames: uint8 array (T, H, W, 3) → SKWV container bytes."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    t, h, w, c = frames.shape
    if c != 3:
        raise ValueError("SKWV frames must be RGB (T, H, W, 3)")
    parts = [MAGIC, struct.pack("<HHH", t, h, w)]
    for f in range(t):
        comp = zlib.compress(frames[f].tobytes(), 6)
        parts.append(struct.pack("<I", len(comp)))
        parts.append(comp)
    return b"".join(parts)


def decode_video(data: bytes) -> np.ndarray:
    """SKWV bytes → uint8 array (T, H, W, 3).  Raises
    NotImplementedError for real-codec payloads (anything without the
    SKWV magic), mirroring the documented environment limit."""
    if data[:4] != MAGIC:
        raise NotImplementedError(
            "video decode is STUBBED for real codecs: no video library "
            "in this environment (only the synthetic SKWV container "
            "decodes — functions/video_codec.py)")
    t, h, w = struct.unpack_from("<HHH", data, 4)
    out = np.empty((t, h, w, 3), np.uint8)
    off = 10
    for f in range(t):
        (clen,) = struct.unpack_from("<I", data, off)
        off += 4
        raw = zlib.decompress(data[off:off + clen])
        out[f] = np.frombuffer(raw, np.uint8).reshape(h, w, 3)
        off += clen
    return out
