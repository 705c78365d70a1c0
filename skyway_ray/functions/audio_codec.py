"""Minimal PCM WAV codec (pure struct + numpy).

WAV/RIFF PCM is a trivial container, so the audio stage can be REAL
for it even in this codec-less environment: 16-bit PCM mono/stereo
encode/decode.  Compressed formats (mp3/ogg/flac) remain stubs —
``decode_wav`` raises ``NotImplementedError`` on non-RIFF input.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """(n,) or (n, channels) int16 → WAV bytes."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n, channels) int16, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError(
            "only PCM WAV decodes in this environment (no audio codecs "
            "for compressed formats)")
    pos = 12
    sample_rate = None
    channels = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        payload = data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
        if tag == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack("<HHI", payload[:8])
            if audio_fmt != 1:
                raise NotImplementedError("only PCM (format 1) WAV")
        elif tag == b"data":
            pcm = payload
    if pcm is None or sample_rate is None:
        raise ValueError("malformed WAV: missing fmt/data chunk")
    samples = np.frombuffer(pcm, dtype="<i2")
    return samples.reshape(-1, channels), sample_rate
