"""RIFF/WAVE codec (stdlib parsing + numpy): the REAL audio decode path
behind ``operators/multimodal.py``, closing the "audio honestly stubbed"
gap the same way imagecodec/jpegcodec closed images.

Scope (bounded, fully tested): integer PCM 8/16/24/32-bit and IEEE
float32, any channel count, WAVE_FORMAT_EXTENSIBLE unwrapped, chunk
walker tolerant of extra chunks (LIST/fact/cue) and odd-size padding.
Compressed WAV (ADPCM/mu-law) and other containers raise
NotImplementedError — swap in ffmpeg/libsndfile in production; the
Spark-side plumbing is format-agnostic.

Decoded form: ``(sample_rate, n_channels, samples)`` with samples a
float64 ndarray of shape (frames, channels) scaled to [-1, 1].
"""

from __future__ import annotations

import struct

import numpy as np


def sniff_wav(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """-> (sample_rate, n_channels, float64 (frames, channels) in [-1, 1])."""
    if not sniff_wav(payload):
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_ch, rate, _brate, _balign, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_format == 0xFFFE and len(fmt) >= 26:  # EXTENSIBLE
        (audio_format,) = struct.unpack("<H", fmt[24:26])
    if audio_format == 1:  # integer PCM
        if bits == 8:  # unsigned
            x = (np.frombuffer(data, np.uint8).astype(np.float64) - 128) / 128
        elif bits == 16:
            x = np.frombuffer(data, "<i2").astype(np.float64) / 32768
        elif bits == 24:
            raw = np.frombuffer(data, np.uint8)
            raw = raw[: len(raw) // 3 * 3].reshape(-1, 3).astype(np.int32)
            ints = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
            ints = np.where(ints >= 1 << 23, ints - (1 << 24), ints)
            x = ints.astype(np.float64) / (1 << 23)
        elif bits == 32:
            x = np.frombuffer(data, "<i4").astype(np.float64) / (1 << 31)
        else:
            raise NotImplementedError(f"PCM bit depth {bits}")
    elif audio_format == 3 and bits == 32:  # IEEE float
        x = np.frombuffer(data, "<f4").astype(np.float64)
    else:
        raise NotImplementedError(
            f"WAV audio format {audio_format} ({bits}-bit) — PCM and "
            f"float32 only without libsndfile"
        )
    if n_ch < 1:
        raise ValueError("WAV with zero channels")
    if rate < 1:
        raise ValueError("WAV with zero sample rate")
    frames = len(x) // n_ch
    return rate, n_ch, x[: frames * n_ch].reshape(frames, n_ch)


def encode_wav(
    rate: int, samples: np.ndarray, bits: int = 16
) -> bytes:
    """Minimal PCM16 writer (test-vector source + re-encode path).
    ``samples``: (frames,) or (frames, channels) floats in [-1, 1]."""
    if bits != 16:
        raise NotImplementedError("encode_wav writes PCM16 only")
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n_ch = x.shape[1]
    pcm = np.clip(np.rint(x * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_stats(rate: int, n_ch: int, x: np.ndarray) -> list[float]:
    """8 deterministic features (same vector length as imagecodec's
    channel_stats, so FEATURES_SCHEMA holds across modalities): frames,
    duration_s, channels, rms, peak, zero-crossing rate, sample rate, 0."""
    frames = x.shape[0]
    if frames == 0:
        return [0.0, 0.0, float(n_ch), 0.0, 0.0, 0.0, float(rate), 0.0]
    mono = x.mean(axis=1)
    rms = float(np.sqrt(np.mean(mono * mono)))
    peak = float(np.max(np.abs(mono)))
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    return [
        float(frames),
        round(frames / rate, 4),
        float(n_ch),
        round(rms, 4),
        round(peak, 4),
        round(zcr, 4),
        float(rate),
        0.0,
    ]
