"""Dependency-free decoders for uncompressed media formats.

The container has no PIL/ffmpeg, but BMP (BI_RGB), PPM/PGM (binary
P6/P5) and WAV (PCM) are header-described raw payloads that need nothing
beyond numpy — so the multimodal stages decode those for REAL and only
fall back to the declared deterministic-fake path for compressed formats
(JPEG/PNG/MP3/...). Encoders for the same formats exist so tests and
demos can synthesize valid payloads without external fixtures.

All decoders raise ``ValueError`` on malformed input (stages map that to
their error/fallback policy) and operate vectorized on the pixel/sample
payload via ``np.frombuffer`` — no per-pixel Python.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

__all__ = [
    'sniff_format',
    'decode_bmp', 'decode_ppm', 'decode_wav',
    'encode_bmp', 'encode_ppm', 'encode_wav',
]


def sniff_format(payload: bytes) -> Optional[str]:
    """Best-effort container sniff: 'bmp' | 'ppm' | 'wav' | None."""
    if len(payload) < 12:
        return None
    if payload[:2] == b'BM':
        return 'bmp'
    if payload[:2] in (b'P6', b'P5') and payload[2:3] in b' \t\n\r':
        return 'ppm'
    if payload[:4] == b'RIFF' and payload[8:12] == b'WAVE':
        return 'wav'
    return None


# ---------------------------------------------------------------------------
# BMP (Windows DIB, BI_RGB uncompressed, 24/8 bpp)
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> Tuple[int, int, np.ndarray]:
    """BMP → (width, height, grayscale float32 array of shape (h, w))."""
    if len(payload) < 54 or payload[:2] != b'BM':
        raise ValueError('not a BMP payload')
    pixel_offset = int.from_bytes(payload[10:14], 'little')
    width = int.from_bytes(payload[18:22], 'little', signed=True)
    height = int.from_bytes(payload[22:26], 'little', signed=True)
    bpp = int.from_bytes(payload[28:30], 'little')
    compression = int.from_bytes(payload[30:34], 'little')
    if compression != 0:
        raise ValueError(f'compressed BMP (method {compression}) unsupported')
    if bpp not in (8, 24):
        raise ValueError(f'{bpp}-bpp BMP unsupported')
    if width <= 0 or height == 0:
        raise ValueError('degenerate BMP dimensions')
    bottom_up = height > 0
    height = abs(height)
    row_bytes = (width * (bpp // 8) + 3) & ~3  # rows pad to 4 bytes
    need = pixel_offset + row_bytes * height
    if len(payload) < need:
        raise ValueError('truncated BMP pixel data')
    raw = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * height,
                        offset=pixel_offset).reshape(height, row_bytes)
    if bpp == 24:
        px = raw[:, : width * 3].reshape(height, width, 3).astype(np.float32)
        gray = px.mean(axis=2) / 255.0  # stored BGR; mean is channel-symmetric
    else:
        gray = raw[:, :width].astype(np.float32) / 255.0
    if bottom_up:
        gray = gray[::-1]
    return width, height, gray


def encode_bmp(gray: np.ndarray) -> bytes:
    """Grayscale (h, w) float [0,1] or uint8 → 24-bpp BI_RGB BMP bytes."""
    g = np.asarray(gray)
    if g.dtype != np.uint8:
        g = (np.clip(g, 0.0, 1.0) * 255).astype(np.uint8)
    h, w = g.shape
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rgb = np.repeat(g[:, :, None], 3, axis=2)
    rows[:, : w * 3] = rgb.reshape(h, w * 3)
    pixels = rows[::-1].tobytes()  # bottom-up storage
    pixel_offset = 14 + 40
    size = pixel_offset + len(pixels)
    header = (
        b'BM' + size.to_bytes(4, 'little') + b'\x00\x00\x00\x00'
        + pixel_offset.to_bytes(4, 'little')
        + (40).to_bytes(4, 'little')
        + w.to_bytes(4, 'little', signed=True)
        + h.to_bytes(4, 'little', signed=True)
        + (1).to_bytes(2, 'little')
        + (24).to_bytes(2, 'little')
        + (0).to_bytes(4, 'little')        # BI_RGB
        + len(pixels).to_bytes(4, 'little')
        + (2835).to_bytes(4, 'little') * 2  # 72 dpi
        + (0).to_bytes(4, 'little') * 2
    )
    return header + pixels


# ---------------------------------------------------------------------------
# PPM / PGM (binary P6 / P5)
# ---------------------------------------------------------------------------


def _ppm_header_tokens(payload: bytes, count: int) -> Tuple[list, int]:
    """Parse `count` whitespace/comment-separated ASCII tokens after the
    magic; returns (tokens, offset past the single whitespace byte that
    terminates the header)."""
    tokens = []
    i = 2
    n = len(payload)
    while len(tokens) < count:
        while i < n and payload[i] in b' \t\r\n':
            i += 1
        if i < n and payload[i] == ord('#'):
            while i < n and payload[i] != ord('\n'):
                i += 1
            continue
        start = i
        while i < n and payload[i] not in b' \t\r\n':
            i += 1
        if start == i:
            raise ValueError('truncated PPM header')
        tokens.append(int(payload[start:i]))
    return tokens, i + 1  # exactly one whitespace byte after maxval


def decode_ppm(payload: bytes) -> Tuple[int, int, np.ndarray]:
    """PPM (P6) / PGM (P5) → (width, height, grayscale float32 (h, w))."""
    magic = payload[:2]
    if magic not in (b'P6', b'P5'):
        raise ValueError('not a binary PPM/PGM payload')
    (width, height, maxval), offset = _ppm_header_tokens(payload, 3)
    if width <= 0 or height <= 0 or not (0 < maxval < 65536):
        raise ValueError('degenerate PPM header')
    if maxval > 255:
        raise ValueError('16-bit PPM unsupported')
    channels = 3 if magic == b'P6' else 1
    need = width * height * channels
    if len(payload) < offset + need:
        raise ValueError('truncated PPM pixel data')
    raw = np.frombuffer(payload, dtype=np.uint8, count=need, offset=offset)
    if channels == 3:
        gray = raw.reshape(height, width, 3).astype(np.float32).mean(axis=2)
    else:
        gray = raw.reshape(height, width).astype(np.float32)
    return width, height, gray / float(maxval)


def encode_ppm(gray: np.ndarray) -> bytes:
    """Grayscale (h, w) float [0,1] or uint8 → binary P5 PGM bytes."""
    g = np.asarray(gray)
    if g.dtype != np.uint8:
        g = (np.clip(g, 0.0, 1.0) * 255).astype(np.uint8)
    h, w = g.shape
    return b'P5\n%d %d\n255\n' % (w, h) + g.tobytes()


# ---------------------------------------------------------------------------
# WAV (RIFF PCM, 8/16-bit)
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> Tuple[int, int, np.ndarray]:
    """WAV → (sample_rate, channels, mono float32 samples in [-1, 1])."""
    if len(payload) < 44 or payload[:4] != b'RIFF' or payload[8:12] != b'WAVE':
        raise ValueError('not a WAV payload')
    i = 12
    fmt = None
    data = None
    n = len(payload)
    while i + 8 <= n:
        cid = payload[i:i + 4]
        clen = int.from_bytes(payload[i + 4:i + 8], 'little')
        body = payload[i + 8:i + 8 + clen]
        if cid == b'fmt ':
            fmt = body
        elif cid == b'data':
            data = body
        i += 8 + clen + (clen & 1)  # chunks pad to even length
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError('missing fmt/data chunk')
    audio_format = int.from_bytes(fmt[0:2], 'little')
    channels = int.from_bytes(fmt[2:4], 'little')
    sample_rate = int.from_bytes(fmt[4:8], 'little')
    bits = int.from_bytes(fmt[14:16], 'little')
    if audio_format != 1 or bits not in (8, 16) or channels < 1:
        raise ValueError(f'non-PCM or {bits}-bit WAV unsupported')
    if bits == 16:
        samples = np.frombuffer(
            data, dtype='<i2', count=len(data) // 2,
        ).astype(np.float32) / 32768.0
    else:
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.float32)
                   - 128.0) / 128.0
    if channels > 1:
        usable = (len(samples) // channels) * channels
        samples = samples[:usable].reshape(-1, channels).mean(axis=1)
    return sample_rate, channels, samples


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Mono float [-1, 1] samples → 16-bit PCM WAV bytes."""
    s = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = (s * 32767).astype('<i2').tobytes()
    hdr_len = 36 + len(pcm)
    return (
        b'RIFF' + hdr_len.to_bytes(4, 'little') + b'WAVE'
        + b'fmt ' + (16).to_bytes(4, 'little')
        + (1).to_bytes(2, 'little')            # PCM
        + (1).to_bytes(2, 'little')            # mono
        + sample_rate.to_bytes(4, 'little')
        + (sample_rate * 2).to_bytes(4, 'little')
        + (2).to_bytes(2, 'little')            # block align
        + (16).to_bytes(2, 'little')           # bits
        + b'data' + len(pcm).to_bytes(4, 'little') + pcm
    )
