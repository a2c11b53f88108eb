"""Dependency-free codecs for the three uncompressed container formats the
media pipeline synthesizes and decodes: 24-bit BMP (images), PCM16 mono WAV
(audio) and YUV4MPEG2/C420 (video).  All three are public, byte-exact
formats simple enough to parse with numpy alone — no image/audio libraries
exist in this environment, so these are the REAL decode kernels behind
``pipelines.multimodal`` (compressed formats — JPEG/MP3/H.264 — genuinely
need codecs and stay behind ``NotImplementedError``).

Encoders exist so the synthetic corpus carries genuine format payloads; the
decoders parse headers and pixel/sample planes from the bytes (bottom-up
BMP rows, row padding, RIFF chunk walking, Y4M frame markers), so a decode
bug shows up as an oracle mismatch, not a silent agreement with the writer.
"""

from __future__ import annotations

import struct

import numpy as np

_BMP_HEADER_BYTES = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)
_WAV_HEADER_BYTES = 44  # RIFF + fmt(16) + data header


def encode_bmp(gray: np.ndarray) -> bytes:
    """(H, W) uint8 grayscale → 24-bit bottom-up BMP (B=G=R=gray)."""
    h, w = gray.shape
    row = ((w * 3 + 3) // 4) * 4  # rows pad to 4-byte boundaries
    size = _BMP_HEADER_BYTES + row * h
    out = bytearray(size)
    struct.pack_into("<2sIHHI", out, 0, b"BM", size, 0, 0, _BMP_HEADER_BYTES)
    struct.pack_into(
        "<IiiHHIIiiII", out, 14, 40, w, h, 1, 24, 0, row * h, 2835, 2835, 0, 0
    )
    px = np.zeros((h, row), dtype=np.uint8)
    bgr = np.repeat(gray[:, :, None], 3, axis=2).reshape(h, w * 3)
    px[:, : w * 3] = bgr
    out[_BMP_HEADER_BYTES:] = px[::-1].tobytes()  # bottom-up row order
    return bytes(out)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BMP → (H, W, 3) uint8 (B, G, R channel order as stored)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr_size < 40 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={comp})")
    flip = h > 0  # positive height = bottom-up rows
    h = abs(h)
    row = ((w * 3 + 3) // 4) * 4
    px = np.frombuffer(payload, dtype=np.uint8, count=row * h, offset=pix_off)
    px = px.reshape(h, row)[:, : w * 3]
    if flip:
        px = px[::-1]
    return px.reshape(h, w, 3)


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """1-D int16 samples → PCM16 mono RIFF/WAVE."""
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """PCM16 mono WAV → (sample_rate, int16 samples).  Walks the RIFF
    chunks (fmt may not directly precede data in the wild)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, clen = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body, 0)[:6]
            if fmt != 1 or ch != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV variant (fmt={fmt}, ch={ch}, bits={bits})"
                )
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    return rate, data


def encode_y4m(y_frames: np.ndarray) -> bytes:
    """(T, H, W) uint8 Y planes → YUV4MPEG2 C420 (U = V = 128; even dims)."""
    t, h, w = y_frames.shape
    if w % 2 or h % 2:
        raise ValueError("C420 requires even dimensions")
    header = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()
    uv = np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
    parts = [header]
    for f in range(t):
        parts.append(b"FRAME\n")
        parts.append(np.ascontiguousarray(y_frames[f]).tobytes())
        parts.append(uv)  # U plane
        parts.append(uv)  # V plane
    return b"".join(parts)


def decode_y4m(payload: bytes) -> np.ndarray:
    """YUV4MPEG2 C420 → (T, H, W) uint8 Y planes (chroma skipped)."""
    nl = payload.index(b"\n")
    head = payload[:nl].decode("ascii", "replace").split(" ")
    if head[0] != "YUV4MPEG2":
        raise ValueError("not a Y4M payload")
    w = h = None
    for p in head[1:]:
        if p.startswith("W"):
            w = int(p[1:])
        elif p.startswith("H"):
            h = int(p[1:])
        elif p.startswith("C") and p != "C420":
            raise ValueError(f"unsupported Y4M chroma {p}")
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    frame_len = w * h + 2 * ((w // 2) * (h // 2))
    pos, frames = nl + 1, []
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("Y4M frame marker missing")
        pos = payload.index(b"\n", pos) + 1
        frames.append(
            np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=pos)
            .reshape(h, w)
        )
        pos += frame_len
    return np.stack(frames)


def sniff_kind(payload: bytes) -> str | None:
    """Container sniffing by magic bytes; None = format this environment
    has no codec for."""
    if payload[:2] == b"BM":
        return "image"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio"
    if payload[:9] == b"YUV4MPEG2":
        return "video"
    return None
