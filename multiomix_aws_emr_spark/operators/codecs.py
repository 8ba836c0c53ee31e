"""Stdlib-only image codecs for the multimodal tier.

The container bakes no media libraries, but "decode" must still be a real
operation, not a stub — so this module implements two genuinely
decodable uncompressed formats from their public specs:

- **PPM (P6)**: ``P6\\n<w> <h>\\n255\\n`` header + raw RGB rows
  (netpbm format, public domain spec).
- **BMP (24-bit, BI_RGB)**: BITMAPFILEHEADER + BITMAPINFOHEADER + raw
  bottom-up BGR rows padded to 4 bytes (Windows bitmap spec).

Decoders register by mime type in :data:`DECODERS`;
``operators.multimodal.decode_media`` dispatches through it, and a codec
for a compressed format (Pillow, ffmpeg) plugs in by registering its
mime — the seam is the registry, not an edit.

All arrays are ``np.ndarray[h, w, 3] uint8``. ``nn_resize`` is the
nearest-neighbor resampler the resize operator uses between decode and
re-encode.
"""

from __future__ import annotations

import struct

import numpy as np

MIME_PPM = "image/x-portable-pixmap"
MIME_BMP = "image/bmp"


def ppm_encode(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) image, got {img.shape}")
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def ppm_decode(payload: bytes) -> np.ndarray:
    """Decode binary PPM (P6) to an (h, w, 3) uint8 array.

    Handles the spec's whitespace/comment grammar in the header (tokens
    separated by any whitespace; ``#`` starts a comment to end-of-line).
    """
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    tokens: list[bytes] = []
    i = 2
    n = len(payload)
    while len(tokens) < 3 and i < n:
        c = payload[i : i + 1]
        if c == b"#":
            while i < n and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    if len(tokens) < 3:
        raise ValueError("truncated PPM header")
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    i += 1  # single whitespace byte after maxval per spec
    data = payload[i : i + w * h * 3]
    if len(data) < w * h * 3:
        raise ValueError("truncated PPM pixel data")
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3).copy()


def bmp_encode(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed BMP."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) image, got {img.shape}")
    h, w, _ = img.shape
    row_len = w * 3
    pad = (4 - row_len % 4) % 4
    # bottom-up rows, BGR order, each padded to a 4-byte boundary
    bgr = img[::-1, :, ::-1]
    rows = b"".join(bgr[r].tobytes() + b"\x00" * pad for r in range(h))
    pixel_offset = 14 + 40
    file_size = pixel_offset + len(rows)
    file_header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_offset)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0
    )
    return file_header + info_header + rows


def bmp_decode(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed (BI_RGB) BMP to (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only 24-bit BI_RGB BMP supported")
    bottom_up = h > 0
    h = abs(h)
    row_len = w * 3
    stride = row_len + (4 - row_len % 4) % 4
    out = np.empty((h, w, 3), dtype=np.uint8)
    for r in range(h):
        start = pixel_offset + r * stride
        row = np.frombuffer(payload, dtype=np.uint8, count=row_len, offset=start)
        target = h - 1 - r if bottom_up else r
        out[target] = row.reshape(w, 3)[:, ::-1]  # BGR -> RGB
    return out


def nn_resize(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample to (out_h, out_w, 3) — deterministic,
    library-free, and exactly what a thumbnailing pass needs before a
    real resampler plugs in."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return img[rows][:, cols]


#: mime -> decode(payload) -> (h, w, 3) uint8. Register a real codec here.
DECODERS = {
    MIME_PPM: ppm_decode,
    MIME_BMP: bmp_decode,
}

#: mime -> encode(img) -> bytes.
ENCODERS = {
    MIME_PPM: ppm_encode,
    MIME_BMP: bmp_encode,
}
