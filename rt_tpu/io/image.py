"""Image writers: PPM (text) and PNG.

The reference uses stb_image_write for PNG and hand-rolled P3 PPM
(gpu-version/color.cuh). Here PPM is trivial text and PNG is encoded
directly against the spec with stdlib zlib — no external image deps. A
native (C++) fast path for bulk PPM writing lives in native/rt_native.cpp
and is used when built (see rt_tpu.io.native).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def write_ppm(path: str, u8_topdown: np.ndarray) -> None:
    h, w, _ = u8_topdown.shape
    flat = u8_topdown.reshape(-1, 3)
    try:
        from rt_tpu.io.native import native_write_ppm
        if native_write_ppm(path, u8_topdown):
            return
    except Exception:
        pass
    with open(path, "w") as f:
        f.write(f"P3\n{w} {h}\n255\n")
        f.writelines(f"{r} {g} {b}\n" for r, g, b in flat)


def png_bytes(u8_topdown: np.ndarray) -> bytes:
    """Minimal RGB8 PNG encoder (filter 0 rows + zlib)."""
    img = np.ascontiguousarray(u8_topdown.astype(np.uint8))
    h, w, c = img.shape
    assert c == 3
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))


def write_png(path: str, u8_topdown: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(png_bytes(u8_topdown))


def read_png(path: str) -> np.ndarray:
    """Minimal PNG reader for our own files and simple RGB(A) PNGs
    (used for image textures; the reference loads via cv2/stb)."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos = 8
    idat = b""
    w = h = bit_depth = color_type = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if bit_depth != 8 or color_type not in (2, 6):
        raise ValueError("only 8-bit RGB/RGBA PNGs supported")
    nc = 3 if color_type == 2 else 4
    raw = zlib.decompress(idat)
    stride = w * nc
    out = np.zeros((h, w, nc), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)], np.uint8
        ).astype(np.int32)
        if ftype == 0:
            cur = row
        elif ftype == 1:  # Sub
            cur = row.copy()
            for i in range(nc, stride):
                cur[i] = (cur[i] + cur[i - nc]) & 0xFF
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = row.copy()
            for i in range(stride):
                left = cur[i - nc] if i >= nc else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row.copy()
            for i in range(stride):
                a = cur[i - nc] if i >= nc else 0
                b = prev[i]
                cc = prev[i - nc] if i >= nc else 0
                pa, pb, pc = abs(b - cc), abs(a - cc), abs(a + b - 2 * cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur.astype(np.uint8).reshape(w, nc)
        prev = cur
    return out[..., :3]


def write_jpg(path: str, u8_topdown: np.ndarray, quality: int = 95) -> None:
    """JPEG writer (via Pillow). The Taichi/naive references emit JPG
    frames (ti.imwrite out{i}.jpg, taichi-version/main.py:216; cv2
    JPGs, 朴素光线追踪/4_0_path_tracing.py:150); this gives their frame
    format parity. Gated: raises with a clear message if Pillow is
    unavailable (PNG/PPM writers have no dependencies)."""
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - PIL ships in CI image
        raise RuntimeError(
            "JPEG output requires Pillow; use .png or .ppm instead") from e
    Image.fromarray(np.ascontiguousarray(u8_topdown.astype(np.uint8)),
                    "RGB").save(path, quality=quality)


def write_image(path: str, u8_topdown: np.ndarray) -> None:
    """Write by extension: .ppm (text P3), .jpg/.jpeg (Pillow), else PNG."""
    if path.endswith(".ppm"):
        write_ppm(path, u8_topdown)
    elif path.endswith((".jpg", ".jpeg")):
        write_jpg(path, u8_topdown)
    else:
        write_png(path, u8_topdown)
