"""Asset loaders: OBJ meshes, per-frame point clouds, image textures.

Equivalents of taichi-version/main.py:23-54 (readobj / readdynamic) and
the cv2 texture load at hittable.py:165-172 (which stores BGR u8 and
converts at sample time — we convert once to RGB float here).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def readobj(path: str) -> Tuple[np.ndarray, List[List[int]], np.ndarray]:
    """Minimal OBJ reader: `v x y z`, `f i j k` (1-based, no slashes —
    the reference's format), `vt u v`."""
    verts, faces, texids = [], [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(parts[1]), float(parts[2]),
                              float(parts[3])])
            elif parts[0] == "f":
                idx = [int(p.split("/")[0]) - 1 for p in parts[1:4]]
                faces.append(idx)
            elif parts[0] == "vt":
                texids.append([float(parts[1]), float(parts[2])])
    return (np.asarray(verts, np.float32), faces,
            np.asarray(texids, np.float32) if texids else
            np.zeros((0, 2), np.float32))


def readdynamic(path: str) -> np.ndarray:
    """Per-frame point cloud: one `x y z` per line
    (taichi-version/main.py:43-54, asset/points/{i}.txt)."""
    pts = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 3:
                pts.append([float(parts[0]), float(parts[1]),
                            float(parts[2])])
    return np.asarray(pts, np.float32)


def load_image_texture(path: str) -> np.ndarray:
    """Load an image as [H,W,3] float RGB in [0,1].

    PNGs use the self-contained stdlib decoder (io/image.py); anything
    else (e.g. the reference's bricks2.png, which is actually a JPEG —
    cv2 sniffed the content, the extension lies) goes through PIL when
    available."""
    with open(path, "rb") as f:
        magic = f.read(8)
    if magic == b"\x89PNG\r\n\x1a\n":
        from rt_tpu.io.image import read_png
        return read_png(path).astype(np.float32) / 255.0
    from PIL import Image  # JPEG et al.
    img = np.asarray(Image.open(path).convert("RGB"))
    return img.astype(np.float32) / 255.0
