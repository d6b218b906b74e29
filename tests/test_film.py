"""Film/output semantics vs the reference writers (color.cuh)."""

import io
import os

import numpy as np

from rt_tpu.render import film
from rt_tpu.io.image import png_bytes, read_png, write_png, write_ppm


def test_ppm_gamma_and_scale():
    # one pixel, radiance sum 2.0 over spp=8 -> mean 0.25 -> sqrt 0.5 -> 128
    img = np.full((1, 1, 3), 2.0, np.float32)
    ppm = film.to_ppm(img, spp=8)
    lines = ppm.strip().splitlines()
    assert lines[0] == "P3"
    assert lines[1] == "1 1"
    assert lines[2] == "255"
    assert lines[3] == "128 128 128"


def test_ppm_clamp_at_999():
    img = np.full((1, 1, 3), 100.0, np.float32)
    ppm = film.to_ppm(img, spp=1)
    assert ppm.strip().splitlines()[3] == "255 255 255"  # 256*0.999 -> 255


def test_png_path_has_no_gamma():
    """write_image applies NO sqrt (color.cuh:15-35) — quirk preserved."""
    img = np.full((1, 1, 3), 0.25, np.float32)
    u8 = film.to_png_u8(img, spp=1)
    assert u8[0, 0, 0] == 64  # 256*0.25, not 256*0.5


def test_row_flip_top_down():
    """Row 0 of the output = highest-y scanline (main.cu:332-336)."""
    img = np.zeros((2, 1, 3), np.float32)
    img[0] = 0.1  # bottom scanline
    img[1] = 0.9  # top scanline
    u8 = film.finalize(img, spp=1, gamma=False)
    assert u8[0, 0, 0] > u8[1, 0, 0]


def test_negative_detection():
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 0, 1] = -0.5
    assert film.negative_pixels(img) == 1


def test_png_roundtrip(tmp_path):
    rs = np.random.RandomState(3)
    u8 = (rs.rand(9, 13, 3) * 255).astype(np.uint8)
    path = os.path.join(tmp_path, "t.png")
    write_png(path, u8)
    back = read_png(path)
    np.testing.assert_array_equal(u8, back)


def test_ppm_write(tmp_path):
    u8 = np.array([[[255, 0, 0], [0, 255, 0]]], np.uint8)
    path = os.path.join(tmp_path, "t.ppm")
    write_ppm(path, u8)
    text = open(path).read().split()
    assert text[:4] == ["P3", "2", "1", "255"]
    assert text[4:10] == ["255", "0", "0", "0", "255", "0"]


def test_native_ppm_matches_python(tmp_path):
    """The C writer must produce byte-identical PPM output to the
    pure-Python path (both mirror color.cuh's P3 format)."""
    from rt_tpu.io.native import native_write_ppm

    rng = np.random.default_rng(5)
    img = (rng.random((7, 11, 3)) * 255).astype(np.uint8)
    native = tmp_path / "n.ppm"
    if not native_write_ppm(str(native), img):
        import pytest
        pytest.skip("native library unavailable")
    py = tmp_path / "p.ppm"
    with open(py, "w") as f:
        f.write(f"P3\n11 7\n255\n")
        f.writelines(f"{r} {g} {b}\n" for r, g, b in img.reshape(-1, 3))
    assert native.read_bytes() == py.read_bytes()


def test_write_image_extension_dispatch(tmp_path):
    """write_image routes by extension: .png (stdlib codec, lossless),
    .jpg (Pillow, lossy — the Taichi/naive references' frame format,
    taichi-version/main.py:216, 朴素光线追踪/4_0_path_tracing.py:150)."""
    from rt_tpu.io.image import read_png, write_image

    # smooth gradient (noise is JPEG's worst case; frames are smooth)
    y, x = np.mgrid[0:32, 0:40]
    img = np.stack([x * 6, y * 7, (x + y) * 3], axis=-1).astype(np.uint8)

    png = str(tmp_path / "x.png")
    write_image(png, img)
    np.testing.assert_array_equal(read_png(png)[..., :3], img)

    jpg = str(tmp_path / "x.jpg")
    write_image(jpg, img)
    from PIL import Image

    back = np.asarray(Image.open(jpg).convert("RGB"))
    assert back.shape == img.shape
    # lossy but recognizably the same image
    assert np.abs(back.astype(int) - img.astype(int)).mean() < 8
