"""Unified loader API: probe order and dispatch.

Mirrors /root/reference/src/root.zig:24-40 (probe PNG -> JPEG -> QOI -> BMP).
"""

import os

import numpy as np
import pytest

import zpix_tpu
from zpix_tpu.errors import UnknownFormat


def test_dispatch_all_formats(testdata, png_dir):
    png_img = zpix_tpu.load(os.path.join(png_dir, "basn2c08.png"))
    assert type(png_img).__name__ == "RGBAImage"

    jpg_img = zpix_tpu.load(os.path.join(testdata, "video-001.jpeg"))
    assert type(jpg_img).__name__ == "YCbCrImage"

    bmp_img = zpix_tpu.load(os.path.join(testdata, "video-001.bmp"))
    assert bmp_img.width == 150

    # QOI via encode round-trip
    from zpix_tpu.codecs import qoi

    rgba = png_img.rgba_pixels()
    data = qoi.encode(rgba, qoi.Desc(png_img.width, png_img.height, 4, 0))
    qoi_img = zpix_tpu.from_buffer(data)
    assert np.array_equal(qoi_img.rgba_pixels(), rgba)


def test_unknown_format():
    with pytest.raises(UnknownFormat):
        zpix_tpu.from_buffer(b"\x00\x01\x02\x03 definitely not an image")


def test_decode_config(testdata):
    with open(os.path.join(testdata, "video-001.jpeg"), "rb") as f:
        cfg = zpix_tpu.decode_config(f.read())
    assert (cfg.width, cfg.height) == (150, 103)


def test_drawer():
    from zpix_tpu.image import Drawer, RGBAImage, Rectangle

    img = RGBAImage.init(Rectangle.init(0, 0, 16, 16))
    d = Drawer(img)
    d.clear((1, 2, 3, 4))
    assert tuple(img.pix[8, 8]) == (1, 2, 3, 4)
    d.fill_rect(Rectangle.init(2, 2, 6, 6), (9, 9, 9, 255))
    assert tuple(img.pix[3, 3]) == (9, 9, 9, 255)
    d.draw_line(0, 0, 15, 15, (255, 0, 0, 255))
    assert tuple(img.pix[0, 0]) == (255, 0, 0, 255)
    assert tuple(img.pix[15, 15]) == (255, 0, 0, 255)
    d.draw_circle(8, 8, 5, (0, 255, 0, 255))
    assert tuple(img.pix[8, 13]) == (0, 255, 0, 255)
