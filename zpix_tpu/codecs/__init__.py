"""Format codecs: jpeg, png, qoi, bmp."""

from . import bmp, jpeg, png, qoi

__all__ = ["bmp", "jpeg", "png", "qoi"]
