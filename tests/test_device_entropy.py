"""On-chip JPEG entropy decode (restart-segment lanes) differential tests.

The device kernel must reproduce the host front-end's coefficients exactly
(reference entropy semantics: /root/reference/src/jpeg/decoder.zig:1294-1454)
and the full device pipeline must match the host-front-end batch decoder
pixel-for-pixel.
"""

import os

import numpy as np
import pytest

from zpix_tpu.errors import UnsupportedError
from zpix_tpu.parallel.batch import BatchJpegDecoder, parse_coefficients
from zpix_tpu.parallel.device_entropy import (
    DeviceJpegDecoder,
    coefficients_to_grids,
    prep_batch,
)


@pytest.fixture(scope="module")
def restart_jpeg(testdata):
    with open(os.path.join(testdata, "video-001.restart2.jpeg"), "rb") as f:
        return f.read()


def test_coefficient_parity(restart_jpeg):
    plan = prep_batch([restart_jpeg, restart_jpeg])
    assert (plan.width, plan.height, plan.ratio) == (150, 103, "420")
    dec = DeviceJpegDecoder()
    coeffs, ok = dec.decode_coefficients(plan)
    assert bool(ok)
    grids = coefficients_to_grids(plan, coeffs)
    ref = parse_coefficients(restart_jpeg)
    for c in range(plan.ncomp):
        for b in range(plan.batch):
            assert np.array_equal(np.asarray(grids[c][b]), ref.coeffs[c]), (
                f"component {c} image {b} coefficients differ"
            )


def test_pixel_parity(restart_jpeg):
    dec = DeviceJpegDecoder()
    img, ok = dec.decode([restart_jpeg, restart_jpeg])
    assert bool(ok)
    ref = np.asarray(BatchJpegDecoder().decode([restart_jpeg, restart_jpeg]))
    assert np.array_equal(np.asarray(img), ref)


def test_requires_restart_markers(testdata):
    with open(os.path.join(testdata, "video-001.jpeg"), "rb") as f:
        data = f.read()
    with pytest.raises(UnsupportedError):
        prep_batch([data])


def test_rejects_progressive(testdata):
    with open(os.path.join(testdata, "video-001.progressive.jpeg"), "rb") as f:
        data = f.read()
    with pytest.raises(UnsupportedError):
        prep_batch([data])


def test_rejects_mixed_batch(restart_jpeg, testdata):
    with open(os.path.join(testdata, "video-001.jpeg"), "rb") as f:
        other = f.read()
    with pytest.raises(UnsupportedError):
        prep_batch([restart_jpeg, other])
