"""Test configuration.

JAX tests run on a virtual 8-device CPU mesh
(xla_force_host_platform_device_count) — the single-host stand-in for a TPU
pod slice, per SURVEY.md section 4's multi-device test strategy.
"""

import os
import sys

# Force CPU: the session environment pins JAX_PLATFORMS=axon (a tunneled
# real TPU chip) which is reserved for bench.py; unit tests must run on the
# virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

TESTDATA = "/root/reference/src/testdata"


@pytest.fixture(scope="session")
def testdata():
    return TESTDATA


@pytest.fixture(scope="session")
def png_dir():
    return os.path.join(TESTDATA, "png")
