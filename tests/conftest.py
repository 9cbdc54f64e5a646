"""Test configuration.

JAX tests run on a virtual 8-device CPU mesh
(xla_force_host_platform_device_count) — the single-host stand-in for a TPU
pod slice, per SURVEY.md section 4's multi-device test strategy.
"""

import os
import sys

# Force CPU: the session environment registers an 'axon' PJRT plugin (a
# tunneled real TPU chip) at interpreter startup and sets
# jax_platforms=axon,cpu; the chip is reserved for bench.py.  Unit tests run
# on the virtual CPU mesh, so override the already-set config value.
os.environ["JAX_PLATFORMS"] = "cpu"
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Small loop unrolls for the on-chip decoders: XLA:CPU compiles the big
# production-default bodies (~12-16 symbols/step) very slowly; semantics
# are unroll-independent, and dedicated tests cover the wide configs on
# tiny inputs.
os.environ.setdefault("ZPIX_ONCHIP_K", "4")
os.environ.setdefault("ZPIX_ONCHIP_K1", "6")
os.environ.setdefault("ZPIX_ONCHIP_W", "4")
os.environ.setdefault("ZPIX_ONCHIP_W1", "4")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

TESTDATA = "/root/reference/src/testdata"


@pytest.fixture(scope="session")
def testdata():
    return TESTDATA


@pytest.fixture(scope="session")
def png_dir():
    return os.path.join(TESTDATA, "png")
