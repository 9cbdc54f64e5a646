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

# Persistent compile cache: XLA:CPU compiles of the on-chip decoders are
# the entire suite wall time (~10 min cold in round 1); warm runs reload
# executables in seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zpix_jax_cache_tests")
try:
    import jax as _jax_cfg

    _jax_cfg.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    _jax_cfg.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _jax_cfg.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute XLA:CPU compiles; run with ZPIX_SLOW=1 or -m slow",
    )


def pytest_collection_modifyitems(config, items):
    """Skip @slow tests by default so `pytest tests/ -q` stays under the
    5-minute cold budget on the 2-core host.  ZPIX_SLOW=1 or an explicit
    `-m slow` / `-m 'slow or not slow'` selection runs them."""
    if os.environ.get("ZPIX_SLOW") == "1" or config.getoption("-m"):
        return
    skip = pytest.mark.skip(reason="slow (set ZPIX_SLOW=1 or -m slow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)

TESTDATA = "/root/reference/src/testdata"


@pytest.fixture(scope="session")
def testdata():
    return TESTDATA


@pytest.fixture(scope="session")
def png_dir():
    return os.path.join(TESTDATA, "png")
