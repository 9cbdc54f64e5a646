#!/usr/bin/env python3
"""Pre-warm the persistent compile cache for the PNG defilter-front bench.

The 1024² device-defilter program (2048-step sheared-wavefront scan,
ops/defilter.py) blew bench.py's watchdog in round 3 because its XLA
compile runs for tens of minutes on the 2-core host.  This script
traces the EXACT graph `bench.py BENCH_MODE=png ZPIX_PNG_FRONT=defilter`
jits (same closure constants, same shapes) and compiles it AOT from
ShapeDtypeStructs — no device arrays, no uploads, no execution — so the
later bench run loads it from JAX_COMPILATION_CACHE_DIR in seconds.
Run on a quiet host; safe to run while another client owns the chip
(compile-only: never dispatches or fetches).

Usage: python tools/png_warm_compile.py [batch] [size] [steps]
"""

import faulthandler
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
steps = int(sys.argv[3]) if len(sys.argv) > 3 else 6
faulthandler.dump_traceback_later(
    int(os.environ.get("WARM_WATCHDOG_S", "5400")), exit=True
)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zpix_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from bench import make_digest  # noqa: E402
from zpix_tpu.ops.defilter import defilter_jnp  # noqa: E402
from zpix_tpu.parallel.png_batch import _expand_graph  # noqa: E402

t0 = time.time()
digest = make_digest()
row_bytes = 3 * size


# EXACT twin of bench.py main_png's step_defilter (closure constants and
# argument order must match for the persistent-cache key to hit).
@jax.jit
def step_defilter(acc, allb, i):
    rows = allb[i]
    dec_rows = defilter_jnp(rows[:, :, 1:], rows[:, :, 0], bpp=3)
    out = _expand_graph("tc8", dec_rows, None, width=size, key=None)
    return digest(acc, out), out


sds = jax.ShapeDtypeStruct
args = (
    sds((), jnp.uint32),
    sds((steps, batch, size, row_bytes + 1), jnp.uint8),
    sds((), jnp.int32),
)
print(f"[{time.time()-t0:7.1f}s] lowering batch={batch} size={size} "
      f"steps={steps}", flush=True)
lowered = step_defilter.lower(*args)
print(f"[{time.time()-t0:7.1f}s] lowered; compiling...", flush=True)
compiled = lowered.compile()
print(f"[{time.time()-t0:7.1f}s] COMPILED ok "
      f"(cache dir {os.environ['JAX_COMPILATION_CACHE_DIR']})", flush=True)
