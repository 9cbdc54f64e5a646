#!/usr/bin/env python3
"""Probe the tunneled TPU chip's health without risking a wedge.

Checks, in order of increasing exposure:
  1. backend init + device listing
  2. tiny compile + execute
  3. D2H fetch of a 4-byte scalar (the thing that wedges)
  4. input-dependent-trip-count spin loop (deferred-execution detector)

Uses faulthandler.dump_traceback_later to SELF-exit on hang instead of
being killed by `timeout` (killing a client mid-D2H wedges the terminal
for every later process — CLAUDE.md axon gotchas).
"""

import faulthandler
import sys
import time

faulthandler.dump_traceback_later(120, exit=True)

import jax
import jax.numpy as jnp
import numpy as np

t0 = time.time()
devs = jax.devices()
print(f"[{time.time()-t0:6.1f}s] devices: {devs}", flush=True)

x = jax.device_put(np.arange(1024, dtype=np.int32))
y = (x * 3 + 1).sum()
print(f"[{time.time()-t0:6.1f}s] compiled+executed", flush=True)

val = int(np.asarray(y))  # the D2H fetch that wedges when the path is broken
print(f"[{time.time()-t0:6.1f}s] D2H fetch ok: {val} (expect 1572352)", flush=True)


# Deferred-execution detector: while_loop whose trip count depends on input.
@jax.jit
def spin(n):
    def body(c):
        i, a = c
        return i + 1, a * jnp.uint32(1664525) + jnp.uint32(1013904223)

    return jax.lax.while_loop(lambda c: c[0] < n, body, (jnp.int32(0), jnp.uint32(1)))[1]


for n in (1000, 1000000):
    t = time.time()
    r = spin(jnp.int32(n))
    rv = int(np.asarray(r))
    print(f"[{time.time()-t0:6.1f}s] spin({n}) = {rv} in {time.time()-t:.4f}s", flush=True)

print("HEALTH: OK", flush=True)
faulthandler.cancel_dump_traceback_later()
