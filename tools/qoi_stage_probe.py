#!/usr/bin/env python3
"""Stage-by-stage timing probe for the production-scale on-chip QOI path.

Times each phase of the host-orchestrated decode separately — upload,
init compile+run, FIRST sync_block dispatch (compile), later sync_block
dispatches (execute), finish compile+run — so a stuck production config
can be attributed to compile vs execute vs fetch (the r4_qoi6 run spent
>25 min somewhere past init with no output).

Self-exits via faulthandler on hang (never `timeout`-kill a chip client:
CLAUDE.md axon gotchas).  Usage:
    python tools/qoi_stage_probe.py [batch] [size] [watchdog_s]
"""

import faulthandler
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
wd = int(sys.argv[3]) if len(sys.argv) > 3 else 5400
faulthandler.dump_traceback_later(wd, exit=True)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zpix_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import jax  # noqa: E402
import numpy as np  # noqa: E402

from bench import make_bench_qoi  # noqa: E402
from zpix_tpu.parallel.qoi_batch import (  # noqa: E402
    BatchQoiDecoder,
    build_qoi_decode_fn,
    prep_qoi_batch,
)

t00 = time.time()


def log(msg):
    print(f"[{time.time() - t00:7.1f}s] {msg}", flush=True)


log(f"devices: {jax.devices()} batch={batch} size={size}")
datas = [make_bench_qoi(size, seed=j) for j in range(batch)]
log(f"encoded {batch} streams, {sum(len(d) for d in datas)/1e6:.1f} MB")

cb = int(os.environ.get("BENCH_QOI_CHUNK", "512"))
k = int(os.environ.get("BENCH_QOI_K", "8"))
plan = prep_qoi_batch(datas, cb)
dec = BatchQoiDecoder(chunk_bytes=cb, k_ops=k)
dec._guard(plan)
log(f"plan: cap={plan.stream.shape[0]} chunks={plan.n_chunks} "
    f"lanes~{batch * plan.n_chunks}")

args = (plan.stream, plan.img_byte_start, plan.img_byte_end,
        plan.img_raw_end)
args = tuple(jax.device_put(a) for a in args)
jax.block_until_ready(args)
log("upload done")

from functools import partial  # noqa: E402

raw = partial(build_qoi_decode_fn, plan, k_ops=k, ops_cap=None,
              win_words=None)
init_jit = jax.jit(raw(_stage="init", _raw=True))
sync_jit = jax.jit(raw(_stage="sync_block", _raw=True))
finish_jit = jax.jit(raw(_stage="finish", _raw=True))

t0 = time.time()
lowered = sync_jit.lower(*args, *jax.eval_shape(init_jit, *args))
log(f"sync_block lowered in {time.time() - t0:.1f}s")
t0 = time.time()
compiled = lowered.compile()
log(f"sync_block COMPILED in {time.time() - t0:.1f}s")

t0 = time.time()
e = init_jit(*args)
jax.block_until_ready(e)
log(f"init compile+run {time.time() - t0:.1f}s")

R = int(os.environ.get("ZPIX_QOI_ROUNDS_PER_CALL", "4"))
max_rounds = int(os.environ.get("ZPIX_PROBE_MAX_ROUNDS", "64"))
total = 0
chg = True
while chg and total < max_rounds:
    t0 = time.time()
    p_, x_, i_, chgd = compiled(*args, *e)
    e = (p_, x_, i_)
    chg = bool(chgd)  # D2H fetch closes the dispatch
    log(f"sync_block({R} rounds) exec {time.time() - t0:.1f}s chg={chg}")
    total += R

t0 = time.time()
lowered = finish_jit.lower(*args, *e)
log(f"finish lowered in {time.time() - t0:.1f}s")
t0 = time.time()
fcomp = lowered.compile()
log(f"finish COMPILED in {time.time() - t0:.1f}s")
t0 = time.time()
rgba, ok = fcomp(*args, *e)
okv = bool(ok)
log(f"finish exec {time.time() - t0:.1f}s ok={okv}")

t0 = time.time()
out0 = np.asarray(rgba[0])
log(f"D2H row fetch {time.time() - t0:.1f}s shape={out0.shape}")

log(f"total sync rounds dispatched: {total} (converged={not chg})")

from zpix_tpu.codecs.qoi.decode import decode as host_decode  # noqa: E402

ref = np.asarray(host_decode(datas[0]).pix).reshape(out0.shape)
log(f"parity vs host: {'OK' if np.array_equal(out0, ref) else 'MISMATCH'}")
log("DONE")
