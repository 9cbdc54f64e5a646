#!/usr/bin/env python3
"""Honest stage profile of the on-chip JPEG decode on the real chip.

Times pass 1 (index pass), pass 1+2 (+integrity), and the fused
entropy+IDCT+color program, each with the digest-chain timing rule from
bench.py (the tunneled backend replays cached results and can return
from block_until_ready without waiting — see CLAUDE.md axon gotchas):
fresh image content per timed step, one content-dependent D2H scalar
fetch at the end of the timed region.

Env knobs: PROF_STEPS (default 8), BENCH_DRI/BATCH/SIZE, ZPIX_ONCHIP_*.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler

faulthandler.dump_traceback_later(
    int(os.environ.get("PROF_WATCHDOG_S", "3000")), exit=True
)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zpix_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

from bench import make_digest, make_pools  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from zpix_tpu.parallel.device_entropy import (
        DeviceJpegDecoder,
        build_decode_fn,
        prep_batch,
    )

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    size = int(os.environ.get("BENCH_SIZE", "1024"))
    steps = int(os.environ.get("PROF_STEPS", "8"))
    dri = int(os.environ.get("BENCH_DRI", "4"))
    mpix = batch * size * size / 1e6

    t0 = time.perf_counter()
    pools = make_pools(steps, batch, size, dri_blocks=dri)
    print(f"gen {steps}x{batch} images: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    plans = [prep_batch(p) for p in pools]
    prep_ms = (time.perf_counter() - t0) / steps * 1e3
    p0 = plans[0]
    print(
        f"host prep: {prep_ms:.1f} ms/batch | stream={p0.stream.shape[0]}B "
        f"n_segs={p0.n_segs} bpm={p0.bpm} max_seg_bits={p0.max_seg_bits}"
    )

    dec = DeviceJpegDecoder()
    digest = make_digest()

    t0 = time.perf_counter()
    bufs = [dec._put(p) for p in plans]
    jax.block_until_ready(bufs)
    up_ms = (time.perf_counter() - t0) / steps * 1e3
    print(f"upload: {up_ms:.1f} ms/batch")

    def timed(label, fn, out_of=lambda r: r[0]):
        tC = time.perf_counter()
        r = fn(*bufs[0])
        _ = int(digest(jnp.uint32(0), out_of(r).astype(jnp.int32)))
        compile_s = time.perf_counter() - tC
        t1 = time.perf_counter()
        acc = jnp.uint32(1)
        for i in range(steps):
            r = fn(*bufs[i])
            acc = digest(acc, out_of(r).astype(jnp.int32))
        _ = int(acc)
        dt = (time.perf_counter() - t1) / steps
        print(
            f"{label}: {dt * 1e3:.1f} ms/batch ({mpix / dt:.0f} MPix/s) "
            f"[compile+first {compile_s:.1f}s]"
        )

    which = os.environ.get("PROF_STAGES", "1,17,fused").split(",")
    for w in which:
        if w == "fused":
            timed("fused full", dec._fused(p0))
        elif w == "soa":  # entropy + DC restore, no back-end
            fn = build_decode_fn(p0, packed=True, _soa_out=True)
            timed("soa coeffs", fn)
        elif w in ("pix", "planes", "ups", "rgbr", "bk"):  # back-end truncations
            from zpix_tpu.parallel.device_entropy import _soa_backend

            body = build_decode_fn(p0, packed=True, _soa_out=True, _raw=True)
            stop = None if w == "bk" else w

            def make(body=body, stop=stop):
                import jax

                def f(*args):
                    coeffs, ok = body(*args)
                    return _soa_backend(p0, coeffs, _stop=stop), ok

                return jax.jit(f)

            timed(f"+backend[{w}]", make())
        else:
            fn = build_decode_fn(p0, _stage=int(w), packed=True)
            timed(f"stage {w}", fn)


if __name__ == "__main__":
    main()
