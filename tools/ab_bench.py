#!/usr/bin/env python3
"""Interleaved in-process A/B benchmark for on-chip decode variants.

Separate bench processes on the tunneled chip drift by +-20%, which
swamps most real effects.  This harness times all variants inside ONE
process, alternating per trial (order flipped each trial), so every
variant faces the same drift; it reports best and median per variant.

Honest-timing rules (CLAUDE.md axon gotchas): fresh image content per
(trial, step) — variants may share content because they are different
compiled programs, but no (program, inputs) pair repeats — and one
content-dependent digest scalar fetched per timed loop.

Env: AB_VARIANTS (comma list, see VARIANTS), AB_TRIALS (5), AB_STEPS
(12), BENCH_BATCH/SIZE/DRI as in bench.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler

faulthandler.dump_traceback_later(
    int(os.environ.get("AB_WATCHDOG_S", "5400")), exit=True
)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zpix_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

from bench import make_digest, make_pools  # noqa: E402

VARIANTS = {
    # upload forms
    "packed": dict(packed=True),
    "3arg": dict(packed=False),
    # uploads hoisted out of the timed loop: isolates compute+dispatch
    "noup": dict(packed=True, _prefetch=True),
    # pass-2 window/unroll (prefetched: upload chaos swamps kernel deltas)
    "k16w6": dict(packed=True, k_syms=16, win_words=6, _prefetch=True),
    "k16w5": dict(packed=True, k_syms=16, win_words=5, _prefetch=True),
    "k8w4": dict(packed=True, k_syms=8, _prefetch=True),
    "k20w6": dict(packed=True, k_syms=20, win_words=6, _prefetch=True),
    "k24w8": dict(packed=True, k_syms=24, win_words=8, _prefetch=True),
    # pass-1 window/unroll
    "p1k24w8": dict(packed=True, k1_syms=24, win1_words=8, _prefetch=True),
    "p1k20w6": dict(packed=True, k1_syms=20, win1_words=6, _prefetch=True),
    "p1k32w10": dict(packed=True, k1_syms=32, win1_words=10, _prefetch=True),
    "p1k32w12": dict(packed=True, k1_syms=32, win1_words=12, _prefetch=True),
    "p1k48w16": dict(packed=True, k1_syms=48, win1_words=16, _prefetch=True),
    "p1k64w20": dict(packed=True, k1_syms=64, win1_words=20, _prefetch=True),
    "p1k40w12": dict(packed=True, k1_syms=40, win1_words=12, _prefetch=True),
    # restart-interval granularity (shorter segments = fewer pass-1 steps)
    "dri2": dict(packed=True, _prefetch=True, _dri=2),
    "dri8": dict(packed=True, _prefetch=True, _dri=8),
    "dri16": dict(packed=True, _prefetch=True, _dri=16),
    "dri32": dict(packed=True, _prefetch=True, _dri=32),
    # one-IDCT + uint8-relayout back-end (measured slower; kept A/B-able)
    "mergedbk": dict(packed=True, _prefetch=True, merged_backend=True),
    # back-end layout: lane-minor SoA (default) vs per-component graphs
    "soabk": dict(packed=True, _prefetch=True, soa_backend=True),
    "percompbk": dict(packed=True, _prefetch=True, soa_backend=False),
    # window fetch: one [L, W] row gather vs W full-lane gathers (default)
    "rowgather": dict(packed=True, _prefetch=True, split_win=False),
    # output layout: planar [B,3,H,W] (minor W) vs interleaved [B,H,W,3]
    # (minor 3 -> 128-lane pad on every store)
    "planar": dict(packed=True, _prefetch=True, planar=True),
    # uint8 stage-boundary optimization barriers in the SoA back-end
    "bar": dict(packed=True, _prefetch=True, soa_barriers=True),
    "nobar": dict(packed=True, _prefetch=True, soa_barriers=False),
    # batch size (per-variant plans; default BENCH_BATCH)
    "b24": dict(packed=True, _prefetch=True, _batch=24),
    "b8planar": dict(packed=True, _prefetch=True, _batch=8, planar=True),
    "b12planar": dict(packed=True, _prefetch=True, _batch=12, planar=True),
    "b20planar": dict(packed=True, _prefetch=True, _batch=20, planar=True),
    "b32": dict(packed=True, _prefetch=True, _batch=32),
    "b32planar": dict(packed=True, _prefetch=True, _batch=32, planar=True),
    "planb16": dict(packed=True, _prefetch=True, planar=True),
    "k24w8planar": dict(packed=True, _prefetch=True, planar=True,
                        k_syms=24, win_words=8),
    "k32w10planar": dict(packed=True, _prefetch=True, planar=True,
                         k_syms=32, win_words=10),
    "k12w4planar": dict(packed=True, _prefetch=True, planar=True,
                        k_syms=12, win_words=4),
    # split16 value-pass store (int16 AC + int32 DC row)
    "i16planar": dict(packed=True, _prefetch=True, planar=True, i16=True),
    "p1i16planar": dict(packed=True, _prefetch=True, planar=True, p1_i16=True),
    "alli16planar": dict(packed=True, _prefetch=True, planar=True, i16=True,
                         p1_i16=True),
    # round 2 around the i16 winner: unroll width x restart interval x batch
    "i16k12planar": dict(packed=True, _prefetch=True, planar=True, i16=True,
                         k_syms=12, win_words=5),
    "i16k20planar": dict(packed=True, _prefetch=True, planar=True, i16=True,
                         k_syms=20, win_words=6),
    "i16k24planar": dict(packed=True, _prefetch=True, planar=True, i16=True,
                         k_syms=24, win_words=8),
    "i16dri16planar": dict(packed=True, _prefetch=True, planar=True, i16=True,
                           _dri=16),
    "i16b24planar": dict(packed=True, _prefetch=True, planar=True, i16=True,
                         _batch=24),
    "i16b32planar": dict(packed=True, _prefetch=True, planar=True, i16=True,
                         _batch=32),
    # round 4: pass-1 straggler bins (length-sorted lane groups) x batch
    "bins2planar": dict(packed=True, _prefetch=True, planar=True, bins=2),
    "bins4planar": dict(packed=True, _prefetch=True, planar=True, bins=4),
    "bins8planar": dict(packed=True, _prefetch=True, planar=True, bins=8),
    "b64planar": dict(packed=True, _prefetch=True, planar=True, _batch=64),
    "b32bins4planar": dict(packed=True, _prefetch=True, planar=True, bins=4,
                           _batch=32),
    "b64bins4planar": dict(packed=True, _prefetch=True, planar=True, bins=4,
                           _batch=64),
}


def main():
    import jax
    import jax.numpy as jnp

    from zpix_tpu.parallel.device_entropy import DeviceJpegDecoder, prep_batch

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    size = int(os.environ.get("BENCH_SIZE", "1024"))
    steps = int(os.environ.get("AB_STEPS", "12"))
    trials = int(os.environ.get("AB_TRIALS", "5"))
    dri = int(os.environ.get("BENCH_DRI", "4"))
    names = os.environ.get("AB_VARIANTS", "packed,3arg").split(",")
    mpix = batch * size * size / 1e6

    keys = sorted(
        {(VARIANTS[n].get("_dri", dri), VARIANTS[n].get("_batch", batch))
         for n in names}
    )
    t0 = time.perf_counter()
    plans_by_key = {}
    for d, b in keys:
        pools = make_pools(trials * steps, b, size, dri_blocks=d)
        plans_by_key[(d, b)] = [prep_batch(p) for p in pools]
    print(
        f"gen+prep {keys} x{trials * steps} images: "
        f"{time.perf_counter() - t0:.0f}s"
    )

    digest = make_digest()
    setups = {}
    for name in names:
        cfg = dict(VARIANTS[name])
        prefetch = cfg.pop("_prefetch", False)
        vbatch = cfg.pop("_batch", batch)
        plans = plans_by_key[(cfg.pop("_dri", dri), vbatch)]
        dec = DeviceJpegDecoder(**cfg)
        fused = dec._fused(plans[0])

        def make_step(fused):
            @jax.jit
            def step(acc, *bufs):
                out, ok = fused(*bufs)
                return digest(acc, out), ok, out

            return step

        step = make_step(fused)
        tC = time.perf_counter()
        acc, ok, _ = step(jnp.uint32(0), *dec._put(plans[0]))
        _ = int(acc)
        assert bool(ok), f"{name}: integrity check failed"
        print(f"{name}: compile+first {time.perf_counter() - tC:.0f}s")
        setups[name] = (dec, step, prefetch, plans, vbatch)

    results = {n: [] for n in names}
    for t in range(trials):
        order = names if t % 2 == 0 else names[::-1]
        for name in order:
            dec, step, prefetch, plans, vbatch = setups[name]
            bufs_list = None
            if prefetch:
                bufs_list = [
                    dec._put(plans[t * steps + i]) for i in range(steps)
                ]
                jax.block_until_ready(bufs_list)
            t1 = time.perf_counter()
            acc = jnp.uint32(t + 1)
            for i in range(steps):
                bufs = (
                    bufs_list[i] if prefetch
                    else dec._put(plans[t * steps + i])
                )
                acc, ok, _ = step(acc, *bufs)
            _ = int(acc)
            dt = (time.perf_counter() - t1) / steps
            results[name].append(dt)
            print(f"trial {t} {name}: {dt * 1e3:.1f} ms/step")

    print("---- summary")
    for name in names:
        ts = sorted(results[name])
        best, med = ts[0], ts[len(ts) // 2]
        vm = setups[name][4] * size * size / 1e6
        print(
            json.dumps(
                {
                    "variant": name,
                    "best_ms": round(best * 1e3, 1),
                    "best_mpix_s": round(vm / best, 1),
                    "median_ms": round(med * 1e3, 1),
                    "median_mpix_s": round(vm / med, 1),
                }
            )
        )


if __name__ == "__main__":
    main()
