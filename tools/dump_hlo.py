#!/usr/bin/env python3
"""Dump the optimized HLO of the fused on-chip decode for layout/fusion
inspection (compile only — nothing executes on the chip)."""

import faulthandler
import os
import sys

faulthandler.dump_traceback_later(int(os.environ.get("HLO_WATCHDOG_S", "1800")), exit=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zpix_jax_cache")

from bench import make_bench_jpeg  # noqa: E402


def main():
    import jax

    from zpix_tpu.parallel.device_entropy import DeviceJpegDecoder, prep_batch

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    size = int(os.environ.get("BENCH_SIZE", "1024"))
    dri = int(os.environ.get("BENCH_DRI", "4"))
    pool = [make_bench_jpeg(size, seed=j, dri_blocks=dri) for j in range(batch)]
    plan = prep_batch(pool)
    dec = DeviceJpegDecoder()
    fn = dec._fused(plan)
    lowered = fn.lower(*(jax.ShapeDtypeStruct(b.shape, b.dtype) for b in
                         [type("S", (), {"shape": plan.packed.shape, "dtype": plan.packed.dtype})]))
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = os.environ.get("HLO_OUT", "/tmp/fused.hlo")
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)/1e6:.1f} MB to {out}")


if __name__ == "__main__":
    main()
