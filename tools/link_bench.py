#!/usr/bin/env python3
"""Raw H2D link sweep on the tunneled chip: device_put bandwidth vs
buffer size and count.

Diagnoses the staged-upload gap (VERDICT round 2, weak #1): bench.py's
staging loop measured 36 MB/s while the link itself measured
1.2-1.5 GB/s — if each device_put pays a fixed ~tens-of-ms round trip,
many small uploads are latency-bound and ONE large buffer restores the
wire rate.  Prints ms and MB/s per (size, count) cell; every buffer has
distinct random content (the terminal replays cached (program, inputs)
— uploads of identical bytes may be deduped).

Env: LB_SIZES (comma MB list, default "0.25,1,2,8,32"), LB_COUNTS
(default "1,4,16"), LB_TRIALS (default 3).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler

faulthandler.dump_traceback_later(
    int(os.environ.get("LB_WATCHDOG_S", "900")), exit=True
)

import numpy as np  # noqa: E402


def main():
    import jax

    sizes_mb = [
        float(s) for s in os.environ.get("LB_SIZES", "0.25,1,2,8,32").split(",")
    ]
    counts = [int(c) for c in os.environ.get("LB_COUNTS", "1,4,16").split(",")]
    trials = int(os.environ.get("LB_TRIALS", "3"))
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})")
    rng = np.random.RandomState(0)

    print(f"{'size':>8} {'count':>6} {'best ms':>9} {'MB/s':>8}  (per-put ms)")
    for mb in sizes_mb:
        nbytes = int(mb * 1e6)
        for cnt in counts:
            best = float("inf")
            for t in range(trials):
                bufs = [
                    rng.randint(0, 256, nbytes, dtype=np.uint8)
                    for _ in range(cnt)
                ]
                t0 = time.perf_counter()
                outs = [jax.device_put(b) for b in bufs]
                jax.block_until_ready(outs)
                best = min(best, time.perf_counter() - t0)
                del outs
            total = nbytes * cnt
            print(
                f"{mb:7.2f}M {cnt:6d} {best*1e3:9.1f} {total/best/1e6:8.0f}"
                f"  ({best*1e3/cnt:.1f})",
                flush=True,
            )

    faulthandler.cancel_dump_traceback_later()


if __name__ == "__main__":
    main()
