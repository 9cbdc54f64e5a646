#!/usr/bin/env python3
"""Benchmark: batched 4:2:0 baseline JPEG decode, megapixels/s/chip.

The driver's headline metric (BASELINE.md: target >= 2 GPix/s/chip).
Pipeline measured end-to-end: native C++ entropy front-end (thread pool,
GIL released during scans) overlapped with the jitted TPU back-end
(dequant + exact Wang IDCT + level shift + chroma upsample + exact
YCbCr->RGB).  Coefficients travel host->device as int16.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MPix/s/chip", "vs_baseline": N/2000}
"""

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402


def make_bench_jpeg(size: int = 1024, quality: int = 50) -> bytes:
    """Deterministic structured test image -> baseline 4:2:0 JPEG."""
    from PIL import Image

    x = np.linspace(0, 20, size)
    base = (128 + 100 * np.sin(x[None, :] * np.cos(x[:, None]))).astype(np.uint8)
    rgb = np.stack([base, base.T, (base // 2 + 64)], -1)
    from io import BytesIO

    buf = BytesIO()
    Image.fromarray(rgb).save(buf, format="JPEG", quality=quality, subsampling=2)
    return buf.getvalue()


def main():
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    size = int(os.environ.get("BENCH_SIZE", "1024"))
    steps = int(os.environ.get("BENCH_STEPS", "12"))
    workers = int(os.environ.get("BENCH_WORKERS", str(os.cpu_count() or 8)))

    import jax

    from zpix_tpu.parallel.batch import (
        _pad_vals,
        decode_batch_ycbcr_packed,
        parse_coefficients,
        parse_packed_native,
    )

    data = make_bench_jpeg(size)
    mpix_per_image = size * size / 1e6

    # Warm the native runtime + get static shapes.
    fe0 = parse_coefficients(data)
    h, w, ratio = fe0.height, fe0.width, fe0.ratio
    by, bx = fe0.coeffs[0].shape[:2]
    cby, cbx = fe0.coeffs[1].shape[:2]

    import jax as _jax

    from zpix_tpu.parallel.batch import NativeBatchFrontEnd

    stager = ThreadPoolExecutor(max_workers=2)  # parse + upload pipeline
    # Two front-end instances so parse(i+1) can fill its buffers while
    # slot i's arrays are still being uploaded.
    fe_native = [NativeBatchFrontEnd(data, batch, workers) for _ in range(2)]

    def host_batch(slot=0):
        # One C call parses the whole batch with an internal thread pool;
        # device_put here so the H2D transfer overlaps the device step
        # dispatched from the main thread.
        bitmaps, vals, _ = fe_native[slot]([data] * batch)
        out = []
        for c in range(3):
            out.append(_jax.device_put(bitmaps[c].reshape(batch, -1, 8)))
            out.append(_jax.device_put(vals[c]))
        # Block before returning so the slot's host buffers are safe to
        # reuse on the next parse into this slot.
        _jax.block_until_ready(out)
        return out

    qy = np.stack([fe0.quants[0]] * batch)
    qcb = np.stack([fe0.quants[1]] * batch)
    qcr = np.stack([fe0.quants[2]] * batch)

    def device_step(packed):
        return decode_batch_ycbcr_packed(
            *packed, qy, qcb, qcr,
            height=h, width=w, ratio=ratio, by=by, bx=bx, cby=cby, cbx=cbx,
        )

    # Warmup: compile + first transfers.
    packed = host_batch()
    out = device_step(packed)
    out.block_until_ready()

    # Overlapped pipeline: front-end of step i+1 runs while the device
    # executes step i (jax dispatch is async).
    t0 = time.perf_counter()
    pending = [stager.submit(host_batch, s) for s in range(2)]
    outs = []
    for i in range(steps):
        packed = pending[i % 2].result()
        if i + 2 < steps:
            pending[i % 2] = stager.submit(host_batch, i % 2)
        outs.append(device_step(packed))
    for o in outs:
        o.block_until_ready()
    elapsed = time.perf_counter() - t0

    total_mpix = steps * batch * mpix_per_image
    mpix_s = total_mpix / elapsed

    # Secondary numbers for the log (stderr, not the metric line).
    t1 = time.perf_counter()
    for _ in range(3):
        host_batch()
    fe_mpix_s = 3 * batch * mpix_per_image / (time.perf_counter() - t1)

    t2 = time.perf_counter()
    outs = [device_step(packed) for _ in range(3)]
    for o in outs:
        o.block_until_ready()
    dev_mpix_s = 3 * batch * mpix_per_image / (time.perf_counter() - t2)

    # PNG RGB8 secondary metric (BASELINE measurement line).
    png_mpix_s = 0.0
    try:
        from io import BytesIO

        from PIL import Image

        from zpix_tpu.parallel.png_batch import BatchPngDecoder

        x = np.linspace(0, 20, size)
        base_img = (128 + 100 * np.sin(x[None, :] * np.cos(x[:, None]))).astype(np.uint8)
        buf = BytesIO()
        Image.fromarray(np.stack([base_img, base_img.T, base_img // 2], -1)).save(
            buf, format="PNG"
        )
        png_data = buf.getvalue()
        dec = BatchPngDecoder(n_threads=workers)
        out = dec.decode([png_data] * batch)
        out.block_until_ready()
        t3 = time.perf_counter()
        png_steps = 4
        outs = []
        for _ in range(png_steps):
            outs.append(dec.decode([png_data] * batch))
        for o in outs:
            o.block_until_ready()
        png_mpix_s = png_steps * batch * mpix_per_image / (time.perf_counter() - t3)
    except Exception as e:  # secondary metric must not break the bench
        print(f"# png bench skipped: {e!r}", file=sys.stderr)

    print(
        f"# front-end {fe_mpix_s:.0f} MPix/s | device-path {dev_mpix_s:.0f} "
        f"MPix/s | png-rgb8 {png_mpix_s:.0f} MPix/s | batch={batch} "
        f"size={size} steps={steps} backend={jax.devices()[0].platform}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "batched 4:2:0 baseline JPEG decode",
                "value": round(mpix_s, 1),
                "unit": "MPix/s/chip",
                "vs_baseline": round(mpix_s / 2000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
