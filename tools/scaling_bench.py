#!/usr/bin/env python3
"""Weak-scaling efficiency report: MPix/s at 1 vs N mesh devices.

BASELINE.md targets >= 85% scaling efficiency on a 2-host pod slice.
Real multi-chip hardware is not reachable from this host, so this
harness measures the sharded decode step over an N-device mesh (virtual
CPU devices by default; on a pod slice the same code runs unchanged over
real chips) with a batch proportional to N (weak scaling), and prints
per-N throughput plus efficiency vs the single-device run.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/scaling_bench.py
Env: SCALE_STEPS (default 10), SCALE_PER_DEV (images per device, default 4).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Force the virtual CPU mesh: the session env pins JAX_PLATFORMS=axon
# (one real chip — reserved for bench clients, and a 1-device platform
# cannot host the N-device mesh anyway).  SCALE_PLATFORM overrides for
# a real pod slice.
os.environ["JAX_PLATFORMS"] = os.environ.get("SCALE_PLATFORM", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()


def main():
    import jax

    try:  # the session sitecustomize pins jax_platforms=axon; override it
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass
    import numpy as np
    from functools import partial
    from jax.sharding import NamedSharding, PartitionSpec as P

    from zpix_tpu.parallel.batch import parse_coefficients, _ycbcr_graph
    from zpix_tpu.parallel.mesh import make_mesh

    steps = int(os.environ.get("SCALE_STEPS", "10"))
    per_dev = int(os.environ.get("SCALE_PER_DEV", "4"))

    data = open(
        "/root/reference/src/testdata/video-001.q50.420.jpeg", "rb"
    ).read()
    fe = parse_coefficients(data)
    mpix = fe.height * fe.width / 1e6

    devices = jax.devices()
    if devices[0].platform == "cpu":
        print(
            f"# NOTE: {len(devices)} virtual CPU devices share "
            f"{os.cpu_count()} physical cores — the total-throughput "
            "ceiling here is host compute, not sharding overhead; on real "
            "chips the same sharded program scales per device."
        )
    sizes = sorted({1, 2, len(devices) // 2, len(devices)} - {0})
    base = None
    for n in sizes:
        mesh = make_mesh(devices[:n], batch=n, stripe=1)
        B = n * per_dev
        stack = lambda a: np.stack([a] * B)  # noqa: E731
        args = [stack(fe.coeffs[0]), stack(fe.coeffs[1]), stack(fe.coeffs[2]),
                stack(fe.quants[0]), stack(fe.quants[1]), stack(fe.quants[2])]
        sh = NamedSharding(mesh, P("batch"))
        fn = jax.jit(
            partial(_ycbcr_graph, height=fe.height, width=fe.width,
                    ratio=fe.ratio),
            out_shardings=sh,
        )
        dargs = [jax.device_put(a, sh) for a in args]
        fn(*dargs).block_until_ready()  # compile
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*dargs)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        rate = steps * B * mpix / dt
        if base is None:
            base = rate  # per-device baseline at n=1
        eff = rate / (base * n)
        print(
            f"n={n}: {rate:8.1f} MPix/s total | {rate / n:8.1f} /dev | "
            f"efficiency {eff * 100:5.1f}%"
        )

    # ---- dp x sp leg (SURVEY §2.7 SP analog): block rows sharded over a
    # ('batch' x 'stripe') mesh, exactly the dryrun_multichip shardings —
    # this measures the stripe axis the round-3 artifact pinned to 1.
    print("# dp x sp leg: coefficient block rows stripe-sharded")

    def pad_rows(a, mult):
        r = (-a.shape[1]) % mult
        if r == 0:
            return a
        return np.concatenate(
            [a, np.zeros((a.shape[0], r) + a.shape[2:], a.dtype)], axis=1
        )

    for n in sizes:
        if n % 2:
            continue  # stripe=2 needs an even device count
        stripe = 2
        mesh = make_mesh(devices[:n], batch=n // stripe, stripe=stripe)
        B = (n // stripe) * per_dev
        stack = lambda a: np.stack([a] * B)  # noqa: E731
        cy = pad_rows(stack(fe.coeffs[0]), 2 * stripe)
        ccb = pad_rows(stack(fe.coeffs[1]), stripe)
        ccr = pad_rows(stack(fe.coeffs[2]), stripe)
        qs = [stack(fe.quants[c]) for c in range(3)]
        coeff_sh = NamedSharding(mesh, P("batch", "stripe"))
        q_sh = NamedSharding(mesh, P("batch"))
        out_sh = NamedSharding(mesh, P("batch"))
        fn = jax.jit(
            partial(_ycbcr_graph, height=fe.height, width=fe.width,
                    ratio=fe.ratio),
            out_shardings=out_sh,
        )
        dargs = [jax.device_put(a, coeff_sh) for a in (cy, ccb, ccr)] + [
            jax.device_put(q, q_sh) for q in qs
        ]
        fn(*dargs).block_until_ready()  # compile
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*dargs)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        rate = steps * B * mpix / dt
        eff = rate / (base * n) if base else 0.0
        print(
            f"n={n} (dp={n // stripe} x sp={stripe}): {rate:8.1f} MPix/s "
            f"total | {rate / n:8.1f} /dev | efficiency {eff * 100:5.1f}%"
        )


if __name__ == "__main__":
    main()
