"""Progressive JPEG with a device-resident coefficient store.

The reference accumulates progressive coefficients across scans in host
arrays and reconstructs once at EOI (decoder.zig:148, :1268-1283,
:1636-1661) — decode-state-as-data, its only checkpoint-like structure.
Here that multi-scan state lives in HBM: per-scan Huffman stays on the
host/native front-end (the bit-serial part), but every scan's effect on
the coefficient store — new spectral coefficients, DC bits, refinement
corrections (decoder.zig:1459-1549) — uploads as sparse (index, delta)
pairs and applies on device via one scatter-add into persistent
[B, bv, bh, 64] int32 tensors.  The final reconstruct (dequant + exact
Wang IDCT + level shift + upsample + exact YCbCr->RGB) is the existing
batched device graph, so pixels never round-trip through the host.

A refinement scan touches few coefficients (one correction bit each), so
the per-scan upload is a small fraction of the dense store; a streaming
consumer can render progressively from device state after any scan.
"""

from __future__ import annotations

import numpy as np

from ..codecs.jpeg.decoder import Decoder
from ..errors import UnsupportedError
from .batch import _gray_graph, _ycbcr_graph, FrontEndResult
from ..codecs.jpeg.tables import UNZIG


class _ScanRecorder(Decoder):
    """Host front-end that snapshots the coefficient deltas of every scan.

    The per-scan Huffman/EOB-run decode is the inherited host/native scan
    (decoder.py process_sos / _native_scan); after each scan the diff
    against the previous coefficient state is recorded sparsely.
    """

    def __init__(self, data: bytes):
        super().__init__(data)
        self.collect_only = True
        self.scan_events: list = []  # per scan: [(comp, idx, val int32)]
        self._prev: dict = {}

    def process_sos(self, n: int) -> None:
        super().process_sos(n)
        ev = []
        for c in range(self.num_components):
            cur = self.coeff[c]
            if cur is None:
                continue
            cur = cur.astype(np.int32, copy=False)
            prev = self._prev.get(c)
            diff = cur if prev is None else cur - prev
            flat = np.ascontiguousarray(diff).reshape(-1)
            idx = np.flatnonzero(flat).astype(np.int32)
            if idx.size:
                ev.append((c, idx, flat[idx].astype(np.int32)))
            self._prev[c] = cur.copy()
        self.scan_events.append(ev)


def _bucket(n: int) -> int:
    """Pad sparse-update lengths to power-of-two buckets (bounds the
    number of compiled apply programs)."""
    b = 64
    while b < n:
        b *= 2
    return b


class DeviceProgressiveDecoder:
    """Same-geometry progressive JPEG batch -> device RGB/gray.

    decode() runs scan-by-scan: host entropy decode, sparse delta upload,
    device scatter-add into the persistent store, then one device
    reconstruct.  Output is bit-exact with the host path (same
    coefficient algebra: the store after scan s equals the reference's,
    because deltas are exact diffs of its own scan semantics).
    """

    def __init__(self):
        self._apply_fns: dict = {}
        self._recon_fns: dict = {}

    def _apply(self, state, idx, val):
        """state [B, N] int32 += scatter(val at idx) per batch row."""
        import jax

        key = (state.shape, idx.shape)
        fn = self._apply_fns.get(key)
        if fn is None:

            def apply(st, i, v):
                return jax.vmap(lambda s, ii, vv: s.at[ii].add(vv))(st, i, v)

            fn = jax.jit(apply, donate_argnums=0)
            self._apply_fns[key] = fn
        return fn(state, idx, val)

    def decode(self, datas: list[bytes]):
        import jax
        import jax.numpy as jnp

        if not datas:
            raise ValueError("jpeg: empty batch")
        recs = []
        for d in datas:
            r = _ScanRecorder(d)
            r.decode_inner(False)
            if not r.progressive:
                raise UnsupportedError(
                    "jpeg: DeviceProgressiveDecoder is for SOF2 streams; "
                    "use BatchJpegDecoder / DeviceJpegDecoder for baseline"
                )
            if r.num_components == 4 or r.is_rgb():
                raise UnsupportedError(
                    "jpeg: progressive device path covers gray/YCbCr only "
                    "(CMYK/RGB need applyBlack/convertToRGB, decoder.zig:751-902)"
                )
            recs.append(r)
        r0 = recs[0]
        ncomp = r0.num_components
        geo = (r0.width, r0.height, ncomp,
               tuple((c.h, c.v) for c in r0.component[:ncomp]))
        shapes = tuple(r0.coeff[c].shape for c in range(ncomp))
        for r in recs[1:]:
            g = (r.width, r.height, r.num_components,
                 tuple((c.h, c.v) for c in r.component[:r.num_components]))
            if g != geo:
                raise UnsupportedError("jpeg: batch must share geometry")

        B = len(datas)
        # Persistent device store: one flat [B, N_c] int32 per component.
        state = [
            jnp.zeros((B, int(np.prod(shapes[c]))), jnp.int32)
            for c in range(ncomp)
        ]

        # Replay scans in lockstep (images may have different scan counts;
        # missing scans contribute empty deltas).
        n_scans = max(len(r.scan_events) for r in recs)
        for s in range(n_scans):
            for c in range(ncomp):
                pairs = []
                for r in recs:
                    ev = r.scan_events[s] if s < len(r.scan_events) else []
                    hit = [(i, v) for cc, i, v in ev if cc == c]
                    pairs.append(hit[0] if hit else (None, None))
                k = max((i.size for i, _ in pairs if i is not None), default=0)
                if k == 0:
                    continue
                kb = _bucket(k)
                idx = np.zeros((B, kb), np.int32)
                val = np.zeros((B, kb), np.int32)
                for b, (i, v) in enumerate(pairs):
                    if i is not None:
                        idx[b, : i.size] = i
                        val[b, : i.size] = v  # pad rows add 0 at index 0
                state[c] = self._apply(
                    state[c], jnp.asarray(idx), jnp.asarray(val)
                )

        # Final reconstruct on device from the resident store; quant
        # tables are per image (mixed-content batches share geometry but
        # not necessarily quality).
        quants = []
        for c in range(ncomp):
            per_img = []
            for r in recs:
                qzig = r.quant[r.component[c].tq]
                qnat = np.empty(64, np.int32)
                qnat[UNZIG] = qzig
                per_img.append(qnat)
            quants.append(np.stack(per_img))
        key = (geo, B)
        fn = self._recon_fns.get(key)
        if fn is None:
            ratio = r0._subsample_ratio() if ncomp >= 3 else "gray"

            def recon(st, qs):
                grids = [
                    st[c].reshape((B,) + shapes[c]) for c in range(ncomp)
                ]
                if ncomp == 1:
                    return _gray_graph(
                        grids[0], qs[0], height=r0.height, width=r0.width
                    )
                return _ycbcr_graph(
                    grids[0], grids[1], grids[2], *qs,
                    height=r0.height, width=r0.width, ratio=ratio,
                )

            fn = jax.jit(recon)
            self._recon_fns[key] = fn
        return fn(state, [jnp.asarray(q) for q in quants])

    def reference_frontends(self, datas: list[bytes]) -> list[FrontEndResult]:
        """Host coefficient tensors for differential testing."""
        from .batch import parse_coefficients

        return [parse_coefficients(d) for d in datas]
