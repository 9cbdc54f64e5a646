"""Batched JPEG decode: host entropy front-end -> one jitted device graph.

Pipeline (north-star config, BASELINE.md):
  1. front-end: per-image entropy decode to coefficient tensors
     [bv, bh, 64] int32 per component (host scan or native runtime;
     embarrassingly parallel across the batch)
  2. device graph (jit, sharded over the mesh): dequant -> exact Wang IDCT
     -> +128 level shift -> plane assembly -> chroma upsample ->
     exact integer YCbCr->RGB  (all fused by XLA into a few kernels)

Every image in a batch must share (height, width, ratio) — the padded
bucketing strategy SURVEY.md sec.7 calls for; mixed sizes go in separate
buckets/graphs.
"""

from __future__ import annotations

import numpy as np

from ..codecs.jpeg.decoder import Decoder
from ..codecs.jpeg.tables import UNZIG
from ..image.model import chroma_dims
from ..ops.idct import _col_pass, _row_pass
from ..ops.ycbcr import upsample_chroma_jnp, ycbcr_to_rgb8_jnp


class FrontEndResult:
    """Per-image entropy-decode output."""

    __slots__ = ("width", "height", "ratio", "ncomp", "coeffs", "quants", "hv")

    def __init__(self, width, height, ratio, ncomp, coeffs, quants, hv):
        self.width = width
        self.height = height
        self.ratio = ratio
        self.ncomp = ncomp
        self.coeffs = coeffs  # list of [bv, bh, 64] int32 (natural order)
        self.quants = quants  # list of [64] int32 (natural order)
        self.hv = hv  # list of (h, v)


def parse_coefficients(data: bytes) -> FrontEndResult:
    """Entropy-decode a JPEG to coefficient tensors without reconstructing."""
    d = Decoder(data)
    d.collect_only = True
    d.decode_inner(False)
    ncomp = d.num_components
    ratio = d._subsample_ratio() if ncomp >= 3 else "gray"
    coeffs, quants, hv = [], [], []
    for i in range(ncomp):
        coeffs.append(d.coeff[i] if d.coeff[i] is not None else None)
        qzig = d.quant[d.component[i].tq]
        qnat = np.empty(64, np.int32)
        qnat[UNZIG] = qzig
        quants.append(qnat)
        hv.append((d.component[i].h, d.component[i].v))
    return FrontEndResult(d.width, d.height, ratio, ncomp, coeffs, quants, hv)


def _blocks_to_plane(jnp, blocks):
    """[B, bv, bh, 8, 8] -> [B, 8*bv, 8*bh]."""
    b, bv, bh = blocks.shape[0], blocks.shape[1], blocks.shape[2]
    return jnp.transpose(blocks, (0, 1, 3, 2, 4)).reshape(b, bv * 8, bh * 8)


def _component_plane(jnp, coeff, quant):
    """Dequant + IDCT + level shift one component: [B,bv,bh,64] -> plane."""
    deq = coeff.astype(jnp.int32) * quant[:, None, None, :]
    blocks = deq.reshape(deq.shape[:-1] + (8, 8))
    out = _col_pass(_row_pass(blocks, jnp), jnp)
    pix = jnp.clip(out + jnp.int32(128), 0, 255).astype(jnp.uint8)
    return _blocks_to_plane(jnp, pix)


_RATIO_FACTORS = {
    "444": (1, 1),
    "422": (2, 1),
    "420": (2, 2),
    "440": (1, 2),
    "411": (4, 1),
    "410": (4, 2),
}


def _ycbcr_graph(cy, ccb, ccr, qy, qcb, qcr, *, height, width, ratio):
    """Device graph: coefficients -> interleaved RGB8 [B, H, W, 3].

    cy/ccb/ccr: [B, bv, bh, 64] int32; qy/qcb/qcr: [B, 64] int32.
    """
    import jax.numpy as jnp

    y = _component_plane(jnp, cy, qy)[:, :height, :width]
    cb_p = _component_plane(jnp, ccb, qcb)
    cr_p = _component_plane(jnp, ccr, qcr)
    hf, vf = _RATIO_FACTORS[ratio]
    cb = upsample_chroma_jnp(cb_p, hf, vf, height, width)
    cr = upsample_chroma_jnp(cr_p, hf, vf, height, width)
    r, g, b = ycbcr_to_rgb8_jnp(y, cb, cr)
    return jnp.stack([r, g, b], axis=-1)


def _gray_graph(cy, qy, *, height, width):
    import jax.numpy as jnp

    return _component_plane(jnp, cy, qy)[:, :height, :width]


_JITTED: dict = {}


def _jitted(name, fn, static):
    if name not in _JITTED:
        import jax

        _JITTED[name] = jax.jit(fn, static_argnames=static)
    return _JITTED[name]


def decode_batch_ycbcr_to_rgb(cy, ccb, ccr, qy, qcb, qcr, *, height, width, ratio):
    return _jitted("ycbcr", _ycbcr_graph, ("height", "width", "ratio"))(
        cy, ccb, ccr, qy, qcb, qcr, height=height, width=width, ratio=ratio
    )


def decode_batch_gray(cy, qy, *, height, width):
    return _jitted("gray", _gray_graph, ("height", "width"))(
        cy, qy, height=height, width=width
    )


class BatchJpegDecoder:
    """Same-shape batched JPEG decoding, optionally sharded over a mesh.

    usage:
        dec = BatchJpegDecoder(mesh)           # mesh from parallel.make_mesh
        rgb = dec.decode([jpeg_bytes, ...])    # [B, H, W, 3] uint8 on device
    """

    def __init__(self, mesh=None, front_end=parse_coefficients):
        self.mesh = mesh
        self.front_end = front_end

    def _shard(self, arr):
        if self.mesh is None:
            return arr
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(arr, NamedSharding(self.mesh, P("batch")))

    def decode(self, datas: list[bytes]):
        fes = [self.front_end(d) for d in datas]
        f0 = fes[0]
        for fe in fes[1:]:
            if (fe.width, fe.height, fe.ratio) != (f0.width, f0.height, f0.ratio):
                raise ValueError(
                    "batch images must share (width, height, ratio); "
                    "bucket mixed shapes separately"
                )
        if f0.ncomp == 1:
            cy = self._shard(np.stack([fe.coeffs[0] for fe in fes]))
            qy = self._shard(np.stack([fe.quants[0] for fe in fes]))
            return decode_batch_gray(cy, qy, height=f0.height, width=f0.width)
        cy = self._shard(np.stack([fe.coeffs[0] for fe in fes]))
        ccb = self._shard(np.stack([fe.coeffs[1] for fe in fes]))
        ccr = self._shard(np.stack([fe.coeffs[2] for fe in fes]))
        qy = self._shard(np.stack([fe.quants[0] for fe in fes]))
        qcb = self._shard(np.stack([fe.quants[1] for fe in fes]))
        qcr = self._shard(np.stack([fe.quants[2] for fe in fes]))
        return decode_batch_ycbcr_to_rgb(
            cy, ccb, ccr, qy, qcb, qcr,
            height=f0.height, width=f0.width, ratio=f0.ratio,
        )
