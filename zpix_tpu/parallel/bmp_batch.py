"""Batched BMP decode: host header parse -> device unpack/swizzle.

BMP is raw pixels behind a header (reference
/root/reference/src/bmp/decoder.zig:42-307), so the device graph is the
whole decode: bit unpack + palette gather for 1/2/4/8 bpp, BGR(A)->RGBA
swizzle for 24/32, bottom-up row flip, and the exact premultiply of
rgba_pixels for the V4/V5 alpha arm.  Output is premultiplied RGBA8
[B, H, W, 4] — the same flatten every other batched decoder produces.
"""

from __future__ import annotations

import numpy as np

from ..codecs.bmp.decode import _read_header
from ..errors import UnexpectedEof, UnsupportedError

_JITTED: dict = {}


def _bmp_graph(rows, palette, *, bpp, width, top_down, allow_alpha):
    import jax.numpy as jnp

    if bpp in (1, 2, 4, 8):
        if bpp == 8:
            idx = rows[:, :, :width].astype(jnp.int32)
        else:
            bits = jnp.unpackbits(rows, axis=-1)
            grouped = bits.reshape(
                bits.shape[0], bits.shape[1], -1, bpp
            ).astype(jnp.int32)
            weights = 1 << jnp.arange(bpp - 1, -1, -1, dtype=jnp.int32)
            idx = (grouped * weights).sum(axis=-1)[:, :, :width]
        batch_idx = jnp.arange(palette.shape[0])[:, None, None]
        out = palette[batch_idx, idx]
    elif bpp == 24:
        bgr = rows[:, :, : 3 * width].reshape(
            rows.shape[0], rows.shape[1], width, 3
        )
        a = jnp.full(bgr.shape[:-1] + (1,), 255, jnp.uint8)
        out = jnp.concatenate([bgr[..., 2:3], bgr[..., 1:2], bgr[..., 0:1], a], -1)
    else:  # 32
        px = rows.reshape(rows.shape[0], rows.shape[1], width, 4)
        b, g, r = px[..., 0:1], px[..., 1:2], px[..., 2:3]
        if allow_alpha:
            # NRGBA -> premultiplied, the exact rgba_pixels math
            # (image.zig:103-130 via the nrgba arm)
            a = px[..., 3:4].astype(jnp.int32)
            rgb = jnp.concatenate([r, g, b], -1).astype(jnp.int32)
            wide = rgb | (rgb << 8)
            pre = (((wide * a) // 0xFF) >> 8).astype(jnp.uint8)
            out = jnp.concatenate([pre, px[..., 3:4]], -1)
        else:
            a = jnp.full(px.shape[:-1] + (1,), 255, jnp.uint8)
            out = jnp.concatenate([r, g, b, a], -1)
    if not top_down:
        out = out[:, ::-1]
    return out


class BatchBmpDecoder:
    """Same-shape batched BMP -> device premultiplied RGBA8 [B, H, W, 4]."""

    def __init__(self, mesh=None):
        self.mesh = mesh

    def _shard(self, arr):
        if self.mesh is None:
            return arr
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(arr, NamedSharding(self.mesh, P("batch")))

    def decode(self, datas: list[bytes]):
        import jax

        if not datas:
            raise ValueError("bmp: empty batch")
        heads = [_read_header(d) for d in datas]
        h0 = heads[0]
        for hh in heads[1:]:
            if (hh[0], hh[1], hh[2], hh[3], hh[4]) != (
                h0[0], h0[1], h0[2], h0[3], h0[4]
            ):
                raise UnsupportedError(
                    "bmp: batch must share (width, height, orientation, "
                    "bpp, header version)"
                )
        width, height, top_down, bpp, allow_alpha, _, _ = h0
        if bpp in (1, 2, 4, 8):
            per_byte = 8 // bpp
            row_bytes = ((width + per_byte - 1) // per_byte + 3) & ~3
        elif bpp == 24:
            row_bytes = (3 * width + 3) & ~3
        else:
            row_bytes = 4 * width
        need = row_bytes * height
        rows = np.empty((len(datas), height, row_bytes), np.uint8)
        pal = np.zeros((len(datas), 256, 4), np.uint8)
        for i, (d, hh) in enumerate(zip(datas, heads)):
            body = d[hh[6] :]
            if len(body) < need:
                raise UnexpectedEof("bmp: truncated pixel data")
            rows[i] = np.frombuffer(body[:need], np.uint8).reshape(
                height, row_bytes
            )
            if hh[5] is not None:
                pal[i, : len(hh[5])] = hh[5]
        key = (bpp, width, height, top_down, allow_alpha, len(datas))
        fn = _JITTED.get(key)
        if fn is None:
            fn = jax.jit(
                lambda r, p: _bmp_graph(
                    r, p, bpp=bpp, width=width, top_down=top_down,
                    allow_alpha=allow_alpha,
                )
            )
            _JITTED[key] = fn
        return fn(self._shard(rows), self._shard(pal))
