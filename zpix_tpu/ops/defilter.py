"""PNG defilter on device: the filter wavefront as one lax.scan.

Reference semantics: per-row filter byte, then bytewise recurrences
(/root/reference/src/png/decoder.zig:806-842; Paeth predictor and its
tie-break order :1152-1182):

    None     x[r,i] = raw[r,i]
    Sub      x[r,i] = raw[r,i] + x[r,i-bpp]
    Up       x[r,i] = raw[r,i] + x[r-1,i]
    Average  x[r,i] = raw[r,i] + ((x[r,i-bpp] + x[r-1,i]) >> 1)
    Paeth    x[r,i] = raw[r,i] + paeth(x[r,i-bpp], x[r-1,i], x[r-1,i-bpp])

(all mod 256; out-of-image neighbors are 0).  The dependency cone of a
pixel is {left, up, up-left}, so the exact parallel schedule is the
anti-diagonal wavefront: pixel (r, p) only needs pixels with p' + r' <
p + r.  Shearing each row right by its row index turns diagonals into
columns — skew column c holds pixel (r, c - r) — and every dependency
lands in skew columns c-1 (left AND up, one row apart) and c-2
(up-left).  One lax.scan over the H+W-1 skew columns then computes the
whole batch exactly: each step is elementwise math over a [B, bpp, H]
tile (H minor — the lane-dim rule), with the up/up-left reads as a
1-row shift along H.  No speculation, no per-pixel loop: serial depth
collapses from H*W to H+W.

The shear/unshear are the classic pad-and-reshape trick (pad each row
to width P+1, flat view, re-slice) — two O(H*P) uint8 copies, no gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def defilter_jnp(raw, ftypes, *, bpp: int, unroll: int = 4):
    """raw [B, H, Wb] uint8 (row bytes, filter byte stripped), ftypes
    [B, H] uint8 -> decoded [B, H, Wb] uint8.  Wb must be a multiple of
    bpp (true for every PNG depth: sub-byte depths have bpp=1)."""
    B, H, Wb = raw.shape
    if Wb % bpp:
        raise ValueError(f"defilter: row bytes {Wb} not a multiple of bpp {bpp}")
    W = Wb // bpp  # pixel columns
    P = W + H  # skew width (pixel units); last diagonal ends at W-1 + H-1

    # [B, H, W, bpp] -> [B, bpp, H, W]: byte-of-pixel major, H minor.
    x = jnp.transpose(raw.reshape(B, H, W, bpp), (0, 3, 1, 2))
    # Shear right by row index: pad W -> P+1 then flat re-slice, so
    # sk[b, j, r, c] = x[b, j, r, c - r] (zeros elsewhere).
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, P + 1 - W)))
    sk = xp.reshape(B, bpp, H * (P + 1))[:, :, : H * P].reshape(B, bpp, H, P)
    sk = jnp.moveaxis(sk, -1, 0)  # [P, B, bpp, H] scan-axis major

    f = ftypes.astype(jnp.int32)[:, None, :]  # [B, 1, H]
    rows = jnp.arange(H, dtype=jnp.int32)  # [H]
    zero = jnp.zeros((B, bpp, H), jnp.uint8)

    def shift_down(a):  # up-neighbor read: row r sees row r-1 (row 0 -> 0)
        return jnp.pad(a, ((0, 0), (0, 0), (1, 0)))[:, :, :H]

    def step(carry, xs):
        p1, p2 = carry  # decoded skew columns c-1, c-2: [B, bpp, H] uint8
        col_raw, c = xs
        pix = c - rows  # pixel index of this skew column per row
        in_img = ((pix >= 0) & (pix < W))[None, None, :]
        has_left = (pix >= 1)[None, None, :]
        left = jnp.where(has_left, p1, 0).astype(jnp.int32)
        upv = shift_down(p1).astype(jnp.int32)  # row 0 pads to 0
        ul = jnp.where(has_left, shift_down(p2), 0).astype(jnp.int32)

        avg = (left + upv) >> 1
        pp = left + upv - ul
        pa = jnp.abs(pp - left)
        pb = jnp.abs(pp - upv)
        pc = jnp.abs(pp - ul)
        paeth = jnp.where(
            (pa <= pb) & (pa <= pc), left, jnp.where(pb <= pc, upv, ul)
        )
        pred = jnp.where(
            f == 1, left,
            jnp.where(f == 2, upv, jnp.where(f == 3, avg,
                      jnp.where(f == 4, paeth, 0))),
        )
        out = ((col_raw.astype(jnp.int32) + pred) & 0xFF).astype(jnp.uint8)
        out = jnp.where(in_img, out, jnp.uint8(0))
        return (out, p1), out

    xs = (sk, jnp.arange(P, dtype=jnp.int32))
    _, cols = jax.lax.scan(step, (zero, zero), xs, unroll=unroll)

    # Unshear: y[b, j, r, p] = cols[p + r, b, j, r] — same flat trick.
    y = jnp.moveaxis(cols, 0, -1)  # [B, bpp, H, P]
    yp = jnp.pad(y.reshape(B, bpp, H * P), ((0, 0), (0, 0), (0, H)))
    out = yp.reshape(B, bpp, H, P + 1)[:, :, :, :W]
    return jnp.transpose(out, (0, 2, 3, 1)).reshape(B, H, Wb)
