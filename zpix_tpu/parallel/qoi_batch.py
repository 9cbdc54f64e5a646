"""On-chip QOI decode: chunked speculative scan with exact verification.

The QOI op stream (reference /root/reference/src/qoi/decoder.zig:20-130) is
serial by construction: every op updates a previous-pixel register and a
64-entry rolling index keyed by (3r+5g+7b+11a)&63, and OP_INDEX reads back
arbitrary history.  But ops are byte-aligned and self-delimiting (the first
byte alone determines the op length: OP_RGB=4, OP_RGBA=5, OP_LUMA=2, else 1),
so the same fixed-point machinery as the restart-free JPEG path
(device_entropy_sync) applies with *byte* chunks and a wider lane state:

1. **Speculative scan.**  The stream is cut into fixed CHUNK_BYTES chunks;
   every chunk lane decodes ops from its entry state, guessing
   (pos=chunk_start, px=(0,0,0,255), index=zeros).  Exit state =
   (byte pos of the first op boundary at/past the chunk end, px, index).
2. **Fixed-point propagation.**  entries[i] := exits[i-1] (chunk 0 pinned to
   the true initial state); rescan until no entry changes.  Convergence is
   guaranteed in <= F rounds (after round r, chunks 0..r-1 are exact), and
   the fixed point IS the serial decode by induction — verification is
   exact, not probabilistic.  In practice the index table is mostly
   rewritten within one chunk, so 2-4 rounds converge.
3. **Record scan.**  One more scan from converged entries records each op's
   (packed RGBA color, emitted pixel count) into per-chunk capacity slots
   (one-hot accumulation — no scatter).
4. **Assembly.**  Per-image cumsum of counts + one searchsorted expands
   run-length (color, count) pairs into the [H*W] pixel raster; pixels past
   the emitted total replicate the final decoder px (the reference's
   stream-exhausted fill, decoder.zig:67-69 / codecs/qoi/decode.py:96-103).

ok=False (scan error, slot overflow, or op reading past the image's padded
end) -> callers fall back to the host decoder for parity.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..errors import FormatError, UnsupportedError
from ..codecs.qoi.decode import QOI_HEADER_SIZE, QOI_PADDING_SIZE, _parse_header

_DEF_CHUNK = int(os.environ.get("ZPIX_QOI_CHUNK", "64"))
_DEF_K = int(os.environ.get("ZPIX_QOI_K", "4"))


@dataclass
class QoiPlan:
    """Host-side prep of a same-dimensions QOI batch."""

    width: int
    height: int
    stream: np.ndarray  # op streams (+ their 8-byte padding) back to back
    img_byte_start: np.ndarray  # int32 [B] first op byte
    img_byte_end: np.ndarray  # int32 [B] end of op bytes (excl. padding)
    img_raw_end: np.ndarray  # int32 [B] end incl. the 8-byte padding
    chunk_bytes: int
    n_chunks: int  # per image (padded to the longest op stream)
    batch: int
    cache_key: tuple = None


def prep_qoi_batch(datas: list[bytes], chunk_bytes: int | None = None,
                   cap_hint: int | None = None) -> QoiPlan:
    """cap_hint: minimum stream-buffer capacity (shared-layout batches,
    see device_entropy.prep_batch)."""
    if not datas:
        raise ValueError("qoi: empty batch")
    cb = chunk_bytes or _DEF_CHUNK
    dims = None
    regions = []
    for d in datas:
        w, h, _, _ = _parse_header(d)
        if dims is None:
            dims = (w, h)
        elif dims != (w, h):
            raise UnsupportedError("qoi: batch must share dimensions")
        # op bytes plus the trailing 8-byte padding (reads may run into it,
        # mirroring the host decoder's p+k <= len(d) guards)
        regions.append(np.frombuffer(d, np.uint8)[QOI_HEADER_SIZE:])

    offs, total = [], 0
    for r in regions:
        offs.append(total)
        total += (len(r) + 7) // 8 * 8
    cap = 1 << max(12, (max(total + 16, cap_hint or 0) - 1).bit_length())
    flat = np.zeros(cap, np.uint8)
    for r, o in zip(regions, offs):
        flat[o : o + len(r)] = r
    op_lens = [len(r) - QOI_PADDING_SIZE for r in regions]
    return QoiPlan(
        width=dims[0], height=dims[1], stream=flat,
        img_byte_start=np.array(offs, np.int32),
        img_byte_end=np.array(
            [o + n for o, n in zip(offs, op_lens)], np.int32
        ),
        img_raw_end=np.array(
            [o + len(r) for o, r in zip(offs, regions)], np.int32
        ),
        chunk_bytes=cb,
        # bucket the chunk count (extra chunks start past img_byte_end
        # and stay inactive) so distinct-content batches share compiled
        # programs; the count also keys the program cache below
        n_chunks=((max(op_lens) + cb - 1) // cb + 31) // 32 * 32,
        batch=len(datas),
        cache_key=(dims, len(datas), cb),
    )


def build_qoi_decode_fn(plan: QoiPlan, *, k_ops: int | None = None,
                        max_rounds: int | None = None, _raw: bool = False,
                        mesh=None):
    """Returns a jitted fn: (stream, img_byte_start, img_byte_end,
    img_raw_end) -> (rgba [B, H, W, 4] uint8, ok flag).

    mesh: shard the lane state over the mesh 'batch' axis.  Lanes are
    batch-major ([L] = [B, F] flattened), so a leading-axis shard keeps
    every image's chunk lanes on one device; the compressed stream
    stays replicated (each lane gathers arbitrary offsets of it)."""
    import jax
    import jax.numpy as jnp

    lane_sh = out_sh = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        lane_sh = NamedSharding(mesh, P("batch"))
        out_sh = NamedSharding(mesh, P("batch"))

    def _lane(x):
        if lane_sh is None:
            return x
        return jax.lax.with_sharding_constraint(x, lane_sh)

    def _b(x):
        """Constrain a [B, ...] per-image array onto the batch axis."""
        if out_sh is None:
            return x
        return jax.lax.with_sharding_constraint(x, out_sh)

    B = plan.batch
    F = plan.n_chunks
    L = B * F
    CB = plan.chunk_bytes
    mcap = CB  # every op consumes >= 1 byte, so <= CB ops start per chunk
    npx = plan.width * plan.height
    K = k_ops if k_ops is not None else _DEF_K
    rounds_cap = max_rounds if max_rounds is not None else F + 2
    step_cap = CB + 2  # ops per chunk, whatever the unroll slices it into

    PX0 = np.uint32(0x000000FF)  # r=g=b=0, a=255 (decoder.zig:60-62)

    def decode(stream, img_byte_start, img_byte_end, img_raw_end):
        u32 = jnp.uint32
        i32 = jnp.int32
        s = stream.astype(u32)
        n = stream.shape[0] - 8
        b = [s[i : n + i] for i in range(8)]
        # win[p] = bytes p..p+7 as two big-endian u32 words
        w0 = (b[0] << 24) | (b[1] << 16) | (b[2] << 8) | b[3]
        w1 = (b[4] << 24) | (b[5] << 16) | (b[6] << 8) | b[7]
        win = jnp.stack([w0, w1], axis=-1)  # [n, 2]

        img_start = img_byte_start.astype(i32)
        img_end = img_byte_end.astype(i32)
        raw_end = img_raw_end.astype(i32)
        lane_img = jnp.repeat(jnp.arange(B), F)  # [L]
        lane_chunk = jnp.tile(jnp.arange(F), B)  # [L]
        chunk_start = jnp.minimum(
            img_start[lane_img] + lane_chunk * CB, img_end[lane_img]
        )
        chunk_end = jnp.minimum(chunk_start + CB, img_end[lane_img])
        lane_raw_end = raw_end[lane_img]
        slots = jnp.arange(64, dtype=i32)[None, :]  # [1, 64]

        def scan_chunks(entries, record):
            e_pos, e_px, e_idx = entries

            def body(st):
                pos, px, idx, done, err, cols, cnts, cnt, steps = st
                emits = []
                for _ in range(K):
                    active = ~done
                    w = win[jnp.clip(pos, 0, n - 1)]  # [L, 2]
                    wa, wb = w[:, 0], w[:, 1]
                    b1 = (wa >> 24).astype(i32)
                    b2 = ((wa >> 16) & 0xFF).astype(i32)
                    b3 = ((wa >> 8) & 0xFF).astype(i32)
                    b4 = (wa & 0xFF).astype(i32)
                    b5 = (wb >> 24).astype(i32)

                    is_rgb = b1 == 0xFE
                    is_rgba = b1 == 0xFF
                    tag = b1 >> 6
                    lit = ~(is_rgb | is_rgba)

                    r = ((px >> 24) & 0xFF).astype(i32)
                    g = ((px >> 16) & 0xFF).astype(i32)
                    bl = ((px >> 8) & 0xFF).astype(i32)
                    a = (px & 0xFF).astype(i32)

                    # OP_INDEX: gather-free one-hot read of the rolling table
                    j = b1 & 63
                    hit = slots == j[:, None]  # [L, 64]
                    px_idx = jnp.sum(jnp.where(hit, idx, u32(0)), axis=1)
                    ir = ((px_idx >> 24) & 0xFF).astype(i32)
                    ig = ((px_idx >> 16) & 0xFF).astype(i32)
                    ib = ((px_idx >> 8) & 0xFF).astype(i32)
                    ia = (px_idx & 0xFF).astype(i32)

                    # OP_DIFF: 2-bit biased deltas (decoder.zig:97-101)
                    dr2 = ((b1 >> 4) & 3) - 2
                    dg2 = ((b1 >> 2) & 3) - 2
                    db2 = (b1 & 3) - 2
                    # OP_LUMA: 6+4+4-bit biased (decoder.zig:103-110)
                    dgl = (b1 & 63) - 32
                    drl = dgl + ((b2 >> 4) & 15) - 8
                    dbl = dgl + (b2 & 15) - 8

                    t_idx = lit & (tag == 0)
                    t_diff = lit & (tag == 1)
                    t_luma = lit & (tag == 2)
                    t_run = lit & (tag == 3)

                    nr = jnp.where(is_rgb | is_rgba, b2, r)
                    ng = jnp.where(is_rgb | is_rgba, b3, g)
                    nb = jnp.where(is_rgb | is_rgba, b4, bl)
                    na = jnp.where(is_rgba, b5, a)
                    nr = jnp.where(t_idx, ir, nr)
                    ng = jnp.where(t_idx, ig, ng)
                    nb = jnp.where(t_idx, ib, nb)
                    na = jnp.where(t_idx, ia, na)
                    nr = jnp.where(t_diff, (r + dr2) & 0xFF, nr)
                    ng = jnp.where(t_diff, (g + dg2) & 0xFF, ng)
                    nb = jnp.where(t_diff, (bl + db2) & 0xFF, nb)
                    nr = jnp.where(t_luma, (r + drl) & 0xFF, nr)
                    ng = jnp.where(t_luma, (g + dgl) & 0xFF, ng)
                    nb = jnp.where(t_luma, (bl + dbl) & 0xFF, nb)

                    size = jnp.where(
                        is_rgb, 4, jnp.where(is_rgba, 5, jnp.where(t_luma, 2, 1))
                    )
                    emit = jnp.where(t_run, (b1 & 63) + 1, 1)
                    bad = active & (pos + size > lane_raw_end)
                    app = active & ~bad

                    new_px = (
                        (nr.astype(u32) << 24)
                        | (ng.astype(u32) << 16)
                        | (nb.astype(u32) << 8)
                        | na.astype(u32)
                    )
                    px = jnp.where(app, new_px, px)
                    h = ((nr * 3 + ng * 5 + nb * 7 + na * 11) & 63)
                    wr = app[:, None] & (slots == h[:, None])
                    idx = jnp.where(wr, px[:, None], idx)

                    if record:
                        over = cnt >= mcap
                        emits.append((
                            jnp.clip(cnt, 0, mcap - 1),
                            jnp.where(app & ~over, px, u32(0)),
                            jnp.where(app & ~over, emit, 0),
                        ))
                        err = err | (app & over)
                    cnt = jnp.where(app, cnt + 1, cnt)
                    pos = jnp.where(app, pos + size, pos)
                    err = err | bad
                    done = done | (pos >= chunk_end) | bad
                if record:
                    arb = jnp.arange(mcap)[None, :]
                    cols = cols + sum(
                        jnp.where(ci[:, None] == arb, cv[:, None], u32(0))
                        for ci, cv, _ in emits
                    )
                    cnts = cnts + sum(
                        jnp.where(ci[:, None] == arb, ev[:, None], 0)
                        for ci, _, ev in emits
                    )
                return (pos, px, idx, done, err, cols, cnts, cnt, steps + 1)

            def cond(st):
                return (jnp.sum(st[3].astype(i32)) < L) & (
                    st[8] * K < step_cap
                )

            shape1 = (L, mcap if record else 1)
            st = jax.lax.while_loop(
                cond,
                body,
                (
                    e_pos,
                    e_px,
                    e_idx,
                    e_pos >= chunk_end,
                    jnp.zeros(L, bool),
                    jnp.zeros(shape1, u32),
                    jnp.zeros(shape1, i32),
                    jnp.zeros(L, i32),
                    jnp.int32(0),
                ),
            )
            return st

        # ---- speculative sync to a fixed point
        guess = (
            _lane(chunk_start),
            _lane(jnp.full(L, PX0, u32)),
            _lane(jnp.zeros((L, 64), u32)),
        )

        def shift(exits):
            """entries[i] := exits[i-1] within each image."""
            pos, px, idx = exits
            pos2 = pos.reshape(B, F)
            px2 = px.reshape(B, F)
            idx2 = idx.reshape(B, F, 64)
            return (
                jnp.concatenate([img_start[:, None], pos2[:, :-1]], 1).reshape(L),
                jnp.concatenate(
                    [jnp.full((B, 1), PX0, u32), px2[:, :-1]], 1
                ).reshape(L),
                jnp.concatenate(
                    [jnp.zeros((B, 1, 64), u32), idx2[:, :-1]], 1
                ).reshape(L, 64),
            )

        def sync_round(st):
            entries, _chg, rounds = st
            sc = scan_chunks(entries, record=False)
            new_entries = shift((sc[0], sc[1], sc[2]))
            chg = jnp.zeros((), bool)
            for aa, bb in zip(new_entries, entries):
                chg = chg | jnp.any(aa != bb)
            return (new_entries, chg, rounds + 1)

        st = ((guess), jnp.ones((), bool), jnp.int32(0))
        st = jax.lax.while_loop(
            lambda s: s[1] & (s[2] < rounds_cap), sync_round, st
        )
        entries = st[0]

        # ---- record scan from converged entries
        sc = scan_chunks(entries, record=True)
        cols, cnts = sc[5], sc[6]  # [L, mcap]
        scan_ok = jnp.all(sc[3]) & ~jnp.any(sc[4])
        fill_px = sc[1].reshape(B, F)[:, -1]  # decoder px at stream end

        # ---- run expansion: (color, count) pairs -> pixel raster
        cnts_img = cnts.reshape(B, F * mcap)
        cols_img = cols.reshape(B, F * mcap)
        cum = jnp.cumsum(cnts_img, axis=1)  # [B, F*mcap]
        total = cum[:, -1]
        gpix = jnp.arange(npx)

        def expand(cum_b, cols_b, total_b, fill_b):
            op = jnp.searchsorted(cum_b, gpix, side="right")
            c = cols_b[jnp.clip(op, 0, F * mcap - 1)]
            return jnp.where(gpix < total_b, c, fill_b)

        cum, cols_img, total, fill_px = (
            _b(cum), _b(cols_img), _b(total), _b(fill_px)
        )
        packed = jax.vmap(expand)(cum, cols_img, total, fill_px)  # [B, npx] u32
        rgba = jnp.stack(
            [
                (packed >> 24).astype(jnp.uint8),
                ((packed >> 16) & 0xFF).astype(jnp.uint8),
                ((packed >> 8) & 0xFF).astype(jnp.uint8),
                (packed & 0xFF).astype(jnp.uint8),
            ],
            axis=-1,
        ).reshape(B, plan.height, plan.width, 4)
        return _b(rgba), scan_ok

    if _raw:
        return decode
    import jax

    return jax.jit(decode)


class BatchQoiDecoder:
    """Fully on-chip batched QOI decode (bytes -> device RGBA8 [B,H,W,4]).

    Exact-by-construction speculative chunk scan (module docstring); on
    ok=False ``decode_verified`` falls back to the host decoder
    (codecs/qoi/decode.py) per image.
    """

    def __init__(self, *, chunk_bytes: int | None = None,
                 k_ops: int | None = None, mesh=None):
        self.chunk_bytes = chunk_bytes
        self.k_ops = k_ops
        self.mesh = mesh
        self._fns: dict = {}

    def decode(self, datas: list[bytes]):
        import jax

        from ..utils import metrics, trace

        with trace("qoi_onchip.prep"):
            plan = prep_qoi_batch(datas, self.chunk_bytes)
        metrics.count("qoi_onchip.images", len(datas))
        key = (plan.cache_key, int(plan.stream.shape[0]), plan.n_chunks)
        fn = self._fns.get(key)
        if fn is None:
            fn = build_qoi_decode_fn(plan, k_ops=self.k_ops, mesh=self.mesh)
            self._fns[key] = fn
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self.mesh, P())  # stream: every lane gathers
            bsh = NamedSharding(self.mesh, P("batch"))
            return fn(
                jax.device_put(plan.stream, rep),
                jax.device_put(plan.img_byte_start, bsh),
                jax.device_put(plan.img_byte_end, bsh),
                jax.device_put(plan.img_raw_end, bsh),
            )
        return fn(
            jax.device_put(plan.stream),
            jax.device_put(plan.img_byte_start),
            jax.device_put(plan.img_byte_end),
            jax.device_put(plan.img_raw_end),
        )

    def decode_verified(self, datas: list[bytes]) -> np.ndarray:
        """Host numpy output with per-batch host fallback on ok=False."""
        rgba, ok = self.decode(datas)
        if bool(ok):
            return np.asarray(rgba)
        from ..codecs.qoi.decode import decode as host_decode

        return np.stack([host_decode(d).pix for d in datas])


# ---------------------------------------------------------------------------
# On-device QOI ENCODE — the jnp twin of codecs/qoi/encode_vec.py.
#
# Same derivation (see that module's docstring for the proofs): runs are
# shifted compares, INDEX hits reduce to "equals the previous literal in
# my hash bucket" (one stable sort), DIFF/LUMA are elementwise, and the
# byte stream assembles by cumsum offsets + masked drop-mode scatters.
# Reference op semantics: /root/reference/src/qoi/encoder.zig:29-132.
# ---------------------------------------------------------------------------


def _encode_core(px, cap: int):
    """px: [n] uint32 packed 0xRRGGBBAA -> (out [cap+1] uint8, total i32).

    out[:total] are exactly the op-stream bytes the serial encoder emits
    (no header/padding).  The buffer has one slack slot at index `cap`
    used as the drop target for masked scatters.
    """
    import jax
    import jax.numpy as jnp

    i32, u32, u8 = jnp.int32, jnp.uint32, jnp.uint8
    n = px.shape[0]
    prev = jnp.concatenate([jnp.array([0x000000FF], u32), px[:-1]])
    is_run = px == prev
    lit = ~is_run

    r = (px >> 24).astype(i32)
    g = ((px >> 16) & 0xFF).astype(i32)
    b = ((px >> 8) & 0xFF).astype(i32)
    a = (px & 0xFF).astype(i32)
    pr = (prev >> 24).astype(i32)
    pg = ((prev >> 16) & 0xFF).astype(i32)
    pb = ((prev >> 8) & 0xFF).astype(i32)
    pa = (prev & 0xFF).astype(i32)
    h = (r * 3 + g * 5 + b * 7 + a * 11) & 63

    # INDEX hit: previous literal in the same hash bucket equals me
    # (bucket's first literal compares against the zero-initialized
    # table).  Run members sort to a sentinel bucket past every real one.
    key = jnp.where(lit, h, 64)
    order = jnp.argsort(key, stable=True)
    sh = key[order]
    sv = px[order]
    prev_v = jnp.concatenate([jnp.zeros(1, u32), sv[:-1]])
    same_bucket = jnp.concatenate(
        [jnp.zeros(1, bool), sh[1:] == sh[:-1]]
    )
    bucket_prev = jnp.where(same_bucket, prev_v, u32(0))
    hit_sorted = (bucket_prev == sv) & (sh < 64)
    hit = jnp.zeros(n, bool).at[order].set(hit_sorted)

    vr = r - pr
    vg = g - pg
    vb = b - pb
    vg_r = vr - vg
    vg_b = vb - vg
    same_a = a == pa
    can_diff = (
        same_a
        & (-3 < vr) & (vr < 2)
        & (-3 < vg) & (vg < 2)
        & (-3 < vb) & (vb < 2)
    )
    can_luma = (
        same_a
        & (-9 < vg_r) & (vg_r < 8)
        & (-33 < vg) & (vg < 32)
        & (-9 < vg_b) & (vg_b < 8)
    )

    miss = lit & ~hit
    kind = jnp.zeros(n, jnp.int8)
    kind = jnp.where(lit & hit, 1, kind)
    kind = jnp.where(miss & can_diff, 2, kind)
    kind = jnp.where(miss & ~can_diff & can_luma, 3, kind)
    kind = jnp.where(miss & ~can_diff & ~can_luma & same_a, 4, kind)
    kind = jnp.where(miss & ~can_diff & ~can_luma & ~same_a, 5, kind)

    # Run bookkeeping: position within each maximal run segment via a
    # cummax over segment-start indices (encoder.zig's `run` counter).
    iarr = jnp.arange(n, dtype=i32)
    run_start = is_run & jnp.concatenate([jnp.ones(1, bool), ~is_run[:-1]])
    seg_start = jax.lax.cummax(jnp.where(run_start, iarr, i32(-1)))
    pos_in_seg = jnp.where(is_run, iarr - seg_start + 1, 0)
    flush62 = is_run & (pos_in_seg % 62 == 0)  # RUN(62) at 62-boundaries
    prev_runlen = jnp.concatenate([jnp.zeros(1, i32), pos_in_seg[:-1]])
    prev_isrun = jnp.concatenate([jnp.zeros(1, bool), is_run[:-1]])
    run_before = jnp.where(lit & prev_isrun, prev_runlen % 62, 0)
    tail_flush = jnp.where(is_run[-1], pos_in_seg[-1] % 62, 0)

    sizes = jnp.array([0, 1, 1, 2, 4, 5], i32)[kind.astype(i32)]
    sizes = sizes + flush62.astype(i32) + (run_before > 0).astype(i32)
    offs = jnp.cumsum(sizes) - sizes
    total = offs[-1] + sizes[-1]

    out = jnp.zeros(cap + 1, u8)

    def put(buf, idx, val, mask):
        return buf.at[jnp.where(mask, idx, cap)].set(
            val.astype(u8), mode="drop"
        )

    out = put(out, offs, jnp.full(n, 0xC0 | 61, i32), flush62)
    out = put(out, offs, 0xC0 | (run_before - 1), run_before > 0)
    lo = offs + (run_before > 0)  # literal bytes follow the flush byte
    k = kind
    out = put(out, lo, h, k == 1)
    out = put(
        out, lo, 0x40 | ((vr + 2) << 4) | ((vg + 2) << 2) | (vb + 2), k == 2
    )
    out = put(out, lo, 0x80 | (vg + 32), k == 3)
    out = put(out, lo + 1, ((vg_r + 8) << 4) | (vg_b + 8), k == 3)
    out = put(out, lo, jnp.full(n, 0xFE, i32), k == 4)
    is45 = (k == 4) | (k == 5)
    out = put(out, lo + 1, r, is45)
    out = put(out, lo + 2, g, is45)
    out = put(out, lo + 3, b, is45)
    out = put(out, lo, jnp.full(n, 0xFF, i32), k == 5)
    out = put(out, lo + 4, a, k == 5)
    # end-of-stream residual run flush (encoder.zig's i == n-1 emission)
    out = out.at[jnp.where(tail_flush > 0, total, cap)].set(
        (0xC0 | (tail_flush - 1)).astype(u8), mode="drop"
    )
    return out, total + (tail_flush > 0).astype(i32)


_ENC_FNS: dict = {}


def _encode_fn(n: int, batched: bool):
    key = (n, batched)
    fn = _ENC_FNS.get(key)
    if fn is None:
        import jax

        cap = 5 * n + n // 62 + 8
        core = lambda px: _encode_core(px, cap)  # noqa: E731
        fn = jax.jit(jax.vmap(core) if batched else core)
        _ENC_FNS[key] = fn
    return fn


def _pack_px(pixels, desc) -> np.ndarray:
    n = desc.width * desc.height
    pix = np.asarray(pixels, np.uint8).reshape(-1)
    from ..errors import FormatError as FE

    if len(pix) < n * desc.channels:
        raise FE("qoi: pixel buffer too small")
    c = pix[: n * desc.channels].reshape(n, desc.channels).astype(np.uint32)
    a = c[:, 3] if desc.channels == 4 else np.full(n, 255, np.uint32)
    return (c[:, 0] << 24) | (c[:, 1] << 16) | (c[:, 2] << 8) | a


def encode_device(pixels, desc) -> bytes:
    """On-device QOI encode: byte-identical to codecs/qoi/encode.encode().

    The op planning and byte assembly run as one jitted graph on the
    default backend; the host only packs input pixels and prepends the
    header / appends the 8-byte padding.
    """
    import struct

    from ..codecs.qoi.decode import QOI_PIXELS_MAX
    from ..errors import FormatError as FE

    if (
        desc.width == 0
        or desc.height == 0
        or desc.channels not in (3, 4)
        or desc.colorspace > 1
        or desc.height >= QOI_PIXELS_MAX // desc.width
    ):
        raise FE("qoi: bad encode descriptor")
    px = _pack_px(pixels, desc)
    out, total = _encode_fn(px.shape[0], batched=False)(px)
    header = struct.pack(
        ">IIIBB", 0x716F6966, desc.width, desc.height, desc.channels,
        desc.colorspace,
    )
    return header + np.asarray(out)[: int(total)].tobytes() + (
        b"\x00" * 7 + b"\x01"
    )


def encode_device_batch(pixel_batch, descs) -> list[bytes]:
    """Batched on-device encode: one vmapped graph over same-size images.

    pixel_batch: [B, ...] uint8; descs: per-image Desc sharing
    width/height/channels.  Returns the per-image encoded bytes."""
    import struct

    d0 = descs[0]
    if any(
        (d.width, d.height, d.channels) != (d0.width, d0.height, d0.channels)
        for d in descs
    ):
        raise UnsupportedError("qoi: encode batch must share geometry")
    px = np.stack([_pack_px(p, d) for p, d in zip(pixel_batch, descs)])
    outs, totals = _encode_fn(px.shape[1], batched=True)(px)
    outs = np.asarray(outs)
    totals = np.asarray(totals)
    res = []
    for i, d in enumerate(descs):
        header = struct.pack(
            ">IIIBB", 0x716F6966, d.width, d.height, d.channels, d.colorspace
        )
        res.append(
            header + outs[i, : int(totals[i])].tobytes() + b"\x00" * 7 + b"\x01"
        )
    return res
