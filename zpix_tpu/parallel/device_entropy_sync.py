"""On-chip baseline-JPEG entropy decode WITHOUT restart markers.

The restart-free scan is one serial bit chain (the reference decodes it
byte-serially, /root/reference/src/jpeg/decoder.zig:1294-1454; restart
markers are the only state reset, :1432-1452).  To run it on SIMD lanes
the stream is chopped into fixed CHUNK_BYTES chunks and decoded
speculatively, exploiting Huffman self-synchronization (the approach of
"Accelerating JPEG Decompression on GPUs", arXiv:2111.09219, mapped onto
XLA lanes):

1. **Speculative sync.**  Every chunk lane decodes symbol LENGTHS from
   its chunk start, guessing entry state (bit-aligned, slot 0, DC).
   Only each image's first lane is surely right.  The exit state
   (bit, slot-in-MCU, k, phase at the first symbol boundary past the
   chunk) is recorded.
2. **Fixed-point propagation.**  entries[i] := exits[i-1]; rescan; repeat
   until no entry changes.  A wrong entry self-synchronizes with the true
   decode within a few symbols, so exits stabilize after ~2-3 rounds
   (worst case F rounds == serial decode, still exact).
3. **Index scan.**  From converged entries, each chunk lane records the
   bit position where every block ENDING in its chunk finishes, plus the
   block count (one-hot over a per-chunk capacity; no scatter).
4. **Assembly.**  Per-chunk end lists concatenate in lane order into the
   global raster-order block-end array via one searchsorted + row gather.
5. **Value pass + DC fix.**  Identical machinery to the restart path
   (device_entropy.build_decode_fn pass 2): one lane per block, then a
   whole-image segmented cumsum restores DC predictors
   (decoder.zig:1366-1376).

Verification is exact, not probabilistic: ok requires every value-pass
lane to land exactly on the index pass's block ends, the total block
count to match the frame geometry, and the final bit position to reach
the end of the entropy data.  A mis-synchronization that survives all of
that cannot exist; on ok=False callers fall back to the host decoder.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..errors import UnsupportedError
from .device_entropy import (
    CmpTables,
    _bits_at,
    _destuff,
    _make_sym_decoder,
    _parse_headers,
    _restore_dc_and_reorder,
    _select_by_index,
    _value_pass,
)


@dataclass
class SyncPlan:
    """Host-side prep of a same-geometry restart-free baseline batch."""

    width: int
    height: int
    ncomp: int
    hv: tuple
    ratio: str
    mxx: int
    myy: int
    bpm: int
    comp_of_slot: tuple
    n_mcu: int
    quants: list
    color: str
    cmp: CmpTables
    tid_dc: tuple
    tid_ac: tuple
    stream: np.ndarray  # destuffed scans back to back (+pad)
    img_bit_start: np.ndarray  # int64 [B]
    img_bit_end: np.ndarray  # int64 [B]
    chunk_bytes: int
    n_chunks: int  # per image (padded to the longest scan)
    mb: int  # block-end capacity per chunk
    batch: int
    cache_key: tuple = None


def prep_batch_sync(datas: list[bytes], chunk_bytes: int = 32,
                    cap_hint: int | None = None) -> SyncPlan:
    """Parse/destuff a batch of restart-free baseline JPEGs.

    cap_hint: minimum stream-buffer capacity, so distinct-content
    batches straddling a pow2 boundary share one buffer layout (and one
    compiled program) — see device_entropy.prep_batch."""
    if not datas:
        raise ValueError("jpeg: empty batch")
    first = None
    streams = []
    for data in datas:
        sof, quants, huffs, dri, sel, scan_start, color = _parse_headers(data)
        key = (sof, tuple(q.tobytes() if q is not None else None for q in quants),
               tuple(sorted((k, t.num_codes, tuple(t.vals), tuple(t.min_codes),
                             tuple(t.max_codes), tuple(t.vals_indices))
                            for k, t in huffs.items())), tuple(sel), color)
        if dri > 0:
            raise UnsupportedError(
                "jpeg: stream has restart markers; use DeviceJpegDecoder "
                "(restart segments are cheaper parallel boundaries)"
            )
        if first is None:
            first = (key, sof, quants, huffs, sel, color)
        elif key != first[0]:
            raise UnsupportedError("jpeg: batch must share geometry and tables")
        stream, _ = _destuff(data, scan_start)
        streams.append(stream)

    _, sof, quants, huffs, sel, color = first
    w, h, nc, comps = sof
    h0, v0 = comps[0][1], comps[0][2]
    mxx = (w + 8 * h0 - 1) // (8 * h0)
    myy = (h + 8 * v0 - 1) // (8 * v0)
    comp_of_slot = []
    for c in range(nc):
        comp_of_slot += [c] * (comps[c][1] * comps[c][2])
    bpm = len(comp_of_slot)

    order = []
    for c, td, ta in sel:
        if (0, td) not in order:
            order.append((0, td))
        if (1, ta) not in order:
            order.append((1, ta))
    tid_of = {kk: i for i, kk in enumerate(order)}
    cmp = CmpTables([huffs[kk] for kk in order])
    sel_by_comp = {i: (td, ta) for i, (_, td, ta) in enumerate(sel)}
    tid_dc = tuple(tid_of[(0, sel_by_comp[c][0])] for c in range(nc))
    tid_ac = tuple(tid_of[(1, sel_by_comp[c][1])] for c in range(nc))

    offs, total = [], 0
    for s in streams:
        offs.append(total)
        total += (len(s) + 7) // 8 * 8
    cap = 1 << max(12, (max(total + 16, cap_hint or 0) - 1).bit_length())
    flat = np.zeros(cap, np.uint8)
    for s, o in zip(streams, offs):
        flat[o : o + len(s)] = s
    img_bit_start = np.array([o * 8 for o in offs], np.int64)
    img_bit_end = np.array(
        [(o + len(s)) * 8 for o, s in zip(offs, streams)], np.int64
    )
    n_chunks = (max(len(s) for s in streams) + chunk_bytes - 1) // chunk_bytes
    # Bucket the chunk count (extra chunks start past img_bit_end and
    # stay inactive): distinct-content batches then share compiled
    # programs instead of recompiling per scan length.
    n_chunks = (n_chunks + 31) // 32 * 32

    ratio = "gray"
    if nc >= 3:
        hr = comps[0][1] // comps[1][1]
        vr = comps[0][2] // comps[1][2]
        ratio = {0x11: "444", 0x12: "440", 0x21: "422",
                 0x22: "420", 0x41: "411", 0x42: "410"}[(hr << 4) | vr]
    return SyncPlan(
        width=w, height=h, ncomp=nc,
        hv=tuple((c[1], c[2]) for c in comps), ratio=ratio,
        mxx=mxx, myy=myy, bpm=bpm, comp_of_slot=tuple(comp_of_slot),
        n_mcu=mxx * myy, quants=[quants[c[3]] for c in comps],
        color=color,
        cmp=cmp, tid_dc=tid_dc, tid_ac=tid_ac,
        stream=flat, img_bit_start=img_bit_start, img_bit_end=img_bit_end,
        chunk_bytes=chunk_bytes, n_chunks=n_chunks,
        # worst-case block = DC code + EOB code = 2 bits, so a chunk of
        # 8*chunk_bytes bits can complete at most 4*chunk_bytes blocks
        mb=4 * chunk_bytes,
        batch=len(datas), cache_key=(first[0], len(datas), chunk_bytes),
    )


def build_sync_decode_fn(
    plan: SyncPlan, *, k_syms: int | None = None, max_rounds: int | None = None,
    win_words: int | None = None, k1_syms: int | None = None,
    _raw: bool = False, _stage: int = 4,
):
    """Returns a jitted fn: (stream, img_bit_start, img_bit_end) ->
    (coeffs [B, n_mcu*bpm, 64] int16 natural-order, ok flag).

    _stage truncations for profiling: 1 = sync rounds only (returns the
    converged entry bits + round count), 2 = + record scan, 3 = +
    assembly, 4 = full (+ value pass and DC restore)."""
    import jax
    import jax.numpy as jnp

    B = plan.batch
    F = plan.n_chunks
    L = B * F
    C_BITS = plan.chunk_bytes * 8
    mb = plan.mb
    bpm = plan.bpm
    n_mcu = plan.n_mcu
    nblk_img = n_mcu * bpm
    comp_of_slot = plan.comp_of_slot
    tid_of_slot_dc = tuple(plan.tid_dc[c] for c in comp_of_slot)
    tid_of_slot_ac = tuple(plan.tid_ac[c] for c in comp_of_slot)
    from .device_entropy import _DEF_K, _DEF_K1, _DEF_W

    cmp = plan.cmp
    k_syms = k_syms if k_syms is not None else _DEF_K
    W = win_words if win_words is not None else _DEF_W
    off_lim = 32 * W - 48
    rounds_cap = max_rounds if max_rounds is not None else F + 2
    k1 = k1_syms if k1_syms is not None else _DEF_K1
    # a chunk spans < C_BITS + 27 overhang bits; every inner step consumes
    # >= 1 symbol >= 2 bits, and >= min(2*k1, window capacity) bits when
    # the window stays full
    inner_cap = C_BITS // 8 + 64

    def decode(stream, img_bit_start, img_bit_end):
        u32 = jnp.uint32
        s = stream.astype(u32)
        n = stream.shape[0] - 4 * W
        b = [s[i : n + i] for i in range(4 * W)]
        win = jnp.stack(
            [
                (b[4 * j] << 24) | (b[4 * j + 1] << 16) | (b[4 * j + 2] << 8) | b[4 * j + 3]
                for j in range(W)
            ],
            axis=-1,
        )
        decode_sym = _make_sym_decoder(jnp, cmp)

        img_start = img_bit_start.astype(jnp.int32)  # [B]
        img_end = img_bit_end.astype(jnp.int32)  # [B]
        lane_img = jnp.repeat(jnp.arange(B), F)  # [L]
        lane_chunk = jnp.tile(jnp.arange(F), B)  # [L]
        chunk_start = img_start[lane_img] + lane_chunk * C_BITS
        chunk_end = jnp.minimum(chunk_start + C_BITS, img_end[lane_img])
        chunk_start = jnp.minimum(chunk_start, img_end[lane_img])

        def scan_chunks(entries, record, chunk_end_l=None):
            """Decode every chunk from its entry to the first symbol
            boundary past its end.  record=False: sync scan (exit states
            only).  record=True: index scan (block ends + counts too).
            chunk_end_l overrides the per-lane end bits (the variant
            pre-scan runs V slot guesses per chunk: V*L lanes)."""
            e_bit, e_slot, e_k, e_phase = entries
            ce = chunk_end if chunk_end_l is None else chunk_end_l
            Ll = e_bit.shape[0]

            def body(st):
                (bit_pos, slot, k, phase, done, err_bit, ends, cnt, steps) = st
                byte = jnp.clip(bit_pos >> 3, 0, n - 1)
                wW = win[byte]
                w = tuple(wW[:, i] for i in range(W))
                off0 = (bit_pos & 7).astype(jnp.int32)
                off = off0
                base = (byte << 3).astype(jnp.int32)
                emits = []  # per-symbol [L] (slot index, end) pairs

                for _ in range(k1):
                    active = (~done) & (off <= off_lim)
                    look16 = _bits_at(jnp, w, off, jnp.int32(16)).astype(jnp.int32)
                    is_dc = phase == 0
                    tid = jnp.where(
                        is_dc,
                        _select_by_index(jnp, slot, tid_of_slot_dc),
                        _select_by_index(jnp, slot, tid_of_slot_ac),
                    )
                    mt = [tid == t for t in range(cmp.ntab)]
                    ln_sel, sym, bad = decode_sym(look16, mt)
                    bad = active & bad
                    r = jnp.where(is_dc, 0, sym >> 4)
                    size = jnp.where(is_dc, sym, sym & 15)
                    consume = ln_sel + size

                    new_k = jnp.where(is_dc, 1, k)
                    ac_coef = (~is_dc) & (size > 0)
                    new_k = jnp.where(ac_coef, jnp.clip(k + r, 0, 63) + 1, new_k)
                    eob = (~is_dc) & (size == 0) & (r != 15)
                    zrl = (~is_dc) & (size == 0) & (r == 15)
                    new_k = jnp.where(zrl, k + 16, new_k)
                    blk_done = (eob | (new_k > 63)) & ~is_dc

                    app = active & ~bad
                    adv_blk = app & blk_done
                    end_abs = base + off + consume
                    if record:
                        over = cnt >= mb
                        # [L]-wide scalars only; the [L, mb] one-hot
                        # materializes once per step below
                        emits.append((
                            jnp.clip(cnt, 0, mb - 1),
                            jnp.where(adv_blk & ~over, end_abs, 0),
                        ))
                        err_bit = jnp.where(
                            adv_blk & over,
                            jnp.minimum(err_bit, base + off),
                            err_bit,
                        )
                    cnt = jnp.where(adv_blk, cnt + 1, cnt)
                    slot = jnp.where(adv_blk, slot + 1, slot)
                    wrap = adv_blk & (slot >= bpm)
                    slot = jnp.where(wrap, 0, slot)
                    k = jnp.where(adv_blk, 0, jnp.where(app, new_k, k))
                    phase = jnp.where(
                        adv_blk, 0, jnp.where(app & is_dc, 1, phase)
                    )
                    off = jnp.where(app, off + consume, off)
                    err_bit = jnp.where(
                        bad, jnp.minimum(err_bit, base + off), err_bit
                    )
                    # stop at the first symbol boundary past the chunk end
                    done = done | (base + off >= ce) | bad
                if record:
                    arb = jnp.arange(mb)[None, :]
                    ends = ends + sum(
                        jnp.where(ci[:, None] == arb, ev[:, None], 0)
                        for ci, ev in emits
                    )
                bit_pos = bit_pos - off0 + off
                return (bit_pos, slot, k, phase, done, err_bit, ends, cnt, steps + 1)

            def cond(st):
                n_done = jnp.sum(st[4].astype(jnp.int32))
                return (n_done < Ll) & (st[8] < inner_cap)

            ends0 = jnp.zeros((Ll, mb if record else 1), jnp.int32)
            st = jax.lax.while_loop(
                cond,
                body,
                (
                    e_bit,
                    e_slot,
                    e_k,
                    e_phase,
                    e_bit >= ce,  # empty chunk: exit == entry
                    jnp.full(Ll, 2**30, jnp.int32),  # err_bit sentinel
                    ends0,
                    jnp.zeros(Ll, jnp.int32),
                    jnp.int32(0),
                ),
            )
            return st  # (bit, slot, k, phase, done, err_bit, ends, cnt, steps)

        # ---- phase 1+2: speculative sync to a fixed point
        guess = (
            chunk_start,
            jnp.zeros(L, jnp.int32),
            jnp.zeros(L, jnp.int32),
            jnp.zeros(L, jnp.int32),
        )

        def shift(exits):  # noqa: E306  (defined below, used by seeding)
            """entries[i] := exits[i-1] within each image; first chunk's
            entry is the true scan start."""
            out = []
            for j, x in enumerate(exits):
                x2 = x.reshape(B, F)
                first = (
                    img_start[:, None]
                    if j == 0
                    else jnp.zeros((B, 1), jnp.int32)
                )
                out.append(
                    jnp.concatenate([first, x2[:, :-1]], axis=1).reshape(L)
                )
            return tuple(out)

        def sync_round(st):
            entries, _changed, rounds = st
            sc = scan_chunks(entries, record=False)
            exits = (sc[0], sc[1], sc[2], sc[3])
            new_entries = shift(exits)
            changed = jnp.zeros((), bool)
            for a, bb in zip(new_entries, entries):
                changed = changed | jnp.any(a != bb)
            return (new_entries, changed, rounds + 1)

        # ---- slot-variant funnel seeding.  A single slot-0 guess cannot
        # self-synchronize: the component-interleave phase (which Huffman
        # table comes next) only corrects via propagation, and the fixed
        # point measured 360 rounds at bpm=6 — serial (tools/
        # profile_sync.py, 2026-08-21).  Scanning every chunk from ALL
        # bpm slot guesses restores classic Huffman self-sync: the
        # variant whose slot phase matches the truth merges with the true
        # trajectory within the chunk, so its exit is exact.  The modal
        # exit across variants (the "funnel" value) seeds the entries;
        # the EXACT fixed point below then converges in a few rounds and
        # still guarantees bit-exactness (a bad seed only costs rounds).
        if bpm > 1:
            V = bpm
            entries_v = (
                jnp.tile(chunk_start, V),
                jnp.repeat(jnp.arange(V, dtype=jnp.int32), L),
                jnp.zeros(V * L, jnp.int32),
                jnp.zeros(V * L, jnp.int32),
            )
            sv = scan_chunks(
                entries_v, record=False, chunk_end_l=jnp.tile(chunk_end, V)
            )
            ex_v = tuple(
                x.reshape(V, L) for x in (sv[0], sv[1], sv[2], sv[3])
            )
            counts = []
            for v in range(V):
                cv = jnp.zeros(L, jnp.int32)
                for u in range(V):
                    same = jnp.ones(L, bool)
                    for f in range(4):
                        same = same & (ex_v[f][v] == ex_v[f][u])
                    cv = cv + same.astype(jnp.int32)
                counts.append(cv)
            best_v = jnp.argmax(jnp.stack(counts), axis=0)  # [L]
            modal = []
            for f in range(4):
                m = ex_v[f][0]
                for v in range(1, V):
                    m = jnp.where(best_v == v, ex_v[f][v], m)
                modal.append(m)
            guess = shift(tuple(modal))

        st = (guess, jnp.ones((), bool), jnp.int32(0))
        st = jax.lax.while_loop(
            lambda s: s[1] & (s[2] < rounds_cap), sync_round, st
        )
        entries, _, _rounds = st
        if _stage == 1:  # profiling: speculative sync only
            return entries[0], _rounds

        # ---- phase 3: index scan from converged entries
        sc = scan_chunks(entries, record=True)
        ends_chunk, cnt = sc[6], sc[7]  # [L, mb], [L]
        err_bit_scan = sc[5]  # [L] first decode-error position (2^30 = none)
        scan_done = sc[4]

        # The decode continues past the image's last real block into the
        # encoder's 1-bit padding, which may parse as spurious symbols,
        # spurious blocks, or invalid codes.  Verification therefore:
        # every image must yield AT LEAST its geometric block count, the
        # final real block must end within the last byte of the entropy
        # data, and any decode error must lie at/after that end (i.e., in
        # the padding).  Real blocks are checked exactly by the value pass.
        if _stage == 2:  # profiling: + record scan
            return ends_chunk, cnt
        cnt_img = cnt.reshape(B, F)
        total_ok = jnp.all(jnp.sum(cnt_img, axis=1) >= nblk_img)

        # ---- phase 4: assemble global block ends, raster order
        base = jnp.cumsum(cnt_img, axis=1) - cnt_img  # exclusive [B, F]
        # ends_global[b, g] = ends_chunk[chunk i with base<=g<base+cnt][g-base]
        g = jnp.arange(nblk_img)

        def per_image(base_b, ends_b):
            i_of_g = (
                jnp.searchsorted(base_b, g, side="right") - 1
            ).astype(jnp.int32)
            i_of_g = jnp.clip(i_of_g, 0, F - 1)
            j_of_g = g - base_b[i_of_g]
            rows = jnp.clip(i_of_g * mb + j_of_g, 0, F * mb - 1)
            return ends_b.reshape(F * mb)[rows]

        ends_global = jax.vmap(per_image)(base, ends_chunk.reshape(B, F, mb))
        starts_global = jnp.concatenate(
            [img_start[:, None], ends_global[:, :-1]], axis=1
        )
        last_end = ends_global[:, -1]  # end of each image's final real block
        end_ok = jnp.all((last_end <= img_end) & (last_end >= img_end - 7))
        err_ok = jnp.all(err_bit_scan >= last_end[lane_img])
        if _stage == 3:  # profiling: + assembly
            return ends_global, end_ok & err_ok & total_ok

        # ---- phase 5: value pass (one lane per block) + DC fix
        L2 = B * nblk_img
        starts = starts_global.reshape(L2)
        lane2 = jnp.arange(L2)
        slot2 = (lane2 % bpm).astype(jnp.int32)
        tid_dc2 = _select_by_index(jnp, slot2, tid_of_slot_dc)
        tid_ac2 = _select_by_index(jnp, slot2, tid_of_slot_ac)

        st2 = _value_pass(
            jax, jnp, win=win, cmp=cmp, n=n, starts=starts,
            done0=jnp.zeros(L2, bool), tid_dc2=tid_dc2, tid_ac2=tid_ac2,
            k_syms=k_syms,
            dc_set=set(tid_of_slot_dc), ac_set=set(tid_of_slot_ac),
        )
        curT = st2[1]  # [64, L2]
        agree = st2[0] == ends_global.reshape(L2)
        ok = (
            jnp.all(scan_done)
            & err_ok
            & total_ok
            & end_ok
            & jnp.all(st2[3])
            & ~jnp.any(st2[4])
            & jnp.all(agree)
        )

        coeffs = _restore_dc_and_reorder(
            jnp, curT.T, groups=B, n_mcu_grp=n_mcu, bpm=bpm,
            hv=plan.hv, ncomp=plan.ncomp,
        )
        return coeffs, ok

    if _raw:
        return decode
    return jax.jit(decode)


class SyncJpegDecoder:
    """Fully on-chip decode of restart-free baseline JPEGs.

    Speculative chunk synchronization (see module docstring) with exact
    verification; use DeviceJpegDecoder when the stream has restart
    markers (cheaper — no sync rounds needed).
    """

    def __init__(self, *, chunk_bytes: int = 32, k_syms: int | None = None,
                 win_words: int | None = None, k1_syms: int | None = None):
        self.chunk_bytes = chunk_bytes
        self.k_syms = k_syms
        self.win_words = win_words
        self.k1_syms = k1_syms
        self._fns: dict = {}

    def decode_coefficients(self, plan: SyncPlan):
        import jax

        key = (plan.cache_key, int(plan.stream.shape[0]), plan.n_chunks)
        fn = self._fns.get(key)
        if fn is None:
            fn = build_sync_decode_fn(plan, k_syms=self.k_syms,
                                      win_words=self.win_words,
                                      k1_syms=self.k1_syms)
            self._fns[key] = fn
        return fn(
            jax.device_put(plan.stream),
            jax.device_put(plan.img_bit_start),
            jax.device_put(plan.img_bit_end),
        )

    def decode(self, datas: list[bytes]):
        """bytes -> (device rgb/gray array, ok device scalar).

        One compiled program covers sync rounds, index scan, value pass,
        and the dense IDCT/color back-end.
        """
        import jax
        import jax.numpy as jnp

        from ..utils import metrics, trace

        with trace("jpeg_sync.prep"):
            plan = prep_batch_sync(datas, self.chunk_bytes)
        metrics.count("jpeg_sync.images", len(datas))
        key = ("fused", plan.cache_key, int(plan.stream.shape[0]),
               plan.n_chunks)
        fn = self._fns.get(key)
        if fn is None:
            body = build_sync_decode_fn(plan, k_syms=self.k_syms,
                                        win_words=self.win_words,
                                        k1_syms=self.k1_syms, _raw=True)
            quants = [
                np.stack([plan.quants[c]] * plan.batch)
                for c in range(plan.ncomp)
            ]

            def fused(stream, s0, s1):
                from .device_entropy import _grids_graph

                coeffs, ok = body(stream, s0, s1)
                rgb = _grids_graph(
                    plan, _grids(plan, coeffs),
                    [jnp.asarray(q) for q in quants],
                )
                return rgb, ok

            fn = jax.jit(fused)
            self._fns[key] = fn
        return fn(
            jax.device_put(plan.stream),
            jax.device_put(plan.img_bit_start),
            jax.device_put(plan.img_bit_end),
        )


def _grids(plan: SyncPlan, coeffs):
    """[B, n_mcu*bpm, 64] -> per-component [B, bv, bh, 64]."""
    import jax.numpy as jnp

    B, mxx, myy = plan.batch, plan.mxx, plan.myy
    x = coeffs.reshape(B, plan.n_mcu, plan.bpm, 64)
    out = []
    slot0 = 0
    for c in range(plan.ncomp):
        hc, vc = plan.hv[c]
        nb = hc * vc
        xc = x[:, :, slot0 : slot0 + nb, :]
        xc = xc.reshape(B, myy, mxx, vc, hc, 64)
        xc = jnp.transpose(xc, (0, 1, 3, 2, 4, 5)).reshape(
            B, myy * vc, mxx * hc, 64
        )
        out.append(xc)
        slot0 += nb
    return out
