"""On-chip baseline-JPEG entropy decode: restart-segment lanes on the TPU.

The reference decodes the entropy stream bit-serially on one core
(/root/reference/src/jpeg/decoder.zig:1294-1454, decodeHuffman :909-970).
Here the *chip* does it: every restart segment is an independent SIMD lane
(restart markers reset the DC predictors and byte-align the stream,
decoder.zig:1432-1452), so a batch of images becomes tens of thousands of
lanes advancing together through one `lax.while_loop`.

Per step each lane issues ONE 8-byte window row-gather (the only true
gather — XLA TPU gathers are latency-bound, so everything else is
branch-free vector math) and decodes up to K Huffman symbols from the
64-bit lookahead:

* canonical Huffman decode is unrolled over code lengths 1..16 with the
  per-length min/max/valptr constants baked in at trace time
  (HuffTable semantics, /root/reference/src/jpeg/HuffTable.zig:1-33);
* symbol values come from a one-hot matmul against the joined DHT value
  tables (no gather);
* RECEIVE/EXTEND (T.81 F.2.2.1, decoder.zig:1115-1134) is branch-free;
* coefficients accumulate into a [lanes, blocks_per_segment, 64] int16
  carry via one-hot outer products — the final carry IS the dense
  zig-zag coefficient tensor, no scatter anywhere.

Host work is memcpy-class only: marker walk, FF00 de-stuffing, restart
split (decoder.zig:712-749 semantics), table/offset upload.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..codecs.jpeg.tables import UNZIG, HuffTable
from ..errors import FormatError, UnsupportedError

_EXTEND_BIAS = [0] + [(1 << s) - 1 for s in range(1, 17)]  # x += bias if top bit clear


@dataclass
class _Huff:
    """Canonical table params for the device kernel (trace-time constants)."""

    min_codes: list  # [17] (index by length; [0] unused)
    max_codes: list
    val_base: list  # valptr per length, offset into the joined vals vector
    n_vals: int


@dataclass
class ScanPlan:
    """Host-side prep of a same-geometry baseline JPEG batch."""

    width: int
    height: int
    ncomp: int
    hv: tuple  # ((h,v), ...) per component
    ratio: str
    mxx: int
    myy: int
    bpm: int  # blocks per MCU
    comp_of_slot: tuple  # slot index -> component
    n_mcu: int  # MCUs per image
    seg_mcus: int  # restart interval (MCUs per segment)
    n_segs: int  # segments per image
    quants: list  # [ncomp] np.int32[64] natural order
    huff: list  # 4 _Huff: [dc0, dc1, ac0, ac1] (tc*2+th layout below)
    vals_joined: np.ndarray  # all tables' vals concatenated (int32)
    tid_dc: tuple  # component -> joined-table index for DC
    tid_ac: tuple
    stream: np.ndarray  # uint8, destuffed segments back to back (+pad)
    seg_bit_pos: np.ndarray  # int32 [B*n_segs] absolute bit offsets
    seg_n_mcu: np.ndarray  # int32 [B*n_segs] MCUs in each segment
    batch: int
    cache_key: tuple = None  # (geometry, tables, dri) bucket for jit reuse


def _parse_headers(data: bytes):
    """Minimal marker walk: SOI..SOS for one baseline JPEG.

    Mirrors the reference's marker loop (decoder.zig:220-373) for the
    subset a baseline scan needs; anything else -> UnsupportedError.
    """
    if data[:2] != b"\xff\xd8":
        raise FormatError("jpeg: missing SOI")
    pos = 2
    quants = [None] * 4
    huffs = {}  # (tc, th) -> HuffTable
    sof = None
    dri = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1  # liberal skip (decoder.zig:248-264)
            continue
        marker = data[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        seg_len = (data[pos] << 8) | data[pos + 1]
        body = data[pos + 2 : pos + seg_len]
        if marker == 0xC0 or marker == 0xC1:  # baseline / extended sequential
            prec, h, w, nc = body[0], (body[1] << 8) | body[2], (body[3] << 8) | body[4], body[5]
            if prec != 8:
                raise UnsupportedError("jpeg: only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hvb, tq = body[6 + 3 * i], body[7 + 3 * i], body[8 + 3 * i]
                comps.append((cid, hvb >> 4, hvb & 15, tq))
            sof = (w, h, nc, tuple(comps))
        elif marker == 0xC2:
            raise UnsupportedError("jpeg: progressive not supported on-device")
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 15
                counts = list(body[o + 1 : o + 17])
                total = sum(counts)
                vals = bytes(body[o + 17 : o + 17 + total])
                t = HuffTable()
                t.build(counts, vals)
                huffs[(tc, th)] = t
                o += 17 + total
        elif marker == 0xDB:  # DQT
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 15
                if pq == 0:
                    q = np.array(list(body[o + 1 : o + 65]), np.int32)
                    o += 65
                else:
                    raw = body[o + 1 : o + 129]
                    q = np.array(
                        [(raw[2 * i] << 8) | raw[2 * i + 1] for i in range(64)], np.int32
                    )
                    o += 129
                nat = np.zeros(64, np.int32)
                nat[UNZIG] = q  # store natural-order (decoder.zig:1564-1567)
                quants[tq] = nat
        elif marker == 0xDD:
            dri = (body[0] << 8) | body[1]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            sel = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                sel.append((cs, tt >> 4, tt & 15))
            scan_start = pos + seg_len
            return sof, quants, huffs, dri, tuple(sel), scan_start
        pos += seg_len
    raise FormatError("jpeg: no SOS")


def _destuff(data: bytes, scan_start: int):
    """Scan body -> (destuffed bytes, segment start offsets in destuffed space).

    FF00 de-stuffing per decoder.zig:712-749; RST markers delimit segments
    (byte-aligned restarts, decoder.zig:1432-1452).
    """
    d = np.frombuffer(data, np.uint8)[scan_start:]
    ff = np.flatnonzero(d[:-1] == 0xFF)
    nxt = d[ff + 1]
    stuffed = ff[nxt == 0x00]
    rst = ff[(nxt >= 0xD0) & (nxt <= 0xD7)]
    eoi = ff[nxt == 0xD9]
    end = int(eoi[0]) if len(eoi) else len(d)
    stuffed = stuffed[stuffed < end]
    rst = rst[rst < end]
    other = ff[(nxt != 0x00) & ((nxt < 0xD0) | (nxt > 0xD9)) & (nxt != 0xFF)]
    if len(other) and int(other[0]) < end:
        raise UnsupportedError("jpeg: unexpected marker inside scan data")
    # bytes to drop: each stuffed 00, and both bytes of each RST
    drop = np.concatenate([stuffed + 1, rst, rst + 1])
    drop.sort()
    keep = np.ones(end, bool)
    keep[drop[drop < end]] = False
    out = d[:end][keep]
    # segment starts (in destuffed coords): 0 and after each RST pair
    starts = np.concatenate([[0], rst + 2])
    dropped_before = np.searchsorted(drop, starts)
    return out, (starts - dropped_before).astype(np.int64)


def prep_batch(datas: list[bytes]) -> ScanPlan:
    """Parse/destuff a batch; all images must share geometry AND tables."""
    if not datas:
        raise ValueError("jpeg: empty batch")
    first = None
    streams, seg_pos_all, seg_nmcu_all = [], [], []
    for data in datas:
        sof, quants, huffs, dri, sel, scan_start = _parse_headers(data)
        w, h, nc, comps = sof
        if dri <= 0:
            raise UnsupportedError(
                "jpeg: device entropy decode needs restart markers (DRI)"
            )
        key = (sof, tuple(q.tobytes() if q is not None else None for q in quants),
               tuple(sorted((k, t.num_codes, tuple(t.vals), tuple(t.min_codes),
                             tuple(t.max_codes), tuple(t.vals_indices))
                            for k, t in huffs.items())), dri, tuple(sel))
        if first is None:
            first = (key, sof, quants, huffs, dri, sel)
        elif key != first[0]:
            raise UnsupportedError("jpeg: batch must share geometry and tables")
        stream, seg_starts = _destuff(data, scan_start)
        streams.append(stream)
        seg_pos_all.append(seg_starts)

    _, sof, quants, huffs, dri, sel = first
    w, h, nc, comps = sof
    h0, v0 = comps[0][1], comps[0][2]
    mxx = (w + 8 * h0 - 1) // (8 * h0)
    myy = (h + 8 * v0 - 1) // (8 * v0)
    n_mcu = mxx * myy
    comp_of_slot = []
    for c in range(nc):
        comp_of_slot += [c] * (comps[c][1] * comps[c][2])
    bpm = len(comp_of_slot)
    n_segs = (n_mcu + dri - 1) // dri
    for starts in seg_pos_all:
        if len(starts) != n_segs:
            raise UnsupportedError("jpeg: restart segment count mismatch")

    # Joined value vector + per-table params.  Table ids: comp c uses
    # tid_dc[c] / tid_ac[c] into `huff`/`vals_joined`.
    order = []
    for c, td, ta in sel:
        if (0, td) not in order:
            order.append((0, td))
        if (1, ta) not in order:
            order.append((1, ta))
    huff_params, vals_parts, base = [], [], 0
    tid_of = {}
    for kk in order:
        t = huffs[kk]
        tid_of[kk] = len(huff_params)
        vb = [(t.vals_indices[i - 1] + base if t.vals_indices[i - 1] >= 0 else 0)
              for i in range(1, 17)]
        huff_params.append(
            _Huff(
                min_codes=[0] + [t.min_codes[i] for i in range(16)],
                max_codes=[0] + [t.max_codes[i] for i in range(16)],
                val_base=[0] + vb,
                n_vals=t.num_codes,
            )
        )
        vals_parts.append(np.array(t.vals[: t.num_codes], np.int32))
        base += t.num_codes
    vals_joined = (
        np.concatenate(vals_parts) if vals_parts else np.zeros(1, np.int32)
    )
    sel_by_comp = {i: (td, ta) for i, (_, td, ta) in enumerate(sel)}
    tid_dc = tuple(tid_of[(0, sel_by_comp[c][0])] for c in range(nc))
    tid_ac = tuple(tid_of[(1, sel_by_comp[c][1])] for c in range(nc))

    # Flat stream: segments of all images back to back (8-byte aligned
    # per image for cheap offset math), + 16 pad bytes for window reads.
    offs, total = [], 0
    for s in streams:
        offs.append(total)
        total += (len(s) + 7) // 8 * 8
    # bucket the stream size (power of two) so the jitted kernel re-traces
    # only per (geometry, tables, batch, size-bucket), not per byte count
    cap = 1 << max(12, (total + 16 - 1).bit_length())
    flat = np.zeros(cap, np.uint8)
    for s, o in zip(streams, offs):
        flat[o : o + len(s)] = s
    seg_bit_pos = np.concatenate(
        [(o + p) * 8 for o, p in zip(offs, seg_pos_all)]
    ).astype(np.int64)
    nm = np.full(n_segs, dri, np.int32)
    nm[-1] = n_mcu - dri * (n_segs - 1)
    seg_n_mcu = np.tile(nm, len(datas)).astype(np.int32)

    ratio = "gray"
    if nc == 3:
        hr = comps[0][1] // comps[1][1]
        vr = comps[0][2] // comps[1][2]
        ratio = {0x11: "444", 0x12: "440", 0x21: "422",
                 0x22: "420", 0x41: "411", 0x42: "410"}[(hr << 4) | vr]
    return ScanPlan(
        width=w, height=h, ncomp=nc,
        hv=tuple((c[1], c[2]) for c in comps), ratio=ratio,
        mxx=mxx, myy=myy, bpm=bpm, comp_of_slot=tuple(comp_of_slot),
        n_mcu=n_mcu, seg_mcus=dri, n_segs=n_segs,
        quants=[quants[c[3]] for c in comps],
        huff=huff_params, vals_joined=vals_joined,
        tid_dc=tid_dc, tid_ac=tid_ac,
        stream=flat, seg_bit_pos=seg_bit_pos, seg_n_mcu=seg_n_mcu,
        batch=len(datas), cache_key=(first[0], len(datas)),
    )


# ---------------------------------------------------------------- kernel


def _select_by_index(jnp, idx, values):
    """Per-lane select from a tuple of trace-time constant ints."""
    out = jnp.full(idx.shape, values[0], jnp.int32)
    for j in range(1, len(values)):
        out = jnp.where(idx == j, jnp.int32(values[j]), out)
    return out


def _bits_at(jnp, hi, lo, p, n):
    """Extract bits [p, p+n) (MSB-first) from the 64-bit window (hi, lo).

    p and n are per-lane int32; requires p + n <= 64 and n <= 25.
    Returns uint32 with the n bits right-aligned.
    """
    u32 = jnp.uint32
    # 32-bit word starting at bit p: hi<<p | lo>>(32-p) (p<32), else lo<<(p-32)
    p_lo = (p & 31).astype(u32)  # masked: the a-arm is only selected for p<32
    a = jnp.where(p_lo > 0, (hi << p_lo) | _rshift(jnp, lo, 32 - p), hi)
    b = lo << jnp.where(p >= 32, ((p - 32) & 31).astype(u32), u32(0))
    w = jnp.where(p < 32, a, b)
    return _rshift(jnp, w, 32 - n)


def _rshift(jnp, x, n):
    """x >> n for per-lane n in [0, 32] (XLA shift-by-32 is undefined)."""
    n = jnp.clip(n, 0, 32)
    big = n >= 32
    return jnp.where(big, jnp.uint32(0), x >> jnp.where(big, jnp.uint32(0), n.astype(jnp.uint32)))


def build_decode_fn(plan: ScanPlan, *, k_syms: int = 3, max_steps: int = 16384):
    """Returns a jitted fn: (stream_u8, seg_bit_pos, seg_n_mcu) ->
    (coeffs [L, seg_mcus*bpm, 64] int16 natural-order, ok flag).

    Everything shape- or table-dependent is closed over as trace-time
    constants, so one compilation covers a whole (geometry, tables) bucket.
    """
    import jax
    import jax.numpy as jnp

    bpm = plan.bpm
    nblk = plan.seg_mcus * bpm
    comp_of_slot = plan.comp_of_slot
    tid_of_slot_dc = tuple(plan.tid_dc[c] for c in comp_of_slot)
    tid_of_slot_ac = tuple(plan.tid_ac[c] for c in comp_of_slot)
    ntab = len(plan.huff)
    nvals = int(plan.vals_joined.shape[0])
    vals_const = plan.vals_joined.astype(np.float32)
    # per-(table, length) constants
    minc = [[plan.huff[t].min_codes[ln] for t in range(ntab)] for ln in range(17)]
    maxc = [[plan.huff[t].max_codes[ln] for t in range(ntab)] for ln in range(17)]
    vbase = [[plan.huff[t].val_base[ln] for t in range(ntab)] for ln in range(17)]
    unzig_const = UNZIG  # zigzag k -> natural index

    def decode(stream, seg_bit_pos, seg_n_mcu):
        L = seg_bit_pos.shape[0]
        u32 = jnp.uint32
        # 8-byte windows at every byte offset: [N, 2] uint32 big-endian.
        s = stream.astype(u32)
        n = stream.shape[0] - 8
        b = [s[i : n + i] for i in range(8)]
        win = jnp.stack(
            [
                (b[0] << 24) | (b[1] << 16) | (b[2] << 8) | b[3],
                (b[4] << 24) | (b[5] << 16) | (b[6] << 8) | b[7],
            ],
            axis=-1,
        )
        vals_tab = jnp.asarray(vals_const)  # [nvals] f32
        unzig = jnp.asarray(unzig_const)

        def body(st):
            (bit_pos, dc, accum, slot, mcu_cnt, k, phase, done, err, steps) = st
            byte = jnp.clip(bit_pos >> 3, 0, n - 1)
            w = win[byte]  # [L, 2] row gather — the step's one true gather
            hi, lo = w[:, 0], w[:, 1]
            off0 = (bit_pos & 7).astype(jnp.int32)  # window-local bit cursor
            off = off0

            for _slot in range(k_syms):
                active = (~done) & (off + 27 <= 64)
                look16 = _bits_at(jnp, hi, lo, off, jnp.int32(16)).astype(jnp.int32)
                comp = _select_by_index(jnp, slot % bpm, comp_of_slot)
                tid = jnp.where(
                    phase == 0,
                    _select_by_index(jnp, slot % bpm, tid_of_slot_dc),
                    _select_by_index(jnp, slot % bpm, tid_of_slot_ac),
                )
                # canonical decode, unrolled over lengths 1..16
                ln_sel = jnp.zeros_like(look16)
                vidx = jnp.zeros_like(look16)
                found = jnp.zeros(L, bool)
                for ln in range(1, 17):
                    code = look16 >> (16 - ln)
                    lo_c = _select_by_index(jnp, tid, tuple(minc[ln]))
                    hi_c = _select_by_index(jnp, tid, tuple(maxc[ln]))
                    vb = _select_by_index(jnp, tid, tuple(vbase[ln]))
                    hit = (~found) & (hi_c >= 0) & (code >= lo_c) & (code <= hi_c)
                    ln_sel = jnp.where(hit, ln, ln_sel)
                    vidx = jnp.where(hit, vb + code - lo_c, vidx)
                    found = found | hit
                bad = active & ~found
                # symbol value: one-hot matmul (no gather)
                oh = (vidx[:, None] == jnp.arange(nvals)[None, :]).astype(jnp.float32)
                sym = (oh @ vals_tab).astype(jnp.int32)

                is_dc = phase == 0
                r = jnp.where(is_dc, 0, sym >> 4)
                size = jnp.where(is_dc, sym, sym & 15)
                ext_off = off + ln_sel
                raw = _bits_at(jnp, hi, lo, ext_off, jnp.clip(size, 0, 16)).astype(jnp.int32)
                raw = jnp.where(size > 0, raw, 0)
                bias = _select_by_index(jnp, size, tuple(_EXTEND_BIAS))
                top_clear = raw < (1 << jnp.clip(size - 1, 0, 15))
                ext = jnp.where(size > 0, jnp.where(top_clear, raw - bias, raw), 0)

                consume = ln_sel + size
                # state transitions
                new_k = jnp.where(is_dc, 1, k)
                emit_k = jnp.where(is_dc, 0, jnp.clip(k + r, 0, 63))
                emit_v = jnp.zeros(L, jnp.int32)
                blk_done = jnp.zeros(L, bool)
                # DC: dc[comp] += ext; emit dc at k=0
                dc_cur = _take3(jnp, dc, comp, plan.ncomp)
                dc_new_val = dc_cur + ext
                emit_v = jnp.where(is_dc, dc_new_val, emit_v)
                do_emit = is_dc
                # AC with size>0: emit ext at k+r, k advances
                ac_coef = (~is_dc) & (size > 0)
                emit_v = jnp.where(ac_coef, ext, emit_v)
                do_emit = do_emit | ac_coef
                new_k = jnp.where(ac_coef, jnp.clip(k + r, 0, 63) + 1, new_k)
                # AC size==0: EOB (r<15) or ZRL (r==15)
                eob = (~is_dc) & (size == 0) & (r != 15)
                zrl = (~is_dc) & (size == 0) & (r == 15)
                new_k = jnp.where(zrl, k + 16, new_k)
                blk_done = eob | (new_k > 63)
                blk_done = jnp.where(is_dc, jnp.zeros(L, bool), blk_done)

                app = active & ~bad
                # apply
                dc = jnp.where(
                    (app & is_dc)[:, None],
                    dc + _onehot(jnp, comp, plan.ncomp) * ext[:, None],
                    dc,
                )
                emit = (app & do_emit)[:, None, None]
                oh_blk = _onehot(jnp, jnp.clip(mcu_cnt * bpm + slot, 0, nblk - 1), nblk)
                oh_k = _onehot(jnp, emit_k, 64)
                accum = accum + jnp.where(
                    emit, (oh_blk[:, :, None] * oh_k[:, None, :]) * emit_v[:, None, None], 0
                ).astype(jnp.int32)
                adv_blk = app & blk_done
                slot = jnp.where(adv_blk, slot + 1, slot)
                wrap = adv_blk & (slot >= bpm)
                slot = jnp.where(wrap, 0, slot)
                mcu_cnt = jnp.where(wrap, mcu_cnt + 1, mcu_cnt)
                k = jnp.where(adv_blk, 0, jnp.where(app, new_k, k))
                phase = jnp.where(adv_blk, 0, jnp.where(app & is_dc, 1, phase))
                off = jnp.where(app, off + consume, off)
                seg_done = mcu_cnt >= seg_n_mcu
                err = err | (bad & active)
                done = done | seg_done | bad
            bit_pos = bit_pos - off0 + off  # done lanes consumed nothing
            return (bit_pos, dc, accum, slot, mcu_cnt, k, phase, done, err, steps + 1)

        def cond(st):
            done, steps = st[7], st[9]
            return (~jnp.all(done)) & (steps < max_steps)

        st0 = (
            seg_bit_pos.astype(jnp.int32),
            jnp.zeros((L, plan.ncomp), jnp.int32),
            jnp.zeros((L, nblk, 64), jnp.int32),
            jnp.zeros(L, jnp.int32),  # slot
            jnp.zeros(L, jnp.int32),  # mcu_cnt
            jnp.zeros(L, jnp.int32),  # k
            jnp.zeros(L, jnp.int32),  # phase
            jnp.zeros(L, bool),  # done
            jnp.zeros(L, bool),  # err
            jnp.int32(0),
        )
        st = jax.lax.while_loop(cond, body, st0)
        accum = st[2]
        ok = jnp.all(st[7]) & ~jnp.any(st[8])
        # zigzag -> natural order (static permutation on the last axis)
        inv = np.zeros(64, np.int64)
        inv[unzig_const] = np.arange(64)
        coeffs = jnp.take(accum, jnp.asarray(inv), axis=-1)
        return coeffs.astype(jnp.int16), ok

    return jax.jit(decode)


def _onehot(jnp, idx, n):
    return (idx[:, None] == jnp.arange(n)[None, :]).astype(jnp.int32)


def _take3(jnp, arr, idx, n):
    """arr [L, n] select column per lane (n tiny, unrolled)."""
    out = arr[:, 0]
    for j in range(1, n):
        out = jnp.where(idx == j, arr[:, j], out)
    return out


# ------------------------------------------------------------- assembly


class DeviceJpegDecoder:
    """Full on-chip baseline JPEG decode: bytes -> device RGB8 [B, H, W, 3].

    Host work is marker walk + de-stuff + upload (~memcpy speed); entropy
    decode, dequant, IDCT, chroma upsample and color conversion all run on
    the chip.  Requires restart markers (DRI > 0) — they are the natural
    parallel boundary (decoder.zig:1432-1452) — and shared geometry +
    Huffman/quant tables across the batch (one compiled program per
    (geometry, tables, batch, size-bucket)).

    Output is sample-exact with the host decoder (same Wang IDCT, same
    branchless YCbCr clamp semantics as color.zig:95-113).
    """

    def __init__(self, *, k_syms: int = 3, max_steps: int = 16384):
        self.k_syms = k_syms
        self.max_steps = max_steps
        self._decode_fns: dict = {}
        self._backend_fns: dict = {}

    def decode_coefficients(self, plan: ScanPlan):
        """Run the entropy kernel: -> (coeffs [L, nblk, 64] int16, ok)."""
        import jax

        key = (plan.cache_key, int(plan.stream.shape[0]))
        fn = self._decode_fns.get(key)
        if fn is None:
            fn = build_decode_fn(plan, k_syms=self.k_syms, max_steps=self.max_steps)
            self._decode_fns[key] = fn
        return fn(
            jax.device_put(plan.stream),
            jax.device_put(plan.seg_bit_pos),
            jax.device_put(plan.seg_n_mcu),
        )

    def _backend(self, plan: ScanPlan):
        import jax
        import jax.numpy as jnp

        key = plan.cache_key
        fn = self._backend_fns.get(key)
        if fn is None:
            from .batch import _gray_graph, _ycbcr_graph

            quants = [
                jnp.asarray(np.stack([plan.quants[c]] * plan.batch))
                for c in range(plan.ncomp)
            ]

            @jax.jit
            def run(coeffs):
                g = coefficients_to_grids(plan, coeffs)
                if plan.ncomp == 1:
                    return _gray_graph(
                        g[0].astype(jnp.int32), quants[0],
                        height=plan.height, width=plan.width,
                    )
                return _ycbcr_graph(
                    g[0].astype(jnp.int32), g[1].astype(jnp.int32),
                    g[2].astype(jnp.int32), *quants,
                    height=plan.height, width=plan.width, ratio=plan.ratio,
                )

            fn = run
            self._backend_fns[key] = fn
        return fn

    def decode(self, datas: list[bytes]):
        """bytes -> (rgb_or_gray device array, ok device scalar).

        ``ok`` is left on device so callers can pipeline; materialize it
        (bool(ok)) to validate the batch decoded cleanly.
        """
        plan = prep_batch(datas)
        coeffs, ok = self.decode_coefficients(plan)
        return self._backend(plan)(coeffs), ok


def coefficients_to_grids(plan: ScanPlan, coeffs):
    """[B*n_segs, seg_mcus*bpm, 64] -> per-component [B, bv, bh, 64].

    Pure reshape/transpose: lanes are MCU-raster order and slots follow
    the T.81 interleave (left-to-right, top-to-bottom within the MCU), so
    no gathers are needed for h,v in {1,2} x {1,2}.
    """
    import jax.numpy as jnp

    B, mxx, myy = plan.batch, plan.mxx, plan.myy
    x = coeffs.reshape(B, plan.n_segs * plan.seg_mcus, plan.bpm, 64)
    x = x[:, : plan.n_mcu]  # drop tail padding of the last segment
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
