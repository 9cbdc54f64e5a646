"""On-chip baseline-JPEG entropy decode: restart-segment lanes on the TPU.

The reference decodes the entropy stream bit-serially on one core
(/root/reference/src/jpeg/decoder.zig:1294-1454, decodeHuffman :909-970).
Here the *chip* does it: every restart segment is an independent SIMD lane
(restart markers reset the DC predictors and byte-align the stream,
decoder.zig:1432-1452), so a batch of images becomes tens of thousands of
lanes advancing together through one `lax.while_loop`.

The decode is two passes, both scatter-free (see build_decode_fn): an
index pass over segment lanes finds every 8x8 block's bit offset by
decoding only symbol lengths, then a value pass runs one lane per BLOCK
so each lane writes its own [64] coefficient row positionally.  Per step
each lane issues one 16-byte window row-gather plus one LUT gather per
decoded symbol; everything else is branch-free vector math:

* Huffman decode is a single gather into a 16-bit full-lookahead LUT
  (entry = value<<5 | code_length, 64K entries per DHT table, built on
  host from the canonical tables — HuffTable semantics,
  /root/reference/src/jpeg/HuffTable.zig:1-33 — and baked into the
  compiled program as a constant);
* RECEIVE/EXTEND (T.81 F.2.2.1, decoder.zig:1115-1134) is branch-free;
* DC predictors (decoder.zig:1366-1376) are restored after the value
  pass by a segmented cumsum of per-block diffs.

Host work is memcpy-class only: marker walk, FF00 de-stuffing, restart
split (decoder.zig:712-749 semantics), stream/offset upload.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..codecs.jpeg.tables import UNZIG, HuffTable
from ..errors import FormatError, UnsupportedError

def _lut16(t: HuffTable) -> np.ndarray:
    """Full 16-bit-lookahead decode LUT: entry = (value << 5) | code_length.

    Entry 0 means "invalid code" (valid entries have length >= 1).  Built
    from the canonical min/max/valptr tables
    (/root/reference/src/jpeg/HuffTable.zig:1-33).
    """
    lut = np.zeros(1 << 16, np.int32)
    for ln in range(1, 17):
        mn, mx, vi = t.min_codes[ln - 1], t.max_codes[ln - 1], t.vals_indices[ln - 1]
        if mx < 0:
            continue
        sh = 16 - ln
        vals = np.array(t.vals[vi : vi + (mx - mn + 1)], np.int32)
        lut[mn << sh : (mx + 1) << sh] = np.repeat((vals << 5) | ln, 1 << sh)
    return lut


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
    lut16: np.ndarray  # [ntab, 65536] int32 decode LUTs (trace-time const)
    tid_dc: tuple  # component -> lut16 row for DC
    tid_ac: tuple
    stream: np.ndarray  # uint8, destuffed segments back to back (+pad)
    seg_bit_pos: np.ndarray  # int32 [B*n_segs] absolute bit offsets
    seg_n_mcu: np.ndarray  # int32 [B*n_segs] MCUs in each segment
    max_seg_bits: int  # longest restart segment (bounds pass-1 steps)
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
    jfif = False
    adobe_transform = None
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
        if marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedError("jpeg: only baseline/extended-sequential DCT")
        if marker == 0xC0 or marker == 0xC1:  # baseline / extended sequential
            prec, h, w, nc = body[0], (body[1] << 8) | body[2], (body[3] << 8) | body[4], body[5]
            if prec != 8:
                raise UnsupportedError("jpeg: only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hvb, tq = body[6 + 3 * i], body[7 + 3 * i], body[8 + 3 * i]
                comps.append((cid, hvb >> 4, hvb & 15, tq))
            if nc == 1:
                # grayscale ignores declared sampling factors
                # (decoder.zig:546-561 normalizes (h,v) to (1,1))
                cid, _, _, tq = comps[0]
                comps = [(cid, 1, 1, tq)]
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
        elif marker == 0xE0:  # APP0 (JFIF)
            jfif = jfif or body[:5] == b"JFIF\x00"
        elif marker == 0xEE:  # APP14 (Adobe transform byte)
            if body[:6] == b"Adobe\x00" and len(body) >= 12:
                adobe_transform = body[11]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            sel = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                sel.append((cs, tt >> 4, tt & 15))
            scan_start = pos + seg_len
            if sof is None:
                raise FormatError("jpeg: SOS before SOF")
            w, h, nc, comps = sof
            if nc not in (1, 3):
                raise UnsupportedError(
                    "jpeg: device decode covers 1- and 3-component frames"
                )
            # RGB JPEGs (Adobe transform=0 or R/G/B component ids,
            # decoder.zig:699-709) need convertToRGB, not YCbCr math
            ids = tuple(c[0] for c in comps)
            is_rgb = (not jfif) and (
                adobe_transform == 0
                or (adobe_transform is None and ids == (0x52, 0x47, 0x42))
            )
            if nc == 3 and is_rgb:
                raise UnsupportedError("jpeg: RGB color space not on-device")
            if nc == 3:
                (h0, v0), (h1, v1), (h2, v2) = (
                    (c[1], c[2]) for c in comps
                )
                if (h1, v1) != (h2, v2) or min(h1, v1) < 1:
                    raise UnsupportedError(
                        "jpeg: chroma planes must share sampling factors"
                    )
                if h0 % h1 or v0 % v1 or ((h0 // h1) << 4 | (v0 // v1)) not in (
                    0x11, 0x12, 0x21, 0x22, 0x41, 0x42
                ):
                    raise UnsupportedError(
                        f"jpeg: unsupported sampling {h0}{v0}:{h1}{v1}:{h2}{v2}"
                    )
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
    other = ff[(nxt != 0x00) & ((nxt < 0xD0) | (nxt > 0xD9))]
    if len(other) and int(other[0]) < end:
        # includes FF FF, which the reference rejects as MissingFF00
        # (decoder.zig:712-749) — fall back to the host decoder
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

    # One decode LUT per distinct (class, table-id); comp c uses lut16 row
    # tid_dc[c] / tid_ac[c].
    order = []
    for c, td, ta in sel:
        if (0, td) not in order:
            order.append((0, td))
        if (1, ta) not in order:
            order.append((1, ta))
    tid_of = {kk: i for i, kk in enumerate(order)}
    lut16 = np.stack([_lut16(huffs[kk]) for kk in order])
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
    max_seg_bits = 8 * max(
        int(np.max(np.diff(np.concatenate([starts, [len(stream_)]]))))
        for starts, stream_ in zip(seg_pos_all, streams)
    )
    # pow2 bucket so the step cap doesn't retrace per byte count
    max_seg_bits = 1 << max(10, (max_seg_bits - 1).bit_length())
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
        lut16=lut16, tid_dc=tid_dc, tid_ac=tid_ac,
        stream=flat, seg_bit_pos=seg_bit_pos, seg_n_mcu=seg_n_mcu,
        max_seg_bits=max_seg_bits, batch=len(datas),
        cache_key=(first[0], len(datas), max_seg_bits),
    )


# ---------------------------------------------------------------- kernel


def _select_by_index(jnp, idx, values):
    """Per-lane select from a tuple of trace-time constant ints."""
    out = jnp.full(idx.shape, values[0], jnp.int32)
    for j in range(1, len(values)):
        out = jnp.where(idx == j, jnp.int32(values[j]), out)
    return out


def _rshift(jnp, x, n):
    """x >> n for per-lane n in [0, 32] (XLA shift-by-32 is undefined)."""
    n = jnp.clip(n, 0, 32)
    big = n >= 32
    return jnp.where(big, jnp.uint32(0), x >> jnp.where(big, jnp.uint32(0), n.astype(jnp.uint32)))


def _bits_at4(jnp, w, p, n):
    """Extract bits [p, p+n) (MSB-first) from a 128-bit window w = (w0..w3).

    p, n per-lane int32; requires p <= 96 and n <= 25.  Returns uint32
    with the n bits right-aligned.
    """
    sh = (p & 31).astype(jnp.uint32)
    pi = p >> 5  # word index 0..3
    a = jnp.where(
        pi == 0, w[0], jnp.where(pi == 1, w[1], jnp.where(pi == 2, w[2], w[3]))
    )
    b = jnp.where(
        pi == 0, w[1], jnp.where(pi == 1, w[2], jnp.where(pi == 2, w[3], 0))
    )
    word = jnp.where(sh > 0, (a << sh) | _rshift(jnp, b, 32 - (p & 31)), a)
    return _rshift(jnp, word, 32 - n)



def _value_pass(jax, jnp, *, win, lut, n, starts, done0, tid_dc2, tid_ac2,
                k_syms):
    """Shared value pass: one lane per 8x8 block at a known bit offset.

    Decodes DC diff + AC run-length coefficients into a per-lane [64]
    zigzag row (one-hot emissions, one carry read-modify-write per step;
    RECEIVE/EXTEND per T.81 F.2.2.1, decoder.zig:1115-1134).  Returns the
    final while_loop state (bit_pos, cur, k, phase, done, err, steps) —
    bit_pos lands on each block's end boundary, which callers check
    against the index pass for exact verification.
    """
    L2 = starts.shape[0]

    def body2(st):
        (bit_pos, cur, k, phase, done, err, steps) = st
        byte = jnp.clip(bit_pos >> 3, 0, n - 1)
        w4 = win[byte]
        w = (w4[:, 0], w4[:, 1], w4[:, 2], w4[:, 3])
        off0 = (bit_pos & 7).astype(jnp.int32)
        off = off0
        upd = jnp.zeros_like(cur)  # step's coefficient emissions

        for _ in range(k_syms):
            active = (~done) & (off <= 80)
            look16 = _bits_at4(jnp, w, off, jnp.int32(16)).astype(jnp.int32)
            tid = jnp.where(phase == 0, tid_dc2, tid_ac2)
            ent = lut[tid * 65536 + look16]
            ln_sel = ent & 31
            sym = ent >> 5
            bad = active & (ent == 0)

            is_dc = phase == 0
            r = jnp.where(is_dc, 0, sym >> 4)
            size = jnp.where(is_dc, sym, sym & 15)
            ext_off = off + ln_sel
            raw = _bits_at4(
                jnp, w, ext_off, jnp.clip(size, 0, 16)
            ).astype(jnp.int32)
            raw = jnp.where(size > 0, raw, 0)
            # RECEIVE/EXTEND, branch-free (decoder.zig:1115-1134)
            sz = jnp.clip(size, 0, 16)
            bias = jnp.where(size > 0, (jnp.int32(1) << sz) - 1, 0)
            top_clear = raw < (jnp.int32(1) << jnp.clip(size - 1, 0, 15))
            ext = jnp.where(size > 0, jnp.where(top_clear, raw - bias, raw), 0)

            consume = ln_sel + size
            new_k = jnp.where(is_dc, 1, k)
            emit_k = jnp.where(is_dc, 0, jnp.clip(k + r, 0, 63))
            ac_coef = (~is_dc) & (size > 0)
            # DC emits the raw diff; predictor chain restored afterwards.
            emit_v = jnp.where(is_dc, ext, jnp.where(ac_coef, ext, 0))
            do_emit = is_dc | ac_coef
            new_k = jnp.where(ac_coef, jnp.clip(k + r, 0, 63) + 1, new_k)
            eob = (~is_dc) & (size == 0) & (r != 15)
            zrl = (~is_dc) & (size == 0) & (r == 15)
            new_k = jnp.where(zrl, k + 16, new_k)
            blk_done = (eob | (new_k > 63)) & ~is_dc

            app = active & ~bad
            upd = upd + jnp.where(
                (app & do_emit)[:, None],
                _onehot(jnp, emit_k, 64) * emit_v[:, None],
                0,
            )
            k = jnp.where(app, new_k, k)
            phase = jnp.where(app & is_dc, 1, phase)
            off = jnp.where(app, off + consume, off)
            err = err | bad
            done = done | (app & blk_done) | bad
        cur = cur + upd  # one read-modify-write of cur per step
        bit_pos = bit_pos - off0 + off
        return (bit_pos, cur, k, phase, done, err, steps + 1)

    def cond2(st):
        # a block holds <= 64 symbols and every step decodes >= 1
        n_done = jnp.sum(st[4].astype(jnp.int32))
        return (n_done < st[4].shape[0]) & (st[6] < 80)

    return jax.lax.while_loop(
        cond2,
        body2,
        (
            starts,
            jnp.zeros((L2, 64), jnp.int32),
            jnp.zeros(L2, jnp.int32),
            jnp.zeros(L2, jnp.int32),
            done0,
            jnp.zeros(L2, bool),
            jnp.int32(0),
        ),
    )


def _restore_dc_and_reorder(jnp, cur, *, groups, n_mcu_grp, bpm, hv, ncomp):
    """DC-predictor restore + zigzag->natural reorder.

    cur: [groups * n_mcu_grp * bpm, 64] zigzag rows whose position 0 is
    the raw DC DIFF.  A group is one predictor chain (a restart segment,
    or a whole restart-free image).  Per component, adds the EXCLUSIVE
    prefix sum of preceding diffs at position 0 as a broadcast add (a
    minor-axis slice/concat wedges the tunneled backend), then applies
    the static zigzag inverse.  Returns [groups, n_mcu_grp * bpm, 64]
    int16 natural-order coefficients (decoder.zig:1366-1376, :73-82).
    """
    coeff = cur.reshape(groups, n_mcu_grp, bpm, 64)
    dc = coeff[..., 0]  # [G, M, bpm] raw diffs
    parts = []
    s0 = 0
    for c in range(ncomp):
        nbc = hv[c][0] * hv[c][1]
        d = dc[:, :, s0 : s0 + nbc].reshape(groups, -1)
        pre = (jnp.cumsum(d, axis=1) - d).reshape(groups, n_mcu_grp, nbc)
        parts.append(pre)
        s0 += nbc
    corr = jnp.concatenate(parts, axis=2)  # [G, M, bpm]
    one0 = jnp.asarray((np.arange(64) == 0).astype(np.int32))
    coeff = coeff + corr[..., None] * one0
    out = coeff.reshape(groups, n_mcu_grp * bpm, 64)
    inv = np.zeros(64, np.int64)
    inv[UNZIG] = np.arange(64)
    return jnp.take(out, jnp.asarray(inv), axis=-1).astype(jnp.int16)


def build_decode_fn(
    plan: ScanPlan, *, k_syms: int = 6, max_steps: int | None = None,
    _stage: int = 2, _raw: bool = False,
):
    """Returns a jitted fn: (stream_u8, seg_bit_pos, seg_n_mcu) ->
    (coeffs [L1, seg_mcus*bpm, 64] int16 natural-order, ok flag).

    Two-pass, scatter-free decode (the index-pass/value-pass split used by
    parallel JPEG decoders, mapped onto SIMD lanes):

    * **Pass 1 (index pass)** — one lane per restart segment.  Decodes only
      symbol LENGTHS (one LUT gather per symbol, no extend-bit reads, no
      value math) to find where every 8x8 block's entropy data ends, and
      accumulates each completed block's end bit-position into [L1, nblk]
      with a one-hot over nblk: O(total blocks) vector work per step, no
      scatter anywhere.
    * **Pass 2 (value pass)** — one lane per BLOCK at the now-known bit
      offsets.  Every lane decodes exactly its own block's coefficients
      into its own [64] row (one-hot over 64 per symbol), so the output is
      written positionally — again no scatter, and the work per lane is
      uniform (<= 64 symbols), which keeps tens of thousands of lanes busy
      in lock-step.  DC symbols emit the raw DIFF (T.81 F.2.1.3.1); the
      per-segment predictor chain (decoder.zig:1366-1376) is restored
      afterwards by a segmented cumsum over the MCU axis per component.

    Pass 2 re-derives every block end independently; `ok` requires the two
    passes to agree bit-for-bit, which catches any corrupt stream that
    still happened to parse.

    Everything shape- or table-dependent is closed over as trace-time
    constants (including the decode LUTs), so one compilation covers a
    whole (geometry, tables) bucket and no tables travel per call.
    """
    import jax
    import jax.numpy as jnp

    bpm = plan.bpm
    nblk = plan.seg_mcus * bpm
    n_mcu_seg = plan.seg_mcus
    comp_of_slot = plan.comp_of_slot
    tid_of_slot_dc = tuple(plan.tid_dc[c] for c in comp_of_slot)
    tid_of_slot_ac = tuple(plan.tid_ac[c] for c in comp_of_slot)
    lut_const = plan.lut16.reshape(-1)  # [ntab * 65536]
    k1 = max(k_syms + 2, 8)  # pass-1 symbols/step (no extend reads: cheap)
    if max_steps is None:
        # every pass-1 step consumes >= k1 symbols of >= 2 bits each (or
        # finishes the lane), so the longest segment bounds the loop
        max_steps = plan.max_seg_bits // (2 * k1) + 64

    def decode(stream, seg_bit_pos, seg_n_mcu):
        L1 = seg_bit_pos.shape[0]
        L2 = L1 * nblk
        u32 = jnp.uint32
        # 16-byte windows at every byte offset: [N, 4] uint32 big-endian.
        # A wide window amortizes the per-step gather + state costs over
        # ~2x more symbols (>= 73 bits of guaranteed progress per step).
        s = stream.astype(u32)
        n = stream.shape[0] - 16
        b = [s[i : n + i] for i in range(16)]
        win = jnp.stack(
            [
                (b[4 * j] << 24) | (b[4 * j + 1] << 16) | (b[4 * j + 2] << 8) | b[4 * j + 3]
                for j in range(4)
            ],
            axis=-1,
        )
        lut = jnp.asarray(lut_const)

        # ---------------- pass 1: block end bit-positions per segment
        def body1(st):
            (bit_pos, offs, slot, mcu_cnt, k, phase, done, err, steps) = st
            byte = jnp.clip(bit_pos >> 3, 0, n - 1)
            w4 = win[byte]
            w = (w4[:, 0], w4[:, 1], w4[:, 2], w4[:, 3])
            off0 = (bit_pos & 7).astype(jnp.int32)
            off = off0
            base = (byte << 3).astype(jnp.int32)  # window start, absolute bits
            upd = jnp.zeros_like(offs)  # step's block-end emissions

            for _ in range(k1):
                active = (~done) & (off <= 80)
                look16 = _bits_at4(jnp, w, off, jnp.int32(16)).astype(jnp.int32)
                tid = jnp.where(
                    phase == 0,
                    _select_by_index(jnp, slot, tid_of_slot_dc),
                    _select_by_index(jnp, slot, tid_of_slot_ac),
                )
                ent = lut[tid * 65536 + look16]
                ln_sel = ent & 31
                sym = ent >> 5
                bad = active & (ent == 0)

                is_dc = phase == 0
                r = jnp.where(is_dc, 0, sym >> 4)
                size = jnp.where(is_dc, sym, sym & 15)
                consume = ln_sel + size  # extend bits are skipped, not read

                new_k = jnp.where(is_dc, 1, k)
                ac_coef = (~is_dc) & (size > 0)
                new_k = jnp.where(ac_coef, jnp.clip(k + r, 0, 63) + 1, new_k)
                eob = (~is_dc) & (size == 0) & (r != 15)
                zrl = (~is_dc) & (size == 0) & (r == 15)
                new_k = jnp.where(zrl, k + 16, new_k)
                blk_done = (eob | (new_k > 63)) & ~is_dc

                app = active & ~bad
                adv_blk = app & blk_done
                # record block end (one-hot over nblk: O(total blocks)/step)
                blk_idx = jnp.clip(mcu_cnt * bpm + slot, 0, nblk - 1)
                end_abs = base + off + consume
                upd = upd + _onehot(jnp, blk_idx, nblk) * jnp.where(
                    adv_blk, end_abs, 0
                )[:, None]
                slot = jnp.where(adv_blk, slot + 1, slot)
                wrap = adv_blk & (slot >= bpm)
                slot = jnp.where(wrap, 0, slot)
                mcu_cnt = jnp.where(wrap, mcu_cnt + 1, mcu_cnt)
                k = jnp.where(adv_blk, 0, jnp.where(app, new_k, k))
                phase = jnp.where(adv_blk, 0, jnp.where(app & is_dc, 1, phase))
                off = jnp.where(app, off + consume, off)
                err = err | bad
                done = done | (mcu_cnt >= seg_n_mcu) | bad
            offs = offs + upd  # one read-modify-write of offs per step
            bit_pos = bit_pos - off0 + off
            return (bit_pos, offs, slot, mcu_cnt, k, phase, done, err, steps + 1)

        def cond1(st):
            # sum-based termination test (bool all-reduce miscompiles on
            # some backend shapes; an integer reduction is robust)
            n_done = jnp.sum(st[6].astype(jnp.int32))
            return (n_done < st[6].shape[0]) & (st[8] < max_steps)

        st1 = jax.lax.while_loop(
            cond1,
            body1,
            (
                seg_bit_pos.astype(jnp.int32),
                jnp.zeros((L1, nblk), jnp.int32),
                jnp.zeros(L1, jnp.int32),
                jnp.zeros(L1, jnp.int32),
                jnp.zeros(L1, jnp.int32),
                jnp.zeros(L1, jnp.int32),
                jnp.zeros(L1, bool),
                jnp.zeros(L1, bool),
                jnp.int32(0),
            ),
        )
        ends = st1[1]  # [L1, nblk]
        ok1 = jnp.all(st1[6]) & ~jnp.any(st1[7])
        if _stage == 1:  # debug: index pass only
            return ends, ok1

        # ---------------- pass 2: one lane per block
        starts = jnp.concatenate(
            [seg_bit_pos.astype(jnp.int32)[:, None], ends[:, :-1]], axis=1
        ).reshape(-1)
        valid = (
            jnp.arange(nblk)[None, :] < (seg_n_mcu * bpm)[:, None]
        ).reshape(-1)
        lane2 = jnp.arange(L2)
        slot2 = (lane2 % bpm).astype(jnp.int32)
        tid_dc2 = _select_by_index(jnp, slot2, tid_of_slot_dc)
        tid_ac2 = _select_by_index(jnp, slot2, tid_of_slot_ac)

        st2 = _value_pass(
            jax, jnp, win=win, lut=lut, n=n, starts=starts,
            done0=~valid, tid_dc2=tid_dc2, tid_ac2=tid_ac2, k_syms=k_syms,
        )
        cur = st2[1]
        if _stage == 15:  # debug: value pass, raw
            return cur.astype(jnp.int16), jnp.all(st2[4])
        # integrity: pass 2 must land exactly on pass 1's block ends
        agree = (st2[0] == ends.reshape(-1)) | ~valid
        ok = (
            ok1
            & jnp.all(st2[4])
            & ~jnp.any(st2[5] & valid)
            & jnp.all(agree)
        )
        if _stage == 17:  # debug: + integrity check
            return cur.astype(jnp.int16), ok

        coeffs = _restore_dc_and_reorder(
            jnp, cur, groups=L1, n_mcu_grp=n_mcu_seg, bpm=bpm,
            hv=plan.hv, ncomp=plan.ncomp,
        )
        return coeffs, ok

    if _raw:
        return decode
    return jax.jit(decode)


def _onehot(jnp, idx, n):
    return (idx[:, None] == jnp.arange(n)[None, :]).astype(jnp.int32)


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

    def __init__(self, *, k_syms: int = 6, max_steps: int = 16384, mesh=None):
        self.k_syms = k_syms
        self.max_steps = max_steps
        self.mesh = mesh  # jax.sharding.Mesh with a "batch" axis, or None
        self._decode_fns: dict = {}
        self._backend_fns: dict = {}

    def _put(self, plan: ScanPlan):
        """Upload the plan; with a mesh, segment lanes shard over "batch"
        (the stream is replicated: every chip reads only its lanes' bytes
        but the flat buffer is shared — restart segments are embarrassingly
        parallel, so no collectives are needed until the gather phase)."""
        import jax

        if self.mesh is None:
            return (
                jax.device_put(plan.stream),
                jax.device_put(plan.seg_bit_pos),
                jax.device_put(plan.seg_n_mcu),
            )
        from jax.sharding import NamedSharding, PartitionSpec as P

        ndev = self.mesh.shape["batch"]
        if (plan.batch * plan.n_segs) % ndev:
            raise ValueError(
                f"jpeg: the mesh batch axis ({ndev}) must divide the lane "
                f"count ({plan.batch} images x {plan.n_segs} segments); "
                "pad the batch"
            )
        repl = NamedSharding(self.mesh, P())
        lanes = NamedSharding(self.mesh, P("batch"))
        return (
            jax.device_put(plan.stream, repl),
            jax.device_put(plan.seg_bit_pos, lanes),
            jax.device_put(plan.seg_n_mcu, lanes),
        )

    def decode_coefficients(self, plan: ScanPlan):
        """Run the entropy kernel: -> (coeffs [L, nblk, 64] int16, ok)."""
        key = (plan.cache_key, int(plan.stream.shape[0]), self.mesh is not None)
        fn = self._decode_fns.get(key)
        if fn is None:
            fn = build_decode_fn(plan, k_syms=self.k_syms, max_steps=self.max_steps)
            self._decode_fns[key] = fn
        return fn(*self._put(plan))

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

    def _fused(self, plan: ScanPlan):
        """One compiled program: entropy decode + dequant + IDCT +
        upsample + color convert (no intermediate HBM roundtrip)."""
        import jax
        import jax.numpy as jnp

        key = ("fused", plan.cache_key, int(plan.stream.shape[0]),
               self.mesh is not None)
        fn = self._decode_fns.get(key)
        if fn is None:
            from .batch import _gray_graph, _ycbcr_graph

            body = build_decode_fn(
                plan, k_syms=self.k_syms, max_steps=self.max_steps, _raw=True
            )
            quants = [
                np.stack([plan.quants[c]] * plan.batch)
                for c in range(plan.ncomp)
            ]

            def fused(stream, seg_bit_pos, seg_n_mcu):
                coeffs, ok = body(stream, seg_bit_pos, seg_n_mcu)
                g = coefficients_to_grids(plan, coeffs)
                if plan.ncomp == 1:
                    rgb = _gray_graph(
                        g[0].astype(jnp.int32), jnp.asarray(quants[0]),
                        height=plan.height, width=plan.width,
                    )
                else:
                    rgb = _ycbcr_graph(
                        g[0].astype(jnp.int32), g[1].astype(jnp.int32),
                        g[2].astype(jnp.int32),
                        *(jnp.asarray(q) for q in quants),
                        height=plan.height, width=plan.width,
                        ratio=plan.ratio,
                    )
                return rgb, ok

            fn = jax.jit(fused)
            self._decode_fns[key] = fn
        return fn

    def decode(self, datas: list[bytes]):
        """bytes -> (rgb_or_gray device array, ok device scalar).

        ``ok`` is left on device so callers can pipeline; materialize it
        (bool(ok)) to validate the batch decoded cleanly.
        """
        plan = prep_batch(datas)
        return self._fused(plan)(*self._put(plan))


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
