"""Analytic roofline / MFU accounting for the on-chip decode stages.

The reference has no performance accounting at all (SURVEY.md sec.6);
the driver's question — "is N MPix/s close to speed-of-light on this
chip?" — needs bytes-moved and vector-ops-issued per stage compared
against the chip's published peaks.  This module supplies an analytic
cost model for the device JPEG decoder's three stages (index pass,
value pass, SoA back-end), parameterized by the ScanPlan's static
shapes and the measured while-loop trip counts.

Peaks (TPU v5e / "v5 lite", public spec sheet + scaling-book numbers):

* HBM bandwidth      819 GB/s
* VPU int32/elementwise ~= 8 sublanes x 128 lanes x 4 ALUs x 0.94 GHz
                     ~= 3.85 Tops/s (the entropy loops and the integer
                     IDCT never touch the MXU — elementwise int math is
                     VPU-bound by design)
* MXU bf16           197 TFLOP/s (unused here; decode is integer-exact)

The op counts are analytic ESTIMATES (counted from the kernel
structure, not the compiled HLO) — good to ~+-30%, which is enough to
answer "bandwidth-bound or compute-bound, and by how far".
"""

from __future__ import annotations

from dataclasses import dataclass

V5E_HBM_GBS = 819.0
V5E_VPU_TOPS = 3.85
V5E_MXU_BF16_TFLOPS = 197.0


@dataclass
class StageCost:
    name: str
    bytes_moved: float  # HBM traffic, bytes per batch
    vpu_ops: float  # elementwise int ops per batch

    def line(self, ms: float | None) -> str:
        if not ms:
            return (
                f"{self.name:<18} {self.bytes_moved/1e6:9.1f} MB "
                f"{self.vpu_ops/1e9:8.2f} Gop   (no time measured)"
            )
        bw = self.bytes_moved / (ms * 1e-3) / 1e9
        ops = self.vpu_ops / (ms * 1e-3) / 1e12
        return (
            f"{self.name:<18} {ms:7.2f} ms  "
            f"{bw:6.1f} GB/s ({100*bw/V5E_HBM_GBS:4.1f}% HBM)  "
            f"{ops:5.2f} Tops/s ({100*ops/V5E_VPU_TOPS:4.1f}% VPU)"
        )


def _sym_decode_ops(cmp, active_tabs: int | None = None) -> float:
    """Per-lane-per-symbol op estimate for the gather-free canonical
    decode (_make_sym_decoder): 15 compare+2 accum per active table,
    8 bit-planes x word-range selects, plus look16/extend overhead."""
    ntab = active_tabs if active_tabs is not None else cmp.ntab
    nw = max(1, cmp.nwords)
    return 15 * 3 * ntab + 8 * (nw + 1) * 2 + 60


def jpeg_onchip_costs(plan, *, k_syms: int, k1_syms: int, w_words: int,
                      w1_words: int, steps1: int, steps2: int,
                      i16: bool = True, p1_i16: bool = False):
    """StageCosts for (pass1, pass2, back-end) of one batch decode.

    steps1/steps2: measured (or bounded) while-loop trip counts — the
    loops' traffic is carry-size x trips, which static shapes alone
    cannot give.
    """
    B = plan.batch
    L1 = B * plan.n_segs
    nblk = plan.seg_mcus * plan.bpm
    L2 = L1 * nblk
    cmp = plan.cmp

    # ---- pass 1: index pass, one lane per restart segment
    esz = 2 if p1_i16 else 4
    carry1 = L1 * (6 * 4 + 2 * 1) + nblk * L1 * esz
    win1 = L1 * w1_words * 4  # one [L1, W1] row gather per step
    bytes1 = steps1 * (2 * carry1 + win1)
    ops_sym1 = _sym_decode_ops(cmp) + 45  # + run/size/advance bookkeeping
    ops1 = steps1 * (L1 * k1_syms * ops_sym1 + k1_syms * nblk * L1 * 2)

    # ---- pass 2: value pass, one lane per block
    acsz = 2 if i16 else 4
    carry2 = L2 * (4 * 4 + 2 * 1) + 64 * L2 * acsz + (4 * L2 if i16 else 0)
    win2 = L2 * w_words * 4
    bytes2 = steps2 * (2 * carry2 + win2)
    # AC-only decode touches fewer tables; extend adds ~25 ops
    ops_sym2 = _sym_decode_ops(cmp, active_tabs=max(1, cmp.ntab // 2)) + 70
    ops2 = steps2 * (L2 * k_syms * ops_sym2 + k_syms * 64 * L2 * 2)

    # ---- SoA back-end: dequant + Wang IDCT + planes + upsample + color
    px = B * plan.height * plan.width
    sub = sum(h * v for h, v in plan.hv) / (plan.hv[0][0] * plan.hv[0][1])
    bytes3 = (
        64 * L2 * acsz  # coefficient store read
        + (4 * L2 if i16 else 0)  # DC row
        + 64 * L2 * 1  # uint8 pixel store write (pre-raster)
        + 64 * L2 * 1 * 2  # raster relayout read+write
        + px * sub  # plane reads for upsample/color
        + px * 3  # RGB store
    )
    # Wang butterfly ~29 ops per 8-vector x 2 passes x 8 rows/cols
    # ~= 58 ops per coefficient position, + dequant/clamp ~4, + ~12/px
    # upsample + exact color math
    ops3 = 64 * L2 * (58 + 4) + px * 12
    return (
        StageCost("pass1 (index)", bytes1, ops1),
        StageCost("pass2 (values)", bytes2, ops2),
        StageCost("back-end (IDCT+color)", bytes3, ops3),
    )


def report(costs, times_ms, total_ms: float | None = None,
           link_bytes: float | None = None, link_ms: float | None = None):
    """Text block: one utilization line per stage + the aggregate."""
    lines = ["roofline (v5e peaks: 819 GB/s HBM, ~3.85 Tops/s VPU; "
             "analytic op counts, +-30%)"]
    for c, ms in zip(costs, times_ms):
        lines.append("  " + c.line(ms))
    if total_ms:
        tb = sum(c.bytes_moved for c in costs)
        to = sum(c.vpu_ops for c in costs)
        lines.append(
            "  " + StageCost("TOTAL (fused)", tb, to).line(total_ms)
        )
    if link_bytes and link_ms:
        bw = link_bytes / (link_ms * 1e-3) / 1e9
        lines.append(
            f"  {'link (H2D)':<18} {link_ms:7.2f} ms  {bw*1e3:6.1f} MB/s "
            f"(tunneled; production DMA rides PCIe/DMA engines)"
        )
    return "\n".join(lines)
