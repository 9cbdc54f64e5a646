// Native JPEG entropy front-end.
//
// Implements the bit-serial Huffman scan loop (sequential and progressive)
// with semantics matching the reference decoder
// (/root/reference/src/jpeg/decoder.zig:909-1022 bit reader,
// :1294-1455 MCU traversal, :1459-1549 refinement, :1432-1452 restarts).
// The Python decoder calls this per SOS via ctypes; any anomaly returns a
// nonzero code and Python falls back to its own scan, so this path only
// ever handles the well-formed fast case.
//
// Output is per-component coefficient tensors in natural (un-zigzagged)
// order, ready for the batched TPU dequant+IDCT graph.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libzpix_entropy.so entropy.cpp -lpthread

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kMaxCodeLength = 16;

const uint8_t kUnzig[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

// Error codes (mirror zpix_tpu.errors usage in the Python fallback).
enum {
  OK = 0,
  ERR_EOF = 1,
  ERR_MISSING_FF00 = 2,
  ERR_BAD_HUFFMAN = 3,
  ERR_UNINIT_TABLE = 4,
  ERR_EXCESSIVE_DC = 5,
  ERR_BAD_RST = 6,
  ERR_UNEXPECTED_CODE = 7,
  ERR_TOO_MANY_COEFFS = 8,
};

struct HuffTable {
  // Layout mirrors zpix_tpu/codecs/jpeg/tables.py (HuffTable.zig).
  uint16_t lut[256];
  int32_t min_codes[kMaxCodeLength];
  int32_t max_codes[kMaxCodeLength];
  int32_t vals_indices[kMaxCodeLength];
  uint8_t vals[256];
  int32_t num_codes;
};

struct ScanComp {
  int32_t c_index;   // component index in frame
  int32_t dc_table;  // Td
  int32_t ac_table;  // Ta
  int32_t h, v;      // sampling factors
  int32_t bh;        // block-grid width (mxx * h): coeff row stride /64
};

struct BitReader {
  const uint8_t* data;
  int64_t len;
  int64_t pos;
  uint32_t a;  // accumulator
  uint32_t m;  // mask
  int32_t n;   // bit count
  int32_t num_unreadable;
  int err;

  inline int read_stuffed() {
    if (pos >= len) {
      num_unreadable = 0;
      err = ERR_EOF;
      return -1;
    }
    uint8_t x = data[pos++];
    num_unreadable = 1;
    if (x != 0xFF) return x;
    if (pos >= len) {
      num_unreadable = 0;
      err = ERR_EOF;
      return -1;
    }
    if (data[pos] != 0x00) {
      err = ERR_MISSING_FF00;
      return -1;
    }
    pos++;
    num_unreadable = 2;
    return 0xFF;
  }

  inline void unread_stuffed() {
    pos -= num_unreadable;
    num_unreadable = 0;
    if (n >= 8) {
      a >>= 8;
      n -= 8;
      m >>= 8;
    }
  }

  inline bool ensure_bits(int32_t want) {
    while (true) {
      int c = read_stuffed();
      if (c < 0) return false;
      a = (a << 8) | uint32_t(c);
      n += 8;
      m = (m == 0) ? (1u << 7) : (m << 8);
      if (n >= want) return true;
    }
  }

  inline int decode_bit(int* out) {
    if (n == 0 && !ensure_bits(1)) return err;
    *out = (a & m) != 0;
    n -= 1;
    m >>= 1;
    return OK;
  }

  inline int decode_bits(int32_t count, uint32_t* out) {
    if (n < count && !ensure_bits(count)) return err;
    *out = (a >> (n - count)) & ((1u << count) - 1);
    n -= count;
    m >>= count;
    return OK;
  }

  inline int receive_extend(int t, int32_t* out) {
    if (n < t && !ensure_bits(t)) return err;
    n -= t;
    m >>= t;
    int32_t threshold = 1 << t;
    int32_t value = int32_t((a >> n) & uint32_t(threshold - 1));
    if (value < (threshold >> 1)) value += ((-1) << t) + 1;
    *out = value;
    return OK;
  }

  int decode_huffman(const HuffTable* h, int* out) {
    if (h->num_codes == 0) return ERR_UNINIT_TABLE;
    if (n < 8) {
      if (!ensure_bits(8)) {
        if (err == ERR_MISSING_FF00) {
          // End of segment: unread and take the slow path
          // (decoder.zig:915-928).
          err = OK;
          if (num_unreadable != 0) unread_stuffed();
          return decode_huffman_slow(h, out);
        }
        return err;
      }
    }
    uint16_t v = h->lut[(a >> (n - 8)) & 0xFF];
    if (v != 0) {
      int nbits = int(v & 0xFF) - 1;
      n -= nbits;
      m >>= nbits;
      *out = v >> 8;
      return OK;
    }
    return decode_huffman_slow(h, out);
  }

  int decode_huffman_slow(const HuffTable* h, int* out) {
    int32_t code = 0;
    for (int i = 0; i < kMaxCodeLength; i++) {
      if (n == 0 && !ensure_bits(1)) return err;
      if (a & m) code |= 1;
      n -= 1;
      m >>= 1;
      if (code <= h->max_codes[i]) {
        *out = h->vals[h->vals_indices[i] + code - h->min_codes[i]];
        return OK;
      }
      code <<= 1;
    }
    return ERR_BAD_HUFFMAN;
  }

  // readFull-style 2-byte read with unread prologue (decoder.zig:414-443).
  int read_full2(uint8_t* out) {
    if (num_unreadable > 0) {
      if (n >= 8) unread_stuffed();
      num_unreadable = 0;
    }
    if (pos + 2 > len) return ERR_EOF;
    out[0] = data[pos];
    out[1] = data[pos + 1];
    pos += 2;
    return OK;
  }
};

// findRst resync (decoder.zig:1671-1705).
int find_rst(BitReader& br, uint8_t expected_rst, uint8_t t0, uint8_t t1) {
  while (true) {
    int i = 0;
    if (t0 == 0xFF) {
      if (t1 == expected_rst) return OK;
      if (t1 == 0xFF) {
        i = 1;
      } else if (t1 != 0x00) {
        return ERR_BAD_RST;
      }
    } else if (t1 == 0xFF) {
      t0 = 0xFF;
      i = 1;
    }
    if (br.pos + (2 - i) > br.len) return ERR_EOF;
    if (i == 1) {
      t1 = br.data[br.pos++];
    } else {
      t0 = br.data[br.pos];
      t1 = br.data[br.pos + 1];
      br.pos += 2;
    }
  }
}

struct RefineState {
  uint16_t eob_run;
};

// Successive-approximation AC refinement (decoder.zig:1459-1549).
int refine_non_zeroes(BitReader& br, int32_t* b, int32_t* zig_io,
                      int32_t zig_end, int32_t nz, int32_t delta) {
  int32_t zig = *zig_io;
  while (zig <= zig_end) {
    int u = kUnzig[zig];
    if (b[u] == 0) {
      if (nz == 0) break;
      nz--;
    } else {
      int bit;
      int rc = br.decode_bit(&bit);
      if (rc != OK) return rc;
      if (bit) {
        if (b[u] >= 0)
          b[u] += delta;
        else
          b[u] -= delta;
      }
    }
    zig++;
  }
  *zig_io = zig;
  return OK;
}

int refine_block(BitReader& br, RefineState& rs, const HuffTable* h,
                 int32_t* b, int32_t zig_start, int32_t zig_end,
                 int32_t delta) {
  if (zig_start == 0) {
    int bit;
    int rc = br.decode_bit(&bit);
    if (rc != OK) return rc;
    if (bit) b[0] |= delta;
    return OK;
  }
  int32_t zig = zig_start;
  if (rs.eob_run == 0) {
    while (zig <= zig_end) {
      int32_t z = 0;
      int value;
      int rc = br.decode_huffman(h, &value);
      if (rc != OK) return rc;
      int val0 = value >> 4;
      int val1 = value & 0x0F;
      if (val1 == 0) {
        if (val0 != 0x0F) {
          rs.eob_run = uint16_t(1u << val0);
          if (val0 != 0) {
            uint32_t bits;
            rc = br.decode_bits(val0, &bits);
            if (rc != OK) return rc;
            rs.eob_run |= uint16_t(bits);
          }
          break;
        }
      } else if (val1 == 1) {
        z = delta;
        int bit;
        rc = br.decode_bit(&bit);
        if (rc != OK) return rc;
        if (!bit) z = -z;
      } else {
        return ERR_UNEXPECTED_CODE;
      }
      rc = refine_non_zeroes(br, b, &zig, zig_end, val0, delta);
      if (rc != OK) return rc;
      if (zig > zig_end) return ERR_TOO_MANY_COEFFS;
      if (z != 0) b[kUnzig[zig]] = z;
      zig++;
    }
  }
  if (rs.eob_run > 0) {
    rs.eob_run--;
    int rc = refine_non_zeroes(br, b, &zig, zig_end, -1, delta);
    if (rc != OK) return rc;
  }
  return OK;
}

}  // namespace

extern "C" {

// Decode one scan (sequential or progressive) starting at data[pos].
//
// coeff_out[k]: int32 [bv, bh, 64] tensor for scan component k's frame
// component (natural coefficient order), already holding prior-scan state
// for progressive streams.  dc_io: int32[4] DC predictors (zeroed by
// caller).  eob_run_io: persists across scans within a decoder.
//
// Returns OK and writes the final stream state (pos/bits) back so the
// Python marker loop resumes exactly where the reference would.
int zpix_decode_scan(
    const uint8_t* data, int64_t len, int64_t pos_in,
    const HuffTable* huff,  // [2][4]: dc tables 0..3 then ac tables 4..7
    const ScanComp* scan, int32_t n_comp,
    int32_t mxx, int32_t myy, int32_t width, int32_t height,
    int32_t restart_interval,
    int32_t zig_start, int32_t zig_end, int32_t ah, int32_t al,
    int32_t progressive,
    int32_t** coeff_out,
    uint16_t* eob_run_io,
    int64_t* pos_out, int32_t* bits_n_out, int32_t* num_unreadable_out) {
  BitReader br{data, len, pos_in, 0, 0, 0, 0, OK};
  RefineState rs{*eob_run_io};

  int32_t dc[4] = {0, 0, 0, 0};
  int32_t block_count = 0;
  uint8_t expected_rst = 0xD0;
  int64_t mcu = 0;

  for (int32_t my = 0; my < myy; my++) {
    for (int32_t mx = 0; mx < mxx; mx++) {
      for (int32_t k = 0; k < n_comp; k++) {
        const ScanComp& sc = scan[k];
        int32_t hi = sc.h, vi = sc.v;
        const HuffTable* dc_tab = &huff[sc.dc_table];
        const HuffTable* ac_tab = &huff[4 + sc.ac_table];
        for (int32_t j = 0; j < hi * vi; j++) {
          int32_t bx, by;
          if (n_comp != 1) {
            bx = hi * mx + (j % hi);
            by = vi * my + (j / hi);
          } else {
            bx = block_count % (mxx * hi);
            by = block_count / (mxx * hi);
            block_count++;
            if (bx * 8 >= width || by * 8 >= height) continue;
          }
          int32_t* b = coeff_out[k] + (int64_t(by) * sc.bh + bx) * 64;

          if (ah != 0) {
            int rc = refine_block(br, rs, ac_tab, b, zig_start, zig_end,
                                  1 << al);
            if (rc != OK) return rc;
          } else {
            int32_t zig = zig_start;
            if (zig == 0) {
              zig++;
              int value;
              int rc = br.decode_huffman(dc_tab, &value);
              if (rc != OK) return rc;
              if (value > 16) return ERR_EXCESSIVE_DC;
              int32_t dc_delta;
              rc = br.receive_extend(value, &dc_delta);
              if (rc != OK) return rc;
              dc[sc.c_index] += dc_delta;
              b[0] = dc[sc.c_index] << al;
            }
            if (zig <= zig_end && rs.eob_run > 0) {
              rs.eob_run--;
            } else {
              while (zig <= zig_end) {
                int value;
                int rc = br.decode_huffman(ac_tab, &value);
                if (rc != OK) return rc;
                int val0 = value >> 4;
                int val1 = value & 0x0F;
                if (val1 != 0) {
                  zig += val0;
                  if (zig > zig_end) break;
                  int32_t ac;
                  rc = br.receive_extend(val1, &ac);
                  if (rc != OK) return rc;
                  b[kUnzig[zig]] = ac << al;
                } else {
                  if (val0 != 0x0F) {
                    rs.eob_run = uint16_t(1u << val0);
                    if (val0 != 0) {
                      uint32_t bits;
                      rc = br.decode_bits(val0, &bits);
                      if (rc != OK) return rc;
                      rs.eob_run |= uint16_t(bits);
                    }
                    rs.eob_run--;
                    break;
                  }
                  zig += 0x0F;
                }
                zig++;
              }
            }
          }
        }
      }

      mcu++;
      if (restart_interval > 0 && mcu % restart_interval == 0 &&
          mcu < int64_t(mxx) * myy) {
        uint8_t tmp2[2];
        int rc = br.read_full2(tmp2);
        if (rc != OK) return rc;
        if (tmp2[0] != 0xFF || tmp2[1] != expected_rst) {
          rc = find_rst(br, expected_rst, tmp2[0], tmp2[1]);
          if (rc != OK) return rc;
        }
        expected_rst++;
        if (expected_rst == 0xD8) expected_rst = 0xD0;
        br.a = 0;
        br.m = 0;
        br.n = 0;
        br.num_unreadable = 0;
        dc[0] = dc[1] = dc[2] = dc[3] = 0;
        rs.eob_run = 0;
      }
    }
  }

  *eob_run_io = rs.eob_run;
  *pos_out = br.pos;
  *bits_n_out = br.n;
  *num_unreadable_out = br.num_unreadable;
  return OK;
}

// Sparse-pack a coefficient tensor for the host->device transfer.
//
// JPEG coefficient tensors are ~95% zero after quantization; the tunnel /
// PCIe link is the decode pipeline's bottleneck, so blocks travel as a
// 64-bit nonzero bitmap (8 bytes, MSB-first per byte to match
// numpy.packbits) plus the nonzero values as int16.  Unpacked on-device
// inside the jit graph (zpix_tpu/parallel/batch.py).
//
// Returns the number of nonzero values written (<= cap), or -1 if cap was
// too small.
int64_t zpix_pack_sparse(const int32_t* coeff, int64_t nblocks,
                         uint8_t* bitmap_out, int16_t* vals_out,
                         int64_t cap) {
  int64_t n = 0;
  for (int64_t b = 0; b < nblocks; b++) {
    const int32_t* blk = coeff + b * 64;
    uint8_t* bm = bitmap_out + b * 8;
    for (int byte = 0; byte < 8; byte++) {
      uint8_t m = 0;
      for (int bit = 0; bit < 8; bit++) {
        int32_t v = blk[byte * 8 + bit];
        if (v != 0) {
          m |= uint8_t(0x80 >> bit);
          if (n >= cap) return -1;
          vals_out[n++] = int16_t(v);
        }
      }
      bm[byte] = m;
    }
  }
  return n;
}

namespace {

// ---------------------------------------------------------------------
// Full-file baseline front-end: marker loop + DHT build + scan + pack.
// Strict fast path: anything unusual (progressive, 4-component, RGB,
// 12-bit, arithmetic coding...) returns UNSUPPORTED and the Python
// decoder handles it with identical semantics.
// ---------------------------------------------------------------------

enum {
  ERR_UNSUPPORTED = 100,
  ERR_FORMAT = 101,
};

const uint8_t kZigToNat[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

// Build a HuffTable from DHT payload (decoder.zig:1070-1109).
int build_huff(HuffTable* h, const uint8_t* counts, const uint8_t* vals,
               int total) {
  if (total == 0 || total > 256) return ERR_FORMAT;
  h->num_codes = total;
  memset(h->lut, 0, sizeof(h->lut));
  memcpy(h->vals, vals, total);
  uint32_t code = 0;
  int val_index = 0;
  for (int i = 0; i < 8; i++) {
    code <<= 1;
    for (int j = 0; j < counts[i]; j++) {
      uint32_t base = code << (7 - i);
      uint16_t lut_value = uint16_t(h->vals[val_index] << 8) | uint16_t(2 + i);
      for (uint32_t k = 0; k < (1u << (7 - i)); k++) h->lut[base | k] = lut_value;
      code++;
      val_index++;
    }
  }
  int32_t code_base = 0;
  int32_t index = 0;
  for (int i = 0; i < kMaxCodeLength; i++) {
    if (counts[i] == 0) {
      h->min_codes[i] = -1;
      h->max_codes[i] = -1;
      h->vals_indices[i] = -1;
    } else {
      h->min_codes[i] = code_base;
      h->max_codes[i] = code_base + counts[i] - 1;
      h->vals_indices[i] = index;
      code_base += counts[i];
      index += counts[i];
    }
    code_base <<= 1;
  }
  return OK;
}

}  // namespace

extern "C" int zpix_decode_scan(
    const uint8_t*, int64_t, int64_t, const HuffTable*, const ScanComp*,
    int32_t, int32_t, int32_t, int32_t, int32_t, int32_t, int32_t, int32_t,
    int32_t, int32_t, int32_t, int32_t**, uint16_t*, int64_t*, int32_t*,
    int32_t*);

extern "C" int64_t zpix_pack_sparse(const int32_t*, int64_t, uint8_t*,
                                    int16_t*, int64_t);

// Parse a whole baseline JPEG and emit sparse-packed coefficients.
//
// Caller pre-sizes the output buffers from a cheap SOF peek:
//   bitmaps[c]: uint8[bv*bh*8], vals[c]: int16[vals_cap[c]]
// quant_nat: int32[3][64] natural order per component; nnz_out: int64[3].
// Returns OK, ERR_UNSUPPORTED (Python fallback required) or an error code.
extern "C" int zpix_parse_baseline(
    const uint8_t* data, int64_t len,
    int32_t expect_width, int32_t expect_height,
    uint8_t** bitmaps, int16_t** vals, const int64_t* vals_cap,
    int32_t* quant_nat, int64_t* nnz_out) {
  int64_t pos = 0;
  if (len < 2 || data[0] != 0xFF || data[1] != 0xD8) return ERR_FORMAT;
  pos = 2;

  HuffTable huff[8];
  for (auto& h : huff) h.num_codes = 0;
  int32_t quant_zig[4][64];
  bool quant_set[4] = {false, false, false, false};

  int32_t width = 0, height = 0, ncomp = 0;
  int32_t comp_h[4] = {0}, comp_v[4] = {0};
  uint8_t comp_id[4] = {0}, comp_tq[4] = {0};
  int32_t restart_interval = 0;
  bool jfif = false, adobe_valid = false;
  int adobe_transform = 0;
  uint16_t eob_run = 0;

  // Coefficient tensors, allocated after SOF.
  int32_t* coeff[4] = {nullptr, nullptr, nullptr, nullptr};
  int32_t mxx = 0, myy = 0;
  int rc_out = OK;

  auto cleanup = [&]() {
    for (auto& c : coeff) {
      delete[] c;
      c = nullptr;
    }
  };

  while (true) {
    if (pos + 2 > len) {
      cleanup();
      return ERR_EOF;
    }
    uint8_t t0 = data[pos], t1 = data[pos + 1];
    pos += 2;
    while (t0 != 0xFF) {
      // Liberal extraneous-byte skip (decoder.zig:246-269).
      t0 = t1;
      if (pos >= len) {
        cleanup();
        return ERR_EOF;
      }
      t1 = data[pos++];
    }
    uint8_t marker = t1;
    if (marker == 0) continue;
    while (marker == 0xFF) {
      if (pos >= len) {
        cleanup();
        return ERR_EOF;
      }
      marker = data[pos++];
    }
    if (marker == 0xD9) break;  // EOI
    if (marker >= 0xD0 && marker <= 0xD7) continue;  // stray RST

    if (pos + 2 > len) {
      cleanup();
      return ERR_EOF;
    }
    int32_t n = ((int32_t(data[pos]) << 8) | data[pos + 1]) - 2;
    pos += 2;
    if (n < 0 || pos + n > len) {
      cleanup();
      return ERR_FORMAT;
    }
    const uint8_t* seg = data + pos;

    switch (marker) {
      case 0xC0:
      case 0xC1: {  // SOF0/1: baseline / extended sequential
        if (ncomp != 0 || n < 6) {
          cleanup();
          return ERR_FORMAT;
        }
        if (seg[0] != 8) {
          cleanup();
          return ERR_UNSUPPORTED;
        }
        height = (seg[1] << 8) | seg[2];
        width = (seg[3] << 8) | seg[4];
        ncomp = seg[5];
        if (ncomp != 1 && ncomp != 3) {
          cleanup();
          return ERR_UNSUPPORTED;
        }
        if (n != 6 + 3 * ncomp) {
          cleanup();
          return ERR_FORMAT;
        }
        if (width != expect_width || height != expect_height) {
          cleanup();
          return ERR_FORMAT;
        }
        for (int i = 0; i < ncomp; i++) {
          comp_id[i] = seg[6 + 3 * i];
          uint8_t hv = seg[7 + 3 * i];
          int h = hv >> 4, v = hv & 0x0F;
          if (h < 1 || h > 4 || v < 1 || v > 4 || h == 3 || v == 3) {
            cleanup();
            return ERR_UNSUPPORTED;
          }
          if (ncomp == 1) {
            h = 1;
            v = 1;
          }
          comp_h[i] = h;
          comp_v[i] = v;
          comp_tq[i] = seg[8 + 3 * i];
          if (comp_tq[i] > 3) {
            cleanup();
            return ERR_FORMAT;
          }
        }
        if (ncomp == 3) {
          if (comp_v[0] == 4) {
            cleanup();
            return ERR_UNSUPPORTED;
          }
          if (comp_h[0] % comp_h[1] != 0 || comp_v[0] % comp_v[1] != 0 ||
              comp_h[1] != comp_h[2] || comp_v[1] != comp_v[2]) {
            cleanup();
            return ERR_UNSUPPORTED;
          }
        }
        mxx = (width + 8 * comp_h[0] - 1) / (8 * comp_h[0]);
        myy = (height + 8 * comp_v[0] - 1) / (8 * comp_v[0]);
        for (int i = 0; i < ncomp; i++) {
          int64_t nb = int64_t(mxx) * comp_h[i] * myy * comp_v[i];
          coeff[i] = new int32_t[nb * 64]();
        }
        break;
      }
      case 0xC2:  // progressive: Python path
        cleanup();
        return ERR_UNSUPPORTED;
      case 0xC4: {  // DHT
        int32_t rem = n;
        const uint8_t* p = seg;
        while (rem > 0) {
          if (rem < 17) {
            cleanup();
            return ERR_FORMAT;
          }
          int tc = p[0] >> 4, th = p[0] & 0x0F;
          if (tc > 1 || th > 3) {
            cleanup();
            return ERR_FORMAT;
          }
          int total = 0;
          for (int i = 1; i <= 16; i++) total += p[i];
          if (rem < 17 + total) {
            cleanup();
            return ERR_FORMAT;
          }
          int rc = build_huff(&huff[tc * 4 + th], p + 1, p + 17, total);
          if (rc != OK) {
            cleanup();
            return rc;
          }
          p += 17 + total;
          rem -= 17 + total;
        }
        break;
      }
      case 0xDB: {  // DQT
        int32_t rem = n;
        const uint8_t* p = seg;
        while (rem > 0) {
          int tq = p[0] & 0x0F, pq = p[0] >> 4;
          if (tq > 3) {
            cleanup();
            return ERR_FORMAT;
          }
          if (pq == 0) {
            if (rem < 65) {
              cleanup();
              return ERR_FORMAT;
            }
            for (int i = 0; i < 64; i++) quant_zig[tq][i] = p[1 + i];
            p += 65;
            rem -= 65;
          } else if (pq == 1) {
            if (rem < 129) {
              cleanup();
              return ERR_FORMAT;
            }
            for (int i = 0; i < 64; i++)
              quant_zig[tq][i] = (int32_t(p[1 + 2 * i]) << 8) | p[2 + 2 * i];
            p += 129;
            rem -= 129;
          } else {
            cleanup();
            return ERR_FORMAT;
          }
          quant_set[tq] = true;
        }
        break;
      }
      case 0xDD:  // DRI
        if (n != 2) {
          cleanup();
          return ERR_FORMAT;
        }
        restart_interval = (int32_t(seg[0]) << 8) | seg[1];
        break;
      case 0xE0:  // APP0
        if (n >= 5) jfif = memcmp(seg, "JFIF\x00", 5) == 0;
        break;
      case 0xEE:  // APP14
        if (n >= 12 && memcmp(seg, "Adobe", 5) == 0) {
          adobe_valid = true;
          adobe_transform = seg[11];
        }
        break;
      case 0xDA: {  // SOS
        if (ncomp == 0) {
          cleanup();
          return ERR_FORMAT;
        }
        // RGB JPEGs need the Python convertToRGB path.
        bool is_rgb = !jfif && ((adobe_valid && adobe_transform == 0) ||
                                (ncomp == 3 && comp_id[0] == 'R' &&
                                 comp_id[1] == 'G' && comp_id[2] == 'B'));
        if (is_rgb) {
          cleanup();
          return ERR_UNSUPPORTED;
        }
        int n_scan = seg[0];
        if (n != 4 + 2 * n_scan || n_scan < 1 || n_scan > ncomp) {
          cleanup();
          return ERR_FORMAT;
        }
        ScanComp sc[4];
        int32_t* scan_coeff[4];
        for (int i = 0; i < n_scan; i++) {
          int ci = -1;
          for (int j = 0; j < ncomp; j++)
            if (seg[1 + 2 * i] == comp_id[j]) ci = j;
          if (ci < 0) {
            cleanup();
            return ERR_FORMAT;
          }
          sc[i].c_index = ci;
          sc[i].dc_table = seg[2 + 2 * i] >> 4;
          sc[i].ac_table = seg[2 + 2 * i] & 0x0F;
          if (sc[i].dc_table > 3 || sc[i].ac_table > 3) {
            cleanup();
            return ERR_FORMAT;
          }
          sc[i].h = comp_h[ci];
          sc[i].v = comp_v[ci];
          sc[i].bh = mxx * comp_h[ci];
          scan_coeff[i] = coeff[ci];
        }
        int64_t pos_out;
        int32_t bits_n_out, unread_out;
        pos += n;  // scan header consumed
        int rc = zpix_decode_scan(
            data, len, pos, huff, sc, n_scan, mxx, myy, width, height,
            restart_interval, 0, 63, 0, 0, 0, scan_coeff, &eob_run, &pos_out,
            &bits_n_out, &unread_out);
        if (rc != OK) {
          cleanup();
          return rc;
        }
        // Mirror the unread prologue the marker loop's next read performs.
        pos = pos_out;
        if (unread_out > 0 && bits_n_out >= 8) pos -= unread_out;
        continue;  // pos already advanced
      }
      default:
        if ((marker >= 0xE0 && marker <= 0xEF) || marker == 0xFE) {
          break;  // skip APPn/COM
        }
        cleanup();
        return marker < 0xC0 ? ERR_FORMAT : ERR_UNSUPPORTED;
    }
    pos += n;
  }

  if (coeff[0] == nullptr) {
    cleanup();
    return ERR_FORMAT;
  }

  for (int i = 0; i < ncomp; i++) {
    if (!quant_set[comp_tq[i]]) {
      cleanup();
      return ERR_FORMAT;
    }
    for (int z = 0; z < 64; z++)
      quant_nat[i * 64 + kZigToNat[z]] = quant_zig[comp_tq[i]][z];
    int64_t nb = int64_t(mxx) * comp_h[i] * myy * comp_v[i];
    int64_t nz =
        zpix_pack_sparse(coeff[i], nb, bitmaps[i], vals[i], vals_cap[i]);
    if (nz < 0) {
      cleanup();
      return ERR_FORMAT;
    }
    nnz_out[i] = nz;
  }
  cleanup();
  return rc_out;
}

// Batched front-end: parse N baseline JPEGs with an internal thread pool.
//
// All images must share the geometry implied by the caller's buffers
// (validated per image via expect_width/height).  Layout per component c:
//   bitmaps_c: uint8 [n_images, nb_c * 8]   (row i = image i)
//   vals_c:    int16 [n_images, vals_cap_c]
//   quants_c:  int32 [n_images, 64] — written per image (natural order)
//   nnz_out:   int64 [n_images, 3]
// rc_out: int32[n_images] per-image return codes.
extern "C" int zpix_parse_baseline_batch(
    const uint8_t** datas, const int64_t* lens, int32_t n_images,
    int32_t expect_width, int32_t expect_height, int32_t ncomp,
    uint8_t** bitmaps, int16_t** vals, const int64_t* vals_cap,
    const int64_t* bitmap_stride,  // per comp: nb_c * 8
    int32_t** quants, int64_t* nnz_out, int32_t* rc_out, int32_t n_threads) {
  std::atomic<int32_t> next{0};
  auto worker = [&]() {
    while (true) {
      int32_t i = next.fetch_add(1);
      if (i >= n_images) return;
      uint8_t* bm[4];
      int16_t* vl[4];
      int64_t cap[4];
      int32_t quant_nat[3 * 64];
      int64_t nnz[4] = {0, 0, 0, 0};
      for (int c = 0; c < ncomp; c++) {
        bm[c] = bitmaps[c] + int64_t(i) * bitmap_stride[c];
        vl[c] = vals[c] + int64_t(i) * vals_cap[c];
        cap[c] = vals_cap[c];
      }
      int rc = zpix_parse_baseline(datas[i], lens[i], expect_width,
                                   expect_height, bm, vl, cap, quant_nat, nnz);
      rc_out[i] = rc;
      if (rc == OK) {
        for (int c = 0; c < ncomp; c++) {
          memcpy(quants[c] + int64_t(i) * 64, quant_nat + c * 64,
                 64 * sizeof(int32_t));
          nnz_out[int64_t(i) * 3 + c] = nnz[c];
        }
      }
    }
  };
  if (n_threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; t++) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  for (int32_t i = 0; i < n_images; i++)
    if (rc_out[i] != OK) return rc_out[i];
  return OK;
}

int zpix_entropy_abi_version() { return 5; }

}  // extern "C"
