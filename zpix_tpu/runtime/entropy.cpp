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

#include <cstdint>
#include <cstring>

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

int zpix_entropy_abi_version() { return 1; }

}  // extern "C"
