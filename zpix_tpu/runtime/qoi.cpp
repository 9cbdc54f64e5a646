// Native QOI decode/encode.
//
// Op-stream semantics mirror /root/reference/src/qoi/decoder.zig:20-147 and
// encoder.zig:29-151 (and the Python ports in zpix_tpu/codecs/qoi/): the
// rolling 64-entry index keyed (3r+5g+7b+11a)&63, run/index/diff/luma ops,
// 62-run cap, 8-byte 0...01 padding.  The op stream is serial by
// construction; this scan runs at memory speed on the host while batches
// parallelize across images.
//
// Built into libzpix_entropy.so (see runtime/__init__.py).

#include <cstdint>
#include <cstring>

namespace {

struct Px {
  uint8_t r, g, b, a;
};

inline int index_pos(Px p) {
  return (p.r * 3 + p.g * 5 + p.b * 7 + p.a * 11) & 63;
}

}  // namespace

extern "C" {

// Decode the op stream after the 14-byte header into out[pixel_count*4].
// Returns 0 on success.
int zpix_qoi_decode(const uint8_t* data, int64_t len, int64_t pixel_count,
                    uint8_t* out) {
  constexpr int64_t kHeader = 14, kPadding = 8;
  if (len < kHeader + kPadding) return 1;
  int64_t p = kHeader;
  int64_t chunks_len = len - kPadding;
  Px index[64];
  memset(index, 0, sizeof(index));
  Px px{0, 0, 0, 255};
  int64_t run = 0;

  for (int64_t i = 0; i < pixel_count; i++) {
    if (run > 0) {
      run--;
    } else if (p < chunks_len) {
      uint8_t b1 = data[p++];
      if (b1 == 0xFE) {  // OP_RGB
        if (p + 3 > len) return 2;
        px.r = data[p];
        px.g = data[p + 1];
        px.b = data[p + 2];
        p += 3;
      } else if (b1 == 0xFF) {  // OP_RGBA
        if (p + 4 > len) return 2;
        px.r = data[p];
        px.g = data[p + 1];
        px.b = data[p + 2];
        px.a = data[p + 3];
        p += 4;
      } else {
        switch (b1 & 0xC0) {
          case 0x00:  // OP_INDEX
            px = index[b1 & 0x3F];
            break;
          case 0x40:  // OP_DIFF
            px.r = uint8_t(px.r + ((b1 >> 4) & 3) - 2);
            px.g = uint8_t(px.g + ((b1 >> 2) & 3) - 2);
            px.b = uint8_t(px.b + (b1 & 3) - 2);
            break;
          case 0x80: {  // OP_LUMA
            if (p >= len) return 2;
            uint8_t b2 = data[p++];
            int dg = int(b1 & 0x3F) - 32;
            px.r = uint8_t(px.r + dg + ((b2 >> 4) & 0xF) - 8);
            px.g = uint8_t(px.g + dg);
            px.b = uint8_t(px.b + dg + (b2 & 0xF) - 8);
            break;
          }
          default:  // OP_RUN
            run = b1 & 0x3F;
        }
      }
      index[index_pos(px)] = px;
    }
    out[i * 4 + 0] = px.r;
    out[i * 4 + 1] = px.g;
    out[i * 4 + 2] = px.b;
    out[i * 4 + 3] = px.a;
  }
  return 0;
}

// Host INDEX pass for the QOI host-index/device-expansion split (round 4).
//
// The speculative on-chip fixed point provably converges too slowly at
// production scale: a rolling-index slot written once early in the stream
// must propagate through every downstream chunk lane one round at a time
// (measured 2026-08-21: 16x1024^2 at chunk=512 is still changing after 64
// rounds of ~0.8 s each).  Like the restart-free JPEG split
// (zpix_baseline_index_scan), the serial byte walk belongs on the host
// scalar core: one pass over the op stream emits per-op (packed RGBA,
// emitted-pixel-count) records — O(ops) work and O(ops) bytes shipped,
// where ops <= pixels (QOI's run/index/diff ops cover up to 62 px in 1
// byte) — and the device expands records into the O(pixels) raster.
// Semantics per /root/reference/src/qoi/decoder.zig:20-130: run counts are
// (b1&63)+1, the index updates after EVERY op, and a stream that exhausts
// before pixel_count leaves the tail replicating the final px
// (decoder.zig:67-69), which the device applies as a fill color.
//
// cols_out[i] = R<<24|G<<16|B<<8|A (the device assembly's packed layout),
// cnts_out[i] in [1,62].  Records past pixel_count are clipped.  Returns
// 0 ok / 1 short stream / 2 truncated op / 3 rcap overflow; *n_out =
// records written, *fill_out = final decoder px.
int zpix_qoi_record_scan(const uint8_t* __restrict data, int64_t len,
                         int64_t pixel_count, uint32_t* __restrict cols_out,
                         uint8_t* __restrict cnts_out, int64_t rcap,
                         int64_t* n_out, uint32_t* fill_out) {
  constexpr int64_t kHeader = 14, kPadding = 8;
  if (len < kHeader + kPadding) return 1;
  int64_t p = kHeader;
  const int64_t chunks_len = len - kPadding;
  Px index[64];
  memset(index, 0, sizeof(index));
  Px px{0, 0, 0, 255};
  int64_t n = 0;
  int64_t total = 0;

  // The op stream carries >= kPadding (8) readable bytes past chunks_len,
  // so inside the stream body (p <= chunks_len - 5, the longest op) all
  // per-op bounds checks hoist to one predictable branch; the tail ops
  // keep the exact checks.
  const int64_t fast_end = chunks_len - 5;
  while (total < pixel_count && p < chunks_len) {
    uint8_t b1 = data[p++];
    int64_t cnt = 1;
    if (__builtin_expect(b1 == 0xFE, 0)) {  // OP_RGB
      if (p > fast_end && p + 3 > len) return 2;
      px.r = data[p];
      px.g = data[p + 1];
      px.b = data[p + 2];
      p += 3;
    } else if (__builtin_expect(b1 == 0xFF, 0)) {  // OP_RGBA
      if (p > fast_end && p + 4 > len) return 2;
      px.r = data[p];
      px.g = data[p + 1];
      px.b = data[p + 2];
      px.a = data[p + 3];
      p += 4;
    } else {
      switch (b1 & 0xC0) {
        case 0x00:  // OP_INDEX
          px = index[b1 & 0x3F];
          break;
        case 0x40:  // OP_DIFF
          px.r = uint8_t(px.r + ((b1 >> 4) & 3) - 2);
          px.g = uint8_t(px.g + ((b1 >> 2) & 3) - 2);
          px.b = uint8_t(px.b + (b1 & 3) - 2);
          break;
        case 0x80: {  // OP_LUMA
          if (p > fast_end && p >= len) return 2;
          uint8_t b2 = data[p++];
          int dg = int(b1 & 0x3F) - 32;
          px.r = uint8_t(px.r + dg + ((b2 >> 4) & 0xF) - 8);
          px.g = uint8_t(px.g + dg);
          px.b = uint8_t(px.b + dg + (b2 & 0xF) - 8);
          break;
        }
        default:  // OP_RUN
          cnt = (b1 & 0x3F) + 1;
      }
    }
    index[index_pos(px)] = px;
    if (__builtin_expect(total + cnt > pixel_count, 0))
      cnt = pixel_count - total;
    if (__builtin_expect(n >= rcap, 0)) return 3;
    cols_out[n] = (uint32_t(px.r) << 24) | (uint32_t(px.g) << 16) |
                  (uint32_t(px.b) << 8) | uint32_t(px.a);
    cnts_out[n] = uint8_t(cnt);
    n++;
    total += cnt;
  }
  *n_out = n;
  *fill_out = (uint32_t(px.r) << 24) | (uint32_t(px.g) << 16) |
              (uint32_t(px.b) << 8) | uint32_t(px.a);
  return 0;
}

// Encode pixel_count pixels (channels 3 or 4) into out (caller-sized to
// pixel_count * (channels + 1) + 22).  Writes ops only (no header/padding);
// returns bytes written, or -1 on overflow.
int64_t zpix_qoi_encode(const uint8_t* pixels, int64_t pixel_count,
                        int32_t channels, uint8_t* out, int64_t cap) {
  Px index[64];
  memset(index, 0, sizeof(index));
  Px prev{0, 0, 0, 255};
  Px px = prev;
  int64_t run = 0;
  int64_t o = 0;
  const bool has_alpha = channels == 4;

  for (int64_t i = 0; i < pixel_count; i++) {
    const uint8_t* s = pixels + i * channels;
    px.r = s[0];
    px.g = s[1];
    px.b = s[2];
    if (has_alpha) px.a = s[3];

    if (px.r == prev.r && px.g == prev.g && px.b == prev.b && px.a == prev.a) {
      run++;
      if (run == 62 || i == pixel_count - 1) {
        if (o >= cap) return -1;
        out[o++] = uint8_t(0xC0 | (run - 1));
        run = 0;
      }
    } else {
      if (run > 0) {
        if (o >= cap) return -1;
        out[o++] = uint8_t(0xC0 | (run - 1));
        run = 0;
      }
      int idx = index_pos(px);
      Px e = index[idx];
      if (e.r == px.r && e.g == px.g && e.b == px.b && e.a == px.a) {
        if (o >= cap) return -1;
        out[o++] = uint8_t(idx);
      } else {
        index[idx] = px;
        if (px.a == prev.a) {
          int vr = int(px.r) - prev.r;
          int vg = int(px.g) - prev.g;
          int vb = int(px.b) - prev.b;
          int vg_r = vr - vg;
          int vg_b = vb - vg;
          if (vr > -3 && vr < 2 && vg > -3 && vg < 2 && vb > -3 && vb < 2) {
            if (o >= cap) return -1;
            out[o++] = uint8_t(0x40 | ((vr + 2) << 4) | ((vg + 2) << 2) | (vb + 2));
          } else if (vg_r > -9 && vg_r < 8 && vg > -33 && vg < 32 && vg_b > -9 &&
                     vg_b < 8) {
            if (o + 2 > cap) return -1;
            out[o++] = uint8_t(0x80 | (vg + 32));
            out[o++] = uint8_t(((vg_r + 8) << 4) | (vg_b + 8));
          } else {
            if (o + 4 > cap) return -1;
            out[o++] = 0xFE;
            out[o++] = px.r;
            out[o++] = px.g;
            out[o++] = px.b;
          }
        } else {
          if (o + 5 > cap) return -1;
          out[o++] = 0xFF;
          out[o++] = px.r;
          out[o++] = px.g;
          out[o++] = px.b;
          out[o++] = px.a;
        }
      }
    }
    prev = px;
  }
  return o;
}

}  // extern "C"
