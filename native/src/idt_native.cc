// Native runtime for implicit_depth_tpu's host-side data path.
//
// The reference ships CUDA kernels for its device hot loops and leans on
// native libraries (OpenEXR, scipy's C labeling) on the host. The TPU port
// moves the device work into Pallas/XLA; this library covers the host side:
//   * EXR block decode: zlib inflate + the EXR delta predictor +
//     two-half byte de-interleave (the per-scanline-block transform OpenEXR
//     applies before deflate) — the hot loop of ClearGrasp depth loading.
//   * RLE block decode (same post-transform).
//   * 4-connected components labeling (two-pass union-find), replacing
//     scipy.ndimage.label in the mask pipeline.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstring>
#include <vector>

#include <zlib.h>

extern "C" {

// Undo the EXR "deflate helper": delta predictor then interleave of the two
// buffer halves. dst and src are dstlen bytes.
static void exr_postdecode(const uint8_t* src, uint8_t* dst, size_t n) {
  // predictor: t[i] = t[i-1] + src[i] - 128 (mod 256)
  std::vector<uint8_t> tmp(n);
  uint8_t acc = 0;
  for (size_t i = 0; i < n; ++i) {
    acc = (uint8_t)(acc + src[i] - (i ? 128 : 0));
    tmp[i] = acc;
  }
  // de-interleave: first half -> even positions, second half -> odd
  const size_t half = (n + 1) / 2;
  const uint8_t* a = tmp.data();
  const uint8_t* b = tmp.data() + half;
  size_t ia = 0, ib = 0;
  for (size_t i = 0; i < n; ++i) {
    dst[i] = (i & 1) ? b[ib++] : a[ia++];
  }
}

// Inflate an EXR ZIP/ZIPS chunk and undo predictor+interleave.
// Returns 0 on success, negative zlib error otherwise.
int idt_exr_unzip(const uint8_t* src, long srclen, uint8_t* dst, long dstlen) {
  std::vector<uint8_t> raw(dstlen);
  uLongf outlen = (uLongf)dstlen;
  int rc = uncompress(raw.data(), &outlen, src, (uLong)srclen);
  if (rc != Z_OK) return rc;
  exr_postdecode(raw.data(), dst, (size_t)outlen);
  return 0;
}

// Decode an EXR RLE chunk (signed-count runs) and undo predictor+interleave.
// Returns bytes produced, or -1 on overflow/corruption.
long idt_exr_unrle(const uint8_t* src, long srclen, uint8_t* dst, long dstlen) {
  std::vector<uint8_t> raw(dstlen);
  long i = 0, o = 0;
  while (i < srclen) {
    int8_t cnt = (int8_t)src[i++];
    if (cnt < 0) {
      long run = -(long)cnt;
      if (i + run > srclen || o + run > dstlen) return -1;
      std::memcpy(raw.data() + o, src + i, run);
      i += run;
      o += run;
    } else {
      long run = (long)cnt + 1;
      if (i >= srclen || o + run > dstlen) return -1;
      std::memset(raw.data() + o, src[i++], run);
      o += run;
    }
  }
  exr_postdecode(raw.data(), dst, (size_t)o);
  return o;
}

// Two-pass union-find 4-connected labeling of mask != 0.
// labels: int32 out, 0 = background; returns number of components.
int idt_connected_components(const uint8_t* mask, int h, int w,
                             int32_t* labels) {
  std::vector<int32_t> parent(1, 0);  // parent[0] unused (background)
  auto find = [&](int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  };
  auto unite = [&](int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a != b) parent[a > b ? a : b] = a < b ? a : b;
  };

  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const long idx = (long)y * w + x;
      if (!mask[idx]) {
        labels[idx] = 0;
        continue;
      }
      int32_t up = (y > 0) ? labels[idx - w] : 0;
      int32_t left = (x > 0) ? labels[idx - 1] : 0;
      if (!up && !left) {
        labels[idx] = (int32_t)parent.size();
        parent.push_back(labels[idx]);
      } else if (up && left) {
        labels[idx] = up < left ? up : left;
        unite(up, left);
      } else {
        labels[idx] = up ? up : left;
      }
    }
  }
  // flatten + renumber 1..K in first-appearance order
  std::vector<int32_t> remap(parent.size(), 0);
  int32_t next = 0;
  for (long idx = 0; idx < (long)h * w; ++idx) {
    if (!labels[idx]) continue;
    int32_t root = find(labels[idx]);
    if (!remap[root]) remap[root] = ++next;
    labels[idx] = remap[root];
  }
  return next;
}

}  // extern "C"
