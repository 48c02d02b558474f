// Native image input pipeline: fused JPEG decode -> bilinear resize ->
// patchify, multithreaded over a batch.
//
// The reference's host image path is cv2.imread -> BGR2RGB -> albumentations
// bilinear Resize(224,224) per item on the Python side (reference:
// dataset.py:30-32,44-58). This is the TPU-production equivalent: one C pass
// per image that decodes (libjpeg, using DCT scaling to skip work when the
// source is much larger than the target), resizes with the same
// half-pixel-center bilinear convention cv2/albumentations use, and writes
// directly into the pre-patchified uint8 (N, P*P*C) layout the train step
// consumes (see mae_clip_tpu/data/images.py:patchify_host — shipping patches
// keeps minor-dim-3 reshapes off the TPU). A thread pool fans the batch out
// across host cores; normalization stays fused into the jitted step on
// device (images.py:normalize_uint8).
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>  // requires <cstdio>/<cstddef> first (uses FILE, size_t)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------
// libjpeg decode with error-trap (libjpeg's default handler exit()s).
// ---------------------------------------------------------------------
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode JPEG bytes to RGB u8. Picks the largest libjpeg DCT scale
// denominator (1/2, 1/4, 1/8) that keeps both dims >= min_dim, so a 4000px
// photo headed for 224px is decoded at 1/8 cost. Returns true on success;
// out is resized to h*w*3 and out_w/out_h set.
bool decode_jpeg(const uint8_t* data, size_t len, int min_dim,
                 std::vector<uint8_t>* out, int* out_w, int* out_h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  if (min_dim > 0) {
    cinfo.scale_num = 1;
    for (unsigned denom = 8; denom >= 1; denom /= 2) {
      if (static_cast<int>(cinfo.image_width / denom) >= min_dim &&
          static_cast<int>(cinfo.image_height / denom) >= min_dim) {
        cinfo.scale_denom = denom;
        break;
      }
      cinfo.scale_denom = 1;
    }
  }
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width, h = cinfo.output_height;
  const int comps = cinfo.output_components;  // 3 after JCS_RGB
  if (comps != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  out->resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out->data() + static_cast<size_t>(cinfo.output_scanline)
                                     * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out_w = w;
  *out_h = h;
  return true;
}

// ---------------------------------------------------------------------
// Fused bilinear resize (half-pixel centers, cv2 INTER_LINEAR convention)
// writing straight into patch layout: out[(py*gw+px)*P*P*3 + (iy*P+ix)*3+c].
// ---------------------------------------------------------------------
void resize_into_patches(const uint8_t* src, int sh, int sw, int size,
                         int patch, uint8_t* out) {
  const int grid = size / patch;
  const float sy = static_cast<float>(sh) / size;
  const float sx = static_cast<float>(sw) / size;

  // Precompute x-axis sample positions/weights once per row sweep.
  std::vector<int> x0(size), x1(size);
  std::vector<float> wx(size);
  for (int x = 0; x < size; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f;
    int ix = static_cast<int>(std::floor(fx));
    float t = fx - ix;
    x0[x] = std::min(std::max(ix, 0), sw - 1);
    x1[x] = std::min(std::max(ix + 1, 0), sw - 1);
    wx[x] = t;
  }
  for (int y = 0; y < size; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int iy = static_cast<int>(std::floor(fy));
    float ty = fy - iy;
    const int y0 = std::min(std::max(iy, 0), sh - 1);
    const int y1 = std::min(std::max(iy + 1, 0), sh - 1);
    const uint8_t* r0 = src + static_cast<size_t>(y0) * sw * 3;
    const uint8_t* r1 = src + static_cast<size_t>(y1) * sw * 3;
    const int py = y / patch, iy_in = y % patch;
    for (int x = 0; x < size; ++x) {
      const int px = x / patch, ix_in = x % patch;
      uint8_t* dst = out + ((static_cast<size_t>(py) * grid + px) * patch
                            + iy_in) * patch * 3 + static_cast<size_t>(ix_in)
                             * 3;
      const float tx = wx[x];
      const uint8_t* p00 = r0 + x0[x] * 3;
      const uint8_t* p01 = r0 + x1[x] * 3;
      const uint8_t* p10 = r1 + x0[x] * 3;
      const uint8_t* p11 = r1 + x1[x] * 3;
      for (int c = 0; c < 3; ++c) {
        float top = p00[c] + (p01[c] - p00[c]) * tx;
        float bot = p10[c] + (p11[c] - p10[c]) * tx;
        float v = top + (bot - top) * ty;
        int q = static_cast<int>(v + 0.5f);
        dst[c] = static_cast<uint8_t>(std::min(std::max(q, 0), 255));
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode+resize+patchify ONE jpeg buffer. out must hold
// (size/patch)^2 * patch*patch*3 bytes. Returns 0 ok, nonzero on error.
int ip_jpeg_to_patches(const uint8_t* data, int64_t len, int size, int patch,
                       uint8_t* out) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!decode_jpeg(data, static_cast<size_t>(len), size, &rgb, &w, &h))
    return 1;
  resize_into_patches(rgb.data(), h, w, size, patch, out);
  return 0;
}

// Resize+patchify an already-decoded RGB u8 HWC image.
int ip_rgb_to_patches(const uint8_t* img, int h, int w, int size, int patch,
                      uint8_t* out) {
  if (h <= 0 || w <= 0 || size % patch != 0) return 1;
  resize_into_patches(img, h, w, size, patch, out);
  return 0;
}

// Batch: read n files, decode+resize+patchify each into
// out[i * plane] (plane = (size/patch)^2 * patch*patch*3), fanned out over
// n_threads. fail[i] set to 1 for unreadable/undecodable inputs (their
// out plane is zeroed). Returns the number of failures.
int ip_batch_files(const char* const* paths, int n, int size, int patch,
                   int n_threads, uint8_t* out, uint8_t* fail) {
  const size_t plane = static_cast<size_t>(size / patch) * (size / patch)
                       * patch * patch * 3;
  std::atomic<int> failures{0};
  n_threads = std::max(1, std::min(n_threads, n));

  auto work = [&](int t) {
    std::vector<uint8_t> buf;
    for (int i = t; i < n; i += n_threads) {
      fail[i] = 1;
      FILE* f = std::fopen(paths[i], "rb");
      if (f) {
        std::fseek(f, 0, SEEK_END);
        long sz = std::ftell(f);
        std::fseek(f, 0, SEEK_SET);
        if (sz > 0) {
          buf.resize(static_cast<size_t>(sz));
          if (std::fread(buf.data(), 1, buf.size(), f) == buf.size() &&
              ip_jpeg_to_patches(buf.data(), sz, size, patch,
                                 out + plane * i) == 0) {
            fail[i] = 0;
          }
        }
        std::fclose(f);
      }
      if (fail[i]) {
        std::memset(out + plane * i, 0, plane);
        failures.fetch_add(1, std::memory_order_relaxed);
      }
    }
  };
  if (n_threads == 1) {
    work(0);
  } else {
    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(work, t);
    for (auto& th : threads) th.join();
  }
  return failures.load();
}

}  // extern "C"
