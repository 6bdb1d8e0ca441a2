// emmloader — native data-loader core for exploremultimodal_tpu.
//
// TPU-native replacement of the reference's torch-DataLoader C++ workers +
// cv2 decode path (SURVEY.md §2.4): JPEG decode (libjpeg) + random-resized
// crop + bilinear resize to the backbone (224) and dVAE (112) streams, for a
// whole batch, on an internal C++ thread pool. Called from Python via ctypes;
// the GIL is released for the entire batch. Crop boxes are computed in Python
// (data/transforms.py random_resized_crop_params) so augmentation RNG stays
// in one place.
//
// Build: make -C native   →  native/libemmloader.so
//
// C ABI:
//   int emm_decode_resize_batch(
//       const uint8_t* const* jpeg_data, const int64_t* jpeg_sizes, int n,
//       const int* crop_boxes,   // n×4 (left, top, w, h); w<=0 → full image
//       uint8_t* out1, int size1,              // n×size1×size1×3, RGB
//       uint8_t* out2, int size2,              // n×size2×size2×3; size2<=0 → skip
//       int* status,                            // n; 0 ok, nonzero = decode error
//       int num_threads);
//   returns the number of failed images.

#include <cstdio>
#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG byte buffer into an RGB8 image. Returns false on error.
bool decode_jpeg(const uint8_t* data, int64_t size, std::vector<uint8_t>* rgb,
                 int* width, int* height) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(size));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;  // libjpeg converts gray/YCbCr for us
  jpeg_start_decompress(&cinfo);
  *width = cinfo.output_width;
  *height = cinfo.output_height;
  if (*width <= 0 || *height <= 0 || cinfo.output_components != 3) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  rgb->resize(static_cast<size_t>(*width) * *height * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb->data() + static_cast<size_t>(cinfo.output_scanline) * *width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Separable triangle-filter resample (PIL BILINEAR convolution semantics:
// the filter support scales with the downscale ratio, so minification
// averages instead of point-sampling). Two passes: horizontal then vertical.
struct FilterTaps {
  std::vector<int> start;    // first source index per output pixel
  std::vector<int> count;    // taps per output pixel
  std::vector<float> coeff;  // taps, concatenated (max_count stride)
  int max_count = 0;
};

FilterTaps build_taps(int in_origin, int in_size, int bound, int out_size) {
  FilterTaps t;
  const float scale = static_cast<float>(in_size) / out_size;
  const float support = std::max(1.0f, scale);  // triangle filter, radius 1
  t.max_count = static_cast<int>(std::ceil(support)) * 2 + 1;
  t.start.resize(out_size);
  t.count.resize(out_size);
  t.coeff.assign(static_cast<size_t>(out_size) * t.max_count, 0.0f);
  for (int o = 0; o < out_size; ++o) {
    const float center = in_origin + (o + 0.5f) * scale;
    int lo = std::max(static_cast<int>(center - support + 0.5f), 0);
    int hi = std::min(static_cast<int>(center + support + 0.5f), bound);
    if (hi <= lo) {
      lo = std::clamp(lo, 0, bound - 1);
      hi = lo + 1;
    }
    float sum = 0.0f;
    for (int i = lo; i < hi; ++i) {
      float x = std::fabs((i + 0.5f - center) / support);
      float w = x < 1.0f ? 1.0f - x : 0.0f;
      t.coeff[static_cast<size_t>(o) * t.max_count + (i - lo)] = w;
      sum += w;
    }
    if (sum > 0) {
      for (int i = 0; i < hi - lo; ++i) {
        t.coeff[static_cast<size_t>(o) * t.max_count + i] /= sum;
      }
    }
    t.start[o] = lo;
    t.count[o] = hi - lo;
  }
  return t;
}

void resize_bilinear(const uint8_t* src, int src_w, int src_h, int left,
                     int top, int crop_w, int crop_h, uint8_t* dst,
                     int out_size) {
  FilterTaps hx = build_taps(left, crop_w, src_w, out_size);
  FilterTaps vy = build_taps(top, crop_h, src_h, out_size);

  // horizontal pass over the rows the vertical pass will touch
  const int row_lo = vy.start[0];
  const int row_hi = vy.start[out_size - 1] + vy.count[out_size - 1];
  const int n_rows = row_hi - row_lo;
  std::vector<float> tmp(static_cast<size_t>(n_rows) * out_size * 3);
  for (int y = 0; y < n_rows; ++y) {
    const uint8_t* row = src + static_cast<size_t>(row_lo + y) * src_w * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * out_size * 3;
    for (int o = 0; o < out_size; ++o) {
      const float* co = hx.coeff.data() + static_cast<size_t>(o) * hx.max_count;
      float r = 0, g = 0, b = 0;
      const uint8_t* p = row + static_cast<size_t>(hx.start[o]) * 3;
      for (int i = 0; i < hx.count[o]; ++i, p += 3) {
        r += co[i] * p[0];
        g += co[i] * p[1];
        b += co[i] * p[2];
      }
      trow[o * 3] = r;
      trow[o * 3 + 1] = g;
      trow[o * 3 + 2] = b;
    }
  }
  // vertical pass
  for (int oy = 0; oy < out_size; ++oy) {
    const float* co = vy.coeff.data() + static_cast<size_t>(oy) * vy.max_count;
    const int base = vy.start[oy] - row_lo;
    uint8_t* out = dst + static_cast<size_t>(oy) * out_size * 3;
    for (int ox = 0; ox < out_size * 3; ++ox) {
      float v = 0;
      for (int i = 0; i < vy.count[oy]; ++i) {
        v += co[i] * tmp[static_cast<size_t>(base + i) * out_size * 3 + ox];
      }
      out[ox] = static_cast<uint8_t>(std::lround(std::clamp(v, 0.0f, 255.0f)));
    }
  }
}

}  // namespace

extern "C" {

int emm_decode_resize_batch(const uint8_t* const* jpeg_data,
                            const int64_t* jpeg_sizes, int n,
                            const int* crop_boxes, uint8_t* out1, int size1,
                            uint8_t* out2, int size2, int* status,
                            int num_threads) {
  std::atomic<int> next(0);
  std::atomic<int> failures(0);

  auto worker = [&]() {
    std::vector<uint8_t> rgb;
    int w = 0, h = 0;
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      status[i] = 0;
      if (!decode_jpeg(jpeg_data[i], jpeg_sizes[i], &rgb, &w, &h)) {
        status[i] = 1;
        failures.fetch_add(1);
        std::memset(out1 + static_cast<size_t>(i) * size1 * size1 * 3, 0,
                    static_cast<size_t>(size1) * size1 * 3);
        if (out2 != nullptr && size2 > 0) {
          std::memset(out2 + static_cast<size_t>(i) * size2 * size2 * 3, 0,
                      static_cast<size_t>(size2) * size2 * 3);
        }
        continue;
      }
      int left = crop_boxes[4 * i], top = crop_boxes[4 * i + 1];
      int cw = crop_boxes[4 * i + 2], ch = crop_boxes[4 * i + 3];
      if (cw <= 0 || ch <= 0) {
        left = 0;
        top = 0;
        cw = w;
        ch = h;
      }
      resize_bilinear(rgb.data(), w, h, left, top, cw, ch,
                      out1 + static_cast<size_t>(i) * size1 * size1 * 3, size1);
      if (out2 != nullptr && size2 > 0) {
        resize_bilinear(rgb.data(), w, h, left, top, cw, ch,
                        out2 + static_cast<size_t>(i) * size2 * size2 * 3,
                        size2);
      }
    }
  };

  int threads = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return failures.load();
}

}  // extern "C"
