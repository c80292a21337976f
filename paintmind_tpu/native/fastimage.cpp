// Native host-side image pipeline: JPEG decode + antialiased bicubic resize
// + crop/flip + [-1,1] float32 normalize, batch-parallel with std::thread.
//
// This is the framework's native data-loading tier: the reference delegates
// this work to PIL/torchvision on the Python side
// (reference paintmind/utils/transform.py, utils/datasets.py); here the
// decode→preprocess hot loop runs in C++ so host CPUs keep the TPU fed.
// The resize implements PIL-compatible separable cubic resampling
// (Catmull-Rom a=-0.5 with support scaling on downscale, i.e. antialiased),
// so outputs match the host/PIL transform within float tolerance.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdio>  // jpeglib.h needs FILE declared first

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG buffer to packed RGB8. Returns true on success.
bool DecodeJpeg(const uint8_t* data, size_t len, std::vector<uint8_t>* out,
                int* h, int* w) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  out->resize(size_t(*h) * *w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + size_t(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

inline double CubicKernel(double x) {  // Catmull-Rom, a = -0.5 (PIL BICUBIC)
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

// PIL-style separable resample along one axis with support scaling.
struct Taps {
  std::vector<int> start;      // first source index per output pixel
  std::vector<int> count;      // number of taps
  std::vector<double> weight;  // taps, row-major [out][count]
  int max_count = 0;
};

Taps BuildTaps(int in_size, int out_size) {
  Taps t;
  double scale = double(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);  // antialias on downscale
  double support = 2.0 * filterscale;
  t.max_count = int(std::ceil(support)) * 2 + 1;
  t.start.resize(out_size);
  t.count.resize(out_size);
  t.weight.assign(size_t(out_size) * t.max_count, 0.0);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = std::max(0, int(center - support + 0.5));
    int xmax = std::min(in_size, int(center + support + 0.5));
    double sum = 0.0;
    int n = xmax - xmin;
    for (int i = 0; i < n; ++i) {
      double wgt = CubicKernel((xmin + i - center + 0.5) / filterscale);
      t.weight[size_t(xx) * t.max_count + i] = wgt;
      sum += wgt;
    }
    if (sum != 0.0) {
      for (int i = 0; i < n; ++i) t.weight[size_t(xx) * t.max_count + i] /= sum;
    }
    t.start[xx] = xmin;
    t.count[xx] = n;
  }
  return t;
}

// Resize RGB float image (h, w, 3) -> (oh, ow, 3), separable.
void ResizeBicubic(const float* src, int h, int w, float* dst, int oh,
                   int ow) {
  Taps tx = BuildTaps(w, ow);
  Taps ty = BuildTaps(h, oh);
  std::vector<float> tmp(size_t(h) * ow * 3);  // horizontal pass first
  for (int y = 0; y < h; ++y) {
    const float* srow = src + size_t(y) * w * 3;
    float* trow = tmp.data() + size_t(y) * ow * 3;
    for (int x = 0; x < ow; ++x) {
      const double* wt = &tx.weight[size_t(x) * tx.max_count];
      int s0 = tx.start[x], n = tx.count[x];
      double acc0 = 0, acc1 = 0, acc2 = 0;
      for (int i = 0; i < n; ++i) {
        const float* p = srow + size_t(s0 + i) * 3;
        acc0 += wt[i] * p[0];
        acc1 += wt[i] * p[1];
        acc2 += wt[i] * p[2];
      }
      trow[x * 3 + 0] = float(acc0);
      trow[x * 3 + 1] = float(acc1);
      trow[x * 3 + 2] = float(acc2);
    }
  }
  for (int y = 0; y < oh; ++y) {
    const double* wt = &ty.weight[size_t(y) * ty.max_count];
    int s0 = ty.start[y], n = ty.count[y];
    float* drow = dst + size_t(y) * ow * 3;
    for (int x = 0; x < ow * 3; ++x) {
      double acc = 0;
      for (int i = 0; i < n; ++i)
        acc += wt[i] * tmp[size_t(s0 + i) * ow * 3 + x];
      drow[x] = float(acc);
    }
  }
}

// Full single-image pipeline: RGB8 (h, w) -> resize (rs, rs) -> crop
// (top, left, cs) -> optional hflip -> float32 [-1, 1] HWC into out.
void PreprocessOne(const uint8_t* rgb, int h, int w, int rs, int cs, int top,
                   int left, int flip, float* out) {
  std::vector<float> asfloat(size_t(h) * w * 3);
  for (size_t i = 0; i < asfloat.size(); ++i)
    asfloat[i] = rgb[i] * (1.0f / 255.0f);
  std::vector<float> resized(size_t(rs) * rs * 3);
  ResizeBicubic(asfloat.data(), h, w, resized.data(), rs, rs);
  for (int y = 0; y < cs; ++y) {
    for (int x = 0; x < cs; ++x) {
      int sx = flip ? (left + cs - 1 - x) : (left + x);
      const float* p = &resized[(size_t(top + y) * rs + sx) * 3];
      float* q = out + (size_t(y) * cs + x) * 3;
      for (int c = 0; c < 3; ++c) {
        float v = std::min(std::max(p[c], 0.0f), 1.0f);
        q[c] = v * 2.0f - 1.0f;
      }
    }
  }
}

void ParallelFor(int n, int num_threads, const std::function<void(int)>& fn) {
  num_threads = std::max(1, std::min(num_threads, n));
  if (num_threads == 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::vector<std::thread> threads;
  std::atomic<int> next{0};
  for (int t = 0; t < num_threads; ++t) {
    threads.emplace_back([&] {
      int i;
      while ((i = next.fetch_add(1)) < n) fn(i);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Decode+preprocess a batch of JPEG buffers.
//   datas/lens: n JPEG byte buffers
//   rs: resize edge (img_size/scale); cs: crop size; tops/lefts: per-image
//   crop offsets; flips: per-image 0/1; out: (n, cs, cs, 3) float32.
// Returns number of failed decodes (failed slots are zero-filled).
int pm_batch_decode_preprocess(const uint8_t** datas, const size_t* lens,
                               int n, int rs, int cs, const int* tops,
                               const int* lefts, const uint8_t* flips,
                               float* out, int num_threads) {
  std::atomic<int> failures{0};
  ParallelFor(n, num_threads, [&](int i) {
    std::vector<uint8_t> rgb;
    int h = 0, w = 0;
    float* dst = out + size_t(i) * cs * cs * 3;
    if (!DecodeJpeg(datas[i], lens[i], &rgb, &h, &w)) {
      std::memset(dst, 0, size_t(cs) * cs * 3 * sizeof(float));
      failures.fetch_add(1);
      return;
    }
    PreprocessOne(rgb.data(), h, w, rs, cs, tops[i], lefts[i], flips[i], dst);
  });
  return failures.load();
}

// Preprocess raw RGB8 images already in memory: imgs[i] is (hs[i], ws[i], 3).
int pm_batch_preprocess_rgb(const uint8_t** imgs, const int* hs, const int* ws,
                            int n, int rs, int cs, const int* tops,
                            const int* lefts, const uint8_t* flips, float* out,
                            int num_threads) {
  ParallelFor(n, num_threads, [&](int i) {
    PreprocessOne(imgs[i], hs[i], ws[i], rs, cs, tops[i], lefts[i], flips[i],
                  out + size_t(i) * cs * cs * 3);
  });
  return 0;
}

// Single JPEG probe: returns 0 on success and fills h/w.
int pm_jpeg_shape(const uint8_t* data, size_t len, int* h, int* w) {
  std::vector<uint8_t> rgb;  // decode to validate (cheap header-only path
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  *h = cinfo.image_height;
  *w = cinfo.image_width;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // extern "C"
