// Native JPEG decode + PIL-equivalent triangle-filter resize.
//
// The input pipeline's host hot path (reference C2/C6: torchvision decode +
// Resize((S,S), BILINEAR), our data/preprocessing.py:68-75) measured at
// ~229 img/s/core through PIL on this host; libjpeg + a tight separable
// resampler roughly doubles that, which directly moves the v5e-8 feed
// capacity model (BACKLOG "Input pipeline").
//
// Resize semantics replicate Pillow's antialiased BILINEAR (triangle filter
// with support scaled by the reduction factor, separable H-then-V passes,
// per-row weight normalization). Accumulation is float64 with
// round-to-nearest, so outputs may differ from Pillow's int16 fixed-point
// path by at most 1 LSB per channel — enforced by tests/test_native_image.py.
//
// Optional `prescale` uses libjpeg's DCT-domain 1/2^k scaling before the
// filter (Pillow's `draft` mode does the same): ~3-4x faster on large
// photos, pixel values no longer byte-comparable to the exact path.
//
// C ABI only (ctypes binding in pgica_tpu/data/native_image.py).

#include <csetjmp>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit_throw(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Pillow triangle filter: f(x) = 1-|x| on [-1, 1].
inline double triangle(double x) {
  if (x < 0) x = -x;
  return x < 1.0 ? 1.0 - x : 0.0;
}

// One separable resampling pass: in (rows x in_len x 3) -> out (rows x
// out_len x 3) along the second axis. Mirrors Pillow's coefficient
// construction (ResampleHorizontal in Resample.c) in float.
void resample_axis(const float* in, int rows, int in_len, int out_len,
                   float* out) {
  const double scale = static_cast<double>(in_len) / out_len;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 1.0 * filterscale;  // bilinear support = 1
  const int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;

  std::vector<int> bounds(out_len * 2);
  std::vector<double> kk(out_len * ksize, 0.0);
  for (int xx = 0; xx < out_len; ++xx) {
    double center = (xx + 0.5) * scale;
    double ww = 0.0;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_len) xmax = in_len;
    xmax -= xmin;
    double* k = &kk[xx * ksize];
    for (int x = 0; x < xmax; ++x) {
      double w = triangle((x + xmin - center + 0.5) / filterscale);
      k[x] = w;
      ww += w;
    }
    if (ww != 0.0)
      for (int x = 0; x < xmax; ++x) k[x] /= ww;
    bounds[xx * 2 + 0] = xmin;
    bounds[xx * 2 + 1] = xmax;
  }

  for (int r = 0; r < rows; ++r) {
    const float* row = in + static_cast<size_t>(r) * in_len * 3;
    float* orow = out + static_cast<size_t>(r) * out_len * 3;
    for (int xx = 0; xx < out_len; ++xx) {
      const int xmin = bounds[xx * 2 + 0];
      const int xmax = bounds[xx * 2 + 1];
      const double* k = &kk[xx * ksize];
      double acc0 = 0, acc1 = 0, acc2 = 0;
      for (int x = 0; x < xmax; ++x) {
        const float* px = row + static_cast<size_t>(x + xmin) * 3;
        acc0 += px[0] * k[x];
        acc1 += px[1] * k[x];
        acc2 += px[2] * k[x];
      }
      orow[xx * 3 + 0] = static_cast<float>(acc0);
      orow[xx * 3 + 1] = static_cast<float>(acc1);
      orow[xx * 3 + 2] = static_cast<float>(acc2);
    }
  }
}

inline uint8_t clip8(double v) {
  double r = std::nearbyint(v);
  if (r < 0) return 0;
  if (r > 255) return 255;
  return static_cast<uint8_t>(r);
}

}  // namespace

extern "C" {

// Resize an RGB u8 image (h x w x 3) to (size x size x 3), Pillow-BILINEAR
// semantics. Returns 0 on success.
//
// Horizontal pass resamples within rows; the vertical pass accumulates
// whole rows (axpy over contiguous out_w*3 floats — auto-vectorizes),
// matching Pillow's transpose-free structure.
int pgica_resize_rgb(const uint8_t* in, int h, int w, int size, uint8_t* out) {
  if (!in || !out || h <= 0 || w <= 0 || size <= 0) return 1;
  std::vector<float> src(static_cast<size_t>(h) * w * 3);
  for (size_t i = 0; i < src.size(); ++i) src[i] = in[i];

  // Horizontal pass: (h x w) -> (h x size)
  std::vector<float> tmp(static_cast<size_t>(h) * size * 3);
  resample_axis(src.data(), h, w, size, tmp.data());

  // Vertical pass: weights over input rows, accumulated row-wise.
  const double scale = static_cast<double>(h) / size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 1.0 * filterscale;
  const int row_len = size * 3;
  std::vector<double> acc(row_len);
  for (int yy = 0; yy < size; ++yy) {
    double center = (yy + 0.5) * scale;
    int ymin = static_cast<int>(center - support + 0.5);
    if (ymin < 0) ymin = 0;
    int ymax = static_cast<int>(center + support + 0.5);
    if (ymax > h) ymax = h;
    ymax -= ymin;
    double ww = 0.0;
    std::vector<double> k(ymax);
    for (int y = 0; y < ymax; ++y) {
      k[y] = triangle((y + ymin - center + 0.5) / filterscale);
      ww += k[y];
    }
    if (ww != 0.0)
      for (int y = 0; y < ymax; ++y) k[y] /= ww;

    std::memset(acc.data(), 0, sizeof(double) * row_len);
    for (int y = 0; y < ymax; ++y) {
      const float* row = tmp.data() + static_cast<size_t>(y + ymin) * row_len;
      const double kv = k[y];
      for (int i = 0; i < row_len; ++i) acc[i] += row[i] * kv;
    }
    uint8_t* orow = out + static_cast<size_t>(yy) * row_len;
    for (int i = 0; i < row_len; ++i) orow[i] = clip8(acc[i]);
  }
  return 0;
}

// Decode a JPEG byte buffer and resize to (size x size x 3) RGB u8.
// prescale != 0 enables DCT-domain 1/2^k pre-scaling (fast path; pixels not
// byte-identical to the exact path). Returns 0 ok, nonzero on error (caller
// falls back to PIL).
int pgica_decode_resize_jpeg(const uint8_t* data, int len, int size,
                             int prescale, uint8_t* out) {
  if (!data || len <= 0 || size <= 0 || !out) return 1;
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit_throw;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 2;  // corrupt / unsupported stream
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 3;
  }
  cinfo.out_color_space = JCS_RGB;  // libjpeg converts gray/YCbCr; else fail
  if (prescale) {
    // Largest 1/2^k scale that stays >= 2x the target on both axes keeps
    // the triangle filter in charge of the final bandlimiting.
    cinfo.scale_num = 1;
    cinfo.scale_denom = 1;
    while (cinfo.scale_denom < 8 &&
           static_cast<int>(cinfo.image_width) / (cinfo.scale_denom * 2) >= 2 * size &&
           static_cast<int>(cinfo.image_height) / (cinfo.scale_denom * 2) >= 2 * size)
      cinfo.scale_denom *= 2;
  }
  if (!jpeg_start_decompress(&cinfo)) {
    jpeg_destroy_decompress(&cinfo);
    return 4;
  }
  if (cinfo.output_components != 3) {
    jpeg_destroy_decompress(&cinfo);
    return 5;
  }
  const int w = cinfo.output_width, h = cinfo.output_height;
  std::vector<uint8_t> rgb(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* rowp = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &rowp, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return pgica_resize_rgb(rgb.data(), h, w, size, out);
}

}  // extern "C"
