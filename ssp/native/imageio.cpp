// Native host-side image loading for the data pipeline.
//
// The reference hides per-image decode cost behind 16 torch DataLoader
// workers (configs/*: training.workers_train); ssp's augmentation runs
// on device, so the only host work left is decode + resize + /255.
// This file provides that path natively — libjpeg/libpng decode to
// grayscale and an INTER_AREA-style box resize — callable through
// ctypes.  The call releases the GIL for its whole duration, so a small
// Python thread pool (ssp/data/prefetch.py) scales it across cores
// without multiprocessing.
//
// Grayscale conversion matches cv2.IMREAD_GRAYSCALE (ITU-R BT.601:
// 0.299 R + 0.587 G + 0.114 B).  Resize reproduces cv2.INTER_AREA for
// downscale (exact box integration with fractional edge weights) and
// bilinear for upscale — the reference resizes with INTER_AREA
// (datasets/Coco.py:158).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG file to 8-bit grayscale. Returns true on success.
bool decode_jpeg_gray(FILE* f, std::vector<uint8_t>* pixels, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_GRAYSCALE;  // libjpeg applies BT.601
  jpeg_start_decompress(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  pixels->resize(static_cast<size_t>(*h) * (*w));
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels->data() + static_cast<size_t>(cinfo.output_scanline) * (*w);
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Decode a PNG file to 8-bit grayscale.
bool decode_png_gray(FILE* f, std::vector<uint8_t>* pixels, int* h, int* w) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  // RGB → gray with BT.601 coefficients (cv2-compatible)
  int color = png_get_color_type(png, info);
  if (color & PNG_COLOR_MASK_COLOR) {
    png_set_rgb_to_gray_fixed(png, 1 /* silent error action */, 29900, 58700);
  }
  png_read_update_info(png, info);
  *h = png_get_image_height(png, info);
  *w = png_get_image_width(png, info);
  pixels->resize(static_cast<size_t>(*h) * (*w));
  std::vector<png_bytep> rows(*h);
  for (int i = 0; i < *h; ++i) rows[i] = pixels->data() + static_cast<size_t>(i) * (*w);
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// cv2.INTER_AREA-equivalent resize of an 8-bit grayscale image into a
// float [0, 1] buffer: each output pixel integrates the source box
// [x·sx, (x+1)·sx) × [y·sy, (y+1)·sy) with fractional edge weights.
// For upscale (scale < 1), falls back to bilinear, as cv2 does.
void resize_area_gray(const uint8_t* src, int sh, int sw,
                      float* dst, int dh, int dw) {
  const double sy = static_cast<double>(sh) / dh;
  const double sx = static_cast<double>(sw) / dw;
  if (sy < 1.0 || sx < 1.0) {
    // bilinear (align to pixel area centres like cv2's resize)
    for (int y = 0; y < dh; ++y) {
      double fy = (y + 0.5) * sy - 0.5;
      int y0 = static_cast<int>(std::floor(fy));
      double wy = fy - y0;
      int y1 = y0 + 1;
      y0 = y0 < 0 ? 0 : (y0 >= sh ? sh - 1 : y0);
      y1 = y1 < 0 ? 0 : (y1 >= sh ? sh - 1 : y1);
      for (int x = 0; x < dw; ++x) {
        double fx = (x + 0.5) * sx - 0.5;
        int x0 = static_cast<int>(std::floor(fx));
        double wx = fx - x0;
        int x1 = x0 + 1;
        x0 = x0 < 0 ? 0 : (x0 >= sw ? sw - 1 : x0);
        x1 = x1 < 0 ? 0 : (x1 >= sw ? sw - 1 : x1);
        double v = (1 - wy) * ((1 - wx) * src[y0 * sw + x0] + wx * src[y0 * sw + x1]) +
                   wy * ((1 - wx) * src[y1 * sw + x0] + wx * src[y1 * sw + x1]);
        dst[y * dw + x] = static_cast<float>(v / 255.0);
      }
    }
    return;
  }
  for (int y = 0; y < dh; ++y) {
    const double fy0 = y * sy, fy1 = (y + 1) * sy;
    const int iy0 = static_cast<int>(fy0), iy1 = static_cast<int>(std::ceil(fy1));
    for (int x = 0; x < dw; ++x) {
      const double fx0 = x * sx, fx1 = (x + 1) * sx;
      const int ix0 = static_cast<int>(fx0), ix1 = static_cast<int>(std::ceil(fx1));
      double acc = 0.0, area = 0.0;
      for (int yy = iy0; yy < iy1 && yy < sh; ++yy) {
        double hy = 1.0;
        if (yy < fy0) hy -= fy0 - yy;
        if (yy + 1 > fy1) hy -= (yy + 1) - fy1;
        const uint8_t* row = src + static_cast<size_t>(yy) * sw;
        for (int xx = ix0; xx < ix1 && xx < sw; ++xx) {
          double hx = 1.0;
          if (xx < fx0) hx -= fx0 - xx;
          if (xx + 1 > fx1) hx -= (xx + 1) - fx1;
          acc += hy * hx * row[xx];
          area += hy * hx;
        }
      }
      dst[y * dw + x] = static_cast<float>(acc / (area * 255.0));
    }
  }
}

}  // namespace

extern "C" {

// Decode ``path`` (JPEG or PNG, by magic bytes) to grayscale and resize
// to (out_h, out_w) into ``out`` (float [0, 1], row-major).  out_h/out_w
// of 0 mean "native size" — then call ssp_image_size first.
// Returns 0 on success, negative on failure.
int ssp_decode_gray_resize(const char* path, int out_h, int out_w, float* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  std::vector<uint8_t> pixels;
  int h = 0, w = 0;
  bool ok = false;
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg_gray(f, &pixels, &h, &w);
  } else if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    ok = decode_png_gray(f, &pixels, &h, &w);
  }
  fclose(f);
  if (!ok || h <= 0 || w <= 0) return -2;
  if (out_h <= 0 || out_w <= 0) {
    out_h = h;
    out_w = w;
  }
  if (out_h == h && out_w == w) {
    const size_t n = static_cast<size_t>(h) * w;
    for (size_t i = 0; i < n; ++i) out[i] = pixels[i] / 255.0f;
    return 0;
  }
  resize_area_gray(pixels.data(), h, w, out, out_h, out_w);
  return 0;
}

// Native (pre-resize) image dimensions; returns 0 on success.
// Header-only reads: a full decode just to learn the size doubled the
// per-image decode cost of the resize=None path.
int ssp_image_size(const char* path, int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    jpeg_decompress_struct cinfo;
    JpegErrorMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_error_exit;
    if (setjmp(jerr.setjmp_buffer)) {
      jpeg_destroy_decompress(&cinfo);
      fclose(f);
      return -2;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    *h = cinfo.image_height;
    *w = cinfo.image_width;
    jpeg_destroy_decompress(&cinfo);
    ok = true;
  } else if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    png_structp png =
        png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    png_infop info = png ? png_create_info_struct(png) : nullptr;
    if (png && info && !setjmp(png_jmpbuf(png))) {
      png_init_io(png, f);
      png_read_info(png, info);
      *h = png_get_image_height(png, info);
      *w = png_get_image_width(png, info);
      ok = true;
    }
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
  }
  fclose(f);
  return ok ? 0 : -2;
}

}  // extern "C"
