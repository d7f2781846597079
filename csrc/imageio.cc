// Native image IO: threaded JPEG/PNG decode + downscale + grayscale.
//
// The C++ runtime piece of the framework's IO path — the role the
// reference fills natively with cv::imread + cv::resize over a directory
// (SfMToyLib/SfM.cpp:98-138) and the legacy POSIX directory loader
// (legacy/SfMToyLib_Old/Common.cpp:150-235). Decoding is fanned out over
// a std::thread pool (the reference's hardware_concurrency-1 idiom,
// SfM.cpp:186); output is written straight into caller-provided buffers
// so the Python side (ctypes) does zero copies.
//
// Exposed C ABI:
//   tpusfm_load_images(paths, n, target_h, target_w, rgb_out, gray_out,
//                      n_threads) -> number successfully decoded
// rgb_out:  n * target_h * target_w * 3 uint8
// gray_out: n * target_h * target_w float32 in [0, 1]

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<unsigned char> rgb;  // h*w*3
  bool ok = false;
};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

Image decode_jpeg(FILE* f) {
  Image img;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return img;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img.w = cinfo.output_width;
  img.h = cinfo.output_height;
  img.rgb.resize(size_t(img.w) * img.h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = img.rgb.data() + size_t(cinfo.output_scanline) * img.w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  img.ok = true;
  return img;
}

Image decode_png(FILE* f) {
  Image img;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return img;
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return img;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_expand(png);
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  img.w = png_get_image_width(png, info);
  img.h = png_get_image_height(png, info);
  img.rgb.resize(size_t(img.w) * img.h * 3);
  std::vector<png_bytep> rows(img.h);
  for (int y = 0; y < img.h; y++) rows[y] = img.rgb.data() + size_t(y) * img.w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  img.ok = true;
  return img;
}

Image decode_file(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return {};
  unsigned char magic[8] = {0};
  size_t got = std::fread(magic, 1, 8, f);
  std::rewind(f);
  Image img;
  if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8) {
    img = decode_jpeg(f);
  } else if (got >= 8 && !png_sig_cmp(magic, 0, 8)) {
    img = decode_png(f);
  }
  std::fclose(f);
  return img;
}

// Bilinear resample src (h*w*3) to (th*tw*3).
void resize_rgb(const Image& src, int th, int tw, unsigned char* out) {
  const double sy = double(src.h) / th;
  const double sx = double(src.w) / tw;
  for (int y = 0; y < th; y++) {
    double fy = (y + 0.5) * sy - 0.5;
    int y0 = int(std::floor(fy));
    double wy = fy - y0;
    int y1 = y0 + 1;
    if (y0 < 0) y0 = 0;
    if (y1 >= src.h) y1 = src.h - 1;
    if (y0 >= src.h) y0 = src.h - 1;
    for (int x = 0; x < tw; x++) {
      double fx = (x + 0.5) * sx - 0.5;
      int x0 = int(std::floor(fx));
      double wx = fx - x0;
      int x1 = x0 + 1;
      if (x0 < 0) x0 = 0;
      if (x1 >= src.w) x1 = src.w - 1;
      if (x0 >= src.w) x0 = src.w - 1;
      for (int c = 0; c < 3; c++) {
        double v = (1 - wy) * ((1 - wx) * src.rgb[(size_t(y0) * src.w + x0) * 3 + c] +
                               wx * src.rgb[(size_t(y0) * src.w + x1) * 3 + c]) +
                   wy * ((1 - wx) * src.rgb[(size_t(y1) * src.w + x0) * 3 + c] +
                         wx * src.rgb[(size_t(y1) * src.w + x1) * 3 + c]);
        out[(size_t(y) * tw + x) * 3 + c] = (unsigned char)(v + 0.5);
      }
    }
  }
}

}  // namespace

extern "C" int tpusfm_load_images(const char** paths, int n, int target_h,
                                  int target_w, unsigned char* rgb_out,
                                  float* gray_out, int n_threads) {
  std::atomic<int> next(0), n_ok(0);
  if (n_threads <= 0) {
    n_threads = int(std::thread::hardware_concurrency());
    if (n_threads > 1) n_threads -= 1;  // reference idiom, SfM.cpp:186
  }
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      Image img = decode_file(paths[i]);
      if (!img.ok) continue;
      unsigned char* rgb = rgb_out + size_t(i) * target_h * target_w * 3;
      if (img.h == target_h && img.w == target_w) {
        std::memcpy(rgb, img.rgb.data(), size_t(target_h) * target_w * 3);
      } else {
        resize_rgb(img, target_h, target_w, rgb);
      }
      float* gray = gray_out + size_t(i) * target_h * target_w;
      const size_t npx = size_t(target_h) * target_w;
      for (size_t p = 0; p < npx; p++) {
        gray[p] = (0.299f * rgb[p * 3] + 0.587f * rgb[p * 3 + 1] +
                   0.114f * rgb[p * 3 + 2]) / 255.0f;
      }
      n_ok.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; t++) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return n_ok.load();
}

extern "C" int tpusfm_image_size(const char* path, int* h, int* w) {
  // Header-only reads: JPEG stops after jpeg_read_header (no scanline
  // decode), PNG after the IHDR chunk — O(KB) of IO instead of decoding
  // the whole frame just to learn its dimensions.
  FILE* f = fopen(path, "rb");
  if (!f) return 0;
  unsigned char sig[8] = {0};
  size_t got = fread(sig, 1, 8, f);
  rewind(f);
  int ok = 0;
  if (got >= 2 && sig[0] == 0xFF && sig[1] == 0xD8) {  // JPEG
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (!setjmp(jerr.jump)) {
      jpeg_create_decompress(&cinfo);
      jpeg_stdio_src(&cinfo, f);
      jpeg_read_header(&cinfo, TRUE);
      *w = cinfo.image_width;
      *h = cinfo.image_height;
      ok = 1;
    }
    jpeg_destroy_decompress(&cinfo);
  } else if (got >= 8 && png_sig_cmp(sig, 0, 8) == 0) {  // PNG
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    png_infop info = png ? png_create_info_struct(png) : nullptr;
    if (png && info && !setjmp(png_jmpbuf(png))) {
      png_init_io(png, f);
      png_read_info(png, info);
      *w = int(png_get_image_width(png, info));
      *h = int(png_get_image_height(png, info));
      ok = 1;
    }
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
  }
  fclose(f);
  return ok;
}
