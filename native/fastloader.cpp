// Native data loader: threaded PNG/JPEG decode + resize for the host input
// pipeline. The reference feeds training through cv2 + torch DataLoader worker
// *processes* (reference dataset.py:9-148, trains.py:291-302); this library is
// the framework's native equivalent — a GIL-free thread pool decoding and
// resizing a whole batch into one caller-provided buffer, exposed through a C
// ABI consumed via ctypes (pytorch_nested_unet_tpu/data/native.py).
//
// Semantics match the Python/cv2 path:
//   - images decode to 3-channel BGR uint8 (cv2.imread default), gray is
//     replicated, alpha is dropped;
//   - masks decode to 1-channel grayscale uint8 (cv2.IMREAD_GRAYSCALE, BT.601
//     luma for color inputs);
//   - resize: bilinear with half-pixel centers (cv2 INTER_LINEAR) for images,
//     nearest (floor indexing, cv2 INTER_NEAREST) for masks.
//
// Build: native/build.sh  (g++ -O3 -shared -fPIC, links libpng/libjpeg).

#include <png.h>

#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <atomic>
#include <string>
#include <thread>
#include <vector>

extern "C" {
#include <jpeglib.h>
}

namespace {

struct Image {
  std::vector<unsigned char> data;  // interleaved, row-major
  int h = 0, w = 0, c = 0;          // c: 1 (gray) or 3 (BGR)
};

// ---------- PNG ----------

bool decode_png(const char* path, int want_channels, Image* out) {
  png_image img;
  std::memset(&img, 0, sizeof(img));
  img.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&img, path)) return false;
  img.format = (want_channels == 1) ? PNG_FORMAT_GRAY : PNG_FORMAT_BGR;
  out->h = static_cast<int>(img.height);
  out->w = static_cast<int>(img.width);
  out->c = want_channels;
  out->data.resize(PNG_IMAGE_SIZE(img));
  if (!png_image_finish_read(&img, nullptr, out->data.data(), 0, nullptr)) {
    png_image_free(&img);
    return false;
  }
  return true;
}

// ---------- JPEG ----------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(const char* path, int want_channels, Image* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = (want_channels == 1) ? JCS_GRAYSCALE : JCS_EXT_BGR;
  jpeg_start_decompress(&cinfo);
  out->h = static_cast<int>(cinfo.output_height);
  out->w = static_cast<int>(cinfo.output_width);
  out->c = want_channels;
  out->data.resize(static_cast<size_t>(out->h) * out->w * out->c);
  const size_t stride = static_cast<size_t>(out->w) * out->c;
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out->data.data() + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

bool decode(const char* path, int want_channels, Image* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  unsigned char magic[4] = {0, 0, 0, 0};
  size_t got = std::fread(magic, 1, 4, f);
  std::fclose(f);
  if (got < 4) return false;
  if (magic[0] == 0x89 && magic[1] == 'P') return decode_png(path, want_channels, out);
  if (magic[0] == 0xFF && magic[1] == 0xD8) return decode_jpeg(path, want_channels, out);
  return false;
}

// ---------- resize ----------

// Bilinear, half-pixel centers (cv2 INTER_LINEAR / torch align_corners=False).
void resize_bilinear_u8(const Image& src, unsigned char* dst, int oh, int ow) {
  const int c = src.c;
  const double sy = static_cast<double>(src.h) / oh;
  const double sx = static_cast<double>(src.w) / ow;
  for (int y = 0; y < oh; ++y) {
    double fy = (y + 0.5) * sy - 0.5;
    if (fy < 0) fy = 0;
    int y0 = static_cast<int>(fy);
    if (y0 > src.h - 1) y0 = src.h - 1;
    int y1 = y0 + 1 < src.h ? y0 + 1 : src.h - 1;
    const double wy = fy - y0;
    for (int x = 0; x < ow; ++x) {
      double fx = (x + 0.5) * sx - 0.5;
      if (fx < 0) fx = 0;
      int x0 = static_cast<int>(fx);
      if (x0 > src.w - 1) x0 = src.w - 1;
      int x1 = x0 + 1 < src.w ? x0 + 1 : src.w - 1;
      const double wx = fx - x0;
      const unsigned char* p00 = &src.data[(static_cast<size_t>(y0) * src.w + x0) * c];
      const unsigned char* p01 = &src.data[(static_cast<size_t>(y0) * src.w + x1) * c];
      const unsigned char* p10 = &src.data[(static_cast<size_t>(y1) * src.w + x0) * c];
      const unsigned char* p11 = &src.data[(static_cast<size_t>(y1) * src.w + x1) * c];
      unsigned char* q = dst + (static_cast<size_t>(y) * ow + x) * c;
      for (int k = 0; k < c; ++k) {
        const double v = (1 - wy) * ((1 - wx) * p00[k] + wx * p01[k]) +
                         wy * ((1 - wx) * p10[k] + wx * p11[k]);
        int r = static_cast<int>(std::lround(v));
        q[k] = static_cast<unsigned char>(r < 0 ? 0 : (r > 255 ? 255 : r));
      }
    }
  }
}

// Nearest, floor indexing (cv2 INTER_NEAREST / torch 'nearest').
void resize_nearest_u8(const Image& src, unsigned char* dst, int oh, int ow) {
  const int c = src.c;
  for (int y = 0; y < oh; ++y) {
    int yy = static_cast<int>(static_cast<double>(y) * src.h / oh);
    if (yy > src.h - 1) yy = src.h - 1;
    for (int x = 0; x < ow; ++x) {
      int xx = static_cast<int>(static_cast<double>(x) * src.w / ow);
      if (xx > src.w - 1) xx = src.w - 1;
      std::memcpy(dst + (static_cast<size_t>(y) * ow + x) * c,
                  &src.data[(static_cast<size_t>(yy) * src.w + xx) * c], c);
    }
  }
}

}  // namespace

extern "C" {

int nu_version() { return 1; }

// Decode n images into out (n, out_h, out_w, channels) uint8, resizing when
// the source size differs. nearest != 0 selects nearest interpolation.
// Returns 0 on success, or 1-based index of the first failing path.
int nu_load_batch(const char** paths, int n, unsigned char* out, int out_h,
                  int out_w, int channels, int nearest, int num_threads) {
  std::atomic<int> failed(0);
  std::atomic<int> next(0);
  const size_t img_bytes = static_cast<size_t>(out_h) * out_w * channels;

  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n || failed.load()) return;
      Image im;
      if (!decode(paths[i], channels, &im)) {
        int expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
        return;
      }
      unsigned char* dst = out + static_cast<size_t>(i) * img_bytes;
      if (im.h == out_h && im.w == out_w) {
        std::memcpy(dst, im.data.data(), img_bytes);
      } else if (nearest) {
        resize_nearest_u8(im, dst, out_h, out_w);
      } else {
        resize_bilinear_u8(im, dst, out_h, out_w);
      }
    }
  };

  int nthreads = num_threads > 0 ? num_threads
                                 : static_cast<int>(std::thread::hardware_concurrency());
  if (nthreads < 1) nthreads = 1;
  if (nthreads > n) nthreads = n;
  std::vector<std::thread> pool;
  pool.reserve(nthreads);
  for (int t = 0; t < nthreads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failed.load();
}

// Union per-instance masks (threshold >127) into one binary mask * 255 —
// the DSB2018 offline preprocessing inner loop (reference
// preprocess_dsb2018.py:33-36). masks: (n, h, w) uint8; out: (h, w) uint8.
void nu_union_masks(const unsigned char* masks, int n, long long hw,
                    unsigned char* out) {
  std::memset(out, 0, hw);
  for (int i = 0; i < n; ++i) {
    const unsigned char* m = masks + static_cast<size_t>(i) * hw;
    for (long long j = 0; j < hw; ++j) {
      if (m[j] > 127) out[j] = 255;
    }
  }
}

}  // extern "C"
