// Native data-loader core: JPEG/PNG decode + PIL-compatible triangle
// ("bilinear") resize + a GIL-free thread-pool batch API.
//
// TPU-native replacement for the reference's torch DataLoader worker
// processes (train_uncond_dpm.py:87 num_workers): the hot host-side work
// (entropy decode + resample) runs here in C++ threads while JAX owns the
// device; Python calls in via ctypes (adm_tpu/data/native.py) so no
// fork/pickle and no GIL contention.
//
// Build: g++ -O3 -march=native -shared -fPIC decode.cc -ljpeg -lpng -o ...
// (driven lazily by adm_tpu/native/__init__.py; PIL path is the fallback).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <cmath>
#include <algorithm>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// ---------------------------------------------------------------- errors
// return codes: 0 ok, 1 open/io, 2 decode, 3 unsupported format

struct JErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jerr_exit(j_common_ptr cinfo) {
  JErr* e = reinterpret_cast<JErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// ----------------------------------------------------------- jpeg decode

static int decode_jpeg(const uint8_t* buf, size_t len, uint8_t** out,
                       int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jerr_exit;
  // volatile: modified between setjmp and longjmp, then read in the
  // handler — a plain local would be indeterminate there (C setjmp rules)
  uint8_t* volatile pixels = nullptr;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    std::free(const_cast<uint8_t*>(pixels));
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = JCS_RGB;  // CMYK/gray converted by libjpeg
  jpeg_start_decompress(&cinfo);
  const int W = cinfo.output_width, H = cinfo.output_height;
  pixels = static_cast<uint8_t*>(std::malloc(size_t(W) * H * 3));
  if (!pixels) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = const_cast<uint8_t*>(pixels) +
                   size_t(cinfo.output_scanline) * W * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  // corrupt-data warnings (e.g. premature EOF on a truncated file) only
  // fill gray and bump num_warnings in libjpeg; PIL raises on these, and
  // the load_with_retry contract (ddm/data.py:997-1004) depends on a
  // failure — so treat any warning as a decode error
  const long warnings = jerr.mgr.num_warnings;
  jpeg_destroy_decompress(&cinfo);
  if (warnings > 0) {
    std::free(const_cast<uint8_t*>(pixels));
    return 2;
  }
  *out = const_cast<uint8_t*>(pixels);
  *h = H;
  *w = W;
  return 0;
}

// ------------------------------------------------------------ png decode
// libpng "simplified" API: handles palette/gray/alpha/16-bit -> RGB8.

static int decode_png(const uint8_t* buf, size_t len, uint8_t** out,
                      int* h, int* w) {
  png_image image;
  std::memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, buf, len)) return 2;
  const int W = image.width, H = image.height;
  const bool has_alpha = (image.format & PNG_FORMAT_FLAG_ALPHA) != 0;
  uint8_t* pixels = static_cast<uint8_t*>(std::malloc(size_t(W) * H * 3));
  if (!pixels) {
    png_image_free(&image);
    return 2;
  }
  if (has_alpha) {
    // RGBA/tRNS sources: read the alpha channel and DROP it, matching
    // PIL's convert("RGB") (asking libpng for RGB directly would
    // composite over the destination buffer instead — nondeterministic)
    image.format = PNG_FORMAT_RGBA;
    uint8_t* tmp = static_cast<uint8_t*>(std::malloc(size_t(W) * H * 4));
    if (!tmp || !png_image_finish_read(&image, nullptr, tmp, 0, nullptr)) {
      std::free(tmp);
      std::free(pixels);
      return 2;
    }
    const size_t n = size_t(W) * H;
    for (size_t i = 0; i < n; ++i) {
      pixels[i * 3] = tmp[i * 4];
      pixels[i * 3 + 1] = tmp[i * 4 + 1];
      pixels[i * 3 + 2] = tmp[i * 4 + 2];
    }
    std::free(tmp);
  } else {
    image.format = PNG_FORMAT_RGB;
    if (!png_image_finish_read(&image, nullptr, pixels, 0, nullptr)) {
      std::free(pixels);
      return 2;
    }
  }
  *out = pixels;
  *h = H;
  *w = W;
  return 0;
}

// --------------------------------------------------------------- dispatch

static int decode_mem(const uint8_t* buf, size_t len, uint8_t** out,
                      int* h, int* w) {
  if (len >= 3 && buf[0] == 0xFF && buf[1] == 0xD8 && buf[2] == 0xFF)
    return decode_jpeg(buf, len, out, h, w);
  if (len >= 8 && png_sig_cmp(buf, 0, 8) == 0)
    return decode_png(buf, len, out, h, w);
  return 3;
}

static int read_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n <= 0) {
    std::fclose(f);
    return 1;
  }
  buf->resize(size_t(n));
  size_t got = std::fread(buf->data(), 1, size_t(n), f);
  std::fclose(f);
  return got == size_t(n) ? 0 : 1;
}

int adm_decode(const char* path, uint8_t** out, int* h, int* w) {
  std::vector<uint8_t> buf;
  int rc = read_file(path, &buf);
  if (rc) return rc;
  return decode_mem(buf.data(), buf.size(), out, h, w);
}

// in-memory variant (webdataset tar members, ddm/webdata.py:80)
int adm_decode_mem(const uint8_t* buf, long len, uint8_t** out, int* h,
                   int* w) {
  return decode_mem(buf, size_t(len), out, h, w);
}

void adm_free(uint8_t* p) { std::free(p); }

// ------------------------------------------------- triangle resample
// PIL's BILINEAR is a triangle filter whose support scales with the
// downscale ratio (area-style antialiasing), NOT naive bilinear — this
// reproduces Pillow's ImagingResampleHorizontal/Vertical in float
// arithmetic (Pillow uses 8.22 fixed point; agreement is within ±1 LSB).

struct Taps {
  std::vector<int> bounds;     // (first, count) per output pixel
  std::vector<double> coeffs;  // ksize weights per output pixel
  int ksize;
};

static Taps make_taps(int in_size, int out_size) {
  Taps t;
  const double scale = double(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 1.0 * filterscale;  // triangle support = 1
  t.ksize = int(std::ceil(support)) * 2 + 1;
  t.bounds.resize(size_t(out_size) * 2);
  t.coeffs.resize(size_t(out_size) * t.ksize);
  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = int(std::max(center - support + 0.5, 0.0));
    int xmax = std::min(int(center + support + 0.5), in_size);
    double* k = &t.coeffs[size_t(xx) * t.ksize];
    double ww = 0.0;
    for (int x = xmin; x < xmax; ++x) {
      double arg = (x - center + 0.5) / filterscale;
      double wgt = (arg < 0 ? 1.0 + arg : 1.0 - arg);
      wgt = wgt <= 0.0 ? 0.0 : wgt;
      k[x - xmin] = wgt;
      ww += wgt;
    }
    for (int x = 0; x < xmax - xmin; ++x)
      if (ww != 0.0) k[x] /= ww;
    t.bounds[size_t(xx) * 2] = xmin;
    t.bounds[size_t(xx) * 2 + 1] = xmax - xmin;
  }
  return t;
}

static inline uint8_t clamp8(double v) {
  return v < 0.0 ? 0 : (v > 255.0 ? 255 : uint8_t(v + 0.5));
}

// rgb (h,w,3) uint8 -> (th,tw,3) uint8, PIL-BILINEAR-compatible
int adm_resize_rgb(const uint8_t* in, int h, int w, uint8_t* out, int th,
                   int tw) {
  if (h == th && w == tw) {
    std::memcpy(out, in, size_t(h) * w * 3);
    return 0;
  }
  Taps tx = make_taps(w, tw), ty = make_taps(h, th);
  // horizontal pass into float intermediate (h, tw, 3)
  std::vector<float> mid(size_t(h) * tw * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = in + size_t(y) * w * 3;
    float* orow = &mid[size_t(y) * tw * 3];
    for (int xx = 0; xx < tw; ++xx) {
      const int x0 = tx.bounds[size_t(xx) * 2];
      const int cnt = tx.bounds[size_t(xx) * 2 + 1];
      const double* k = &tx.coeffs[size_t(xx) * tx.ksize];
      double r = 0, g = 0, b = 0;
      for (int i = 0; i < cnt; ++i) {
        const uint8_t* p = row + size_t(x0 + i) * 3;
        r += p[0] * k[i];
        g += p[1] * k[i];
        b += p[2] * k[i];
      }
      orow[xx * 3] = float(r);
      orow[xx * 3 + 1] = float(g);
      orow[xx * 3 + 2] = float(b);
    }
  }
  // vertical pass
  for (int yy = 0; yy < th; ++yy) {
    const int y0 = ty.bounds[size_t(yy) * 2];
    const int cnt = ty.bounds[size_t(yy) * 2 + 1];
    const double* k = &ty.coeffs[size_t(yy) * ty.ksize];
    uint8_t* orow = out + size_t(yy) * tw * 3;
    for (int xx = 0; xx < tw * 3; ++xx) {
      double acc = 0;
      for (int i = 0; i < cnt; ++i)
        acc += mid[size_t(y0 + i) * tw * 3 + xx] * k[i];
      orow[xx] = clamp8(acc);
    }
  }
  return 0;
}

// ------------------------------------------------------- batch thread API
// Decode+resize n files into a caller-provided contiguous (n,th,tw,3)
// uint8 buffer using a transient thread pool. ok[i]=0 on per-file failure
// (caller retries another sample — ddm/data.py:997-1004 semantics).

int adm_decode_resize_batch(const char** paths, int n, int th, int tw,
                            uint8_t* out, uint8_t* ok, int n_threads) {
  std::atomic<int> next(0);
  if (n_threads <= 0) n_threads = int(std::thread::hardware_concurrency());
  n_threads = std::max(1, std::min(n_threads, n));
  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      uint8_t* pix = nullptr;
      int h = 0, w = 0;
      int rc = adm_decode(paths[i], &pix, &h, &w);
      if (rc == 0) {
        adm_resize_rgb(pix, h, w, out + size_t(i) * th * tw * 3, th, tw);
        std::free(pix);
        ok[i] = 1;
      } else {
        ok[i] = 0;
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(work);
  for (auto& t : threads) t.join();
  return 0;
}

}  // extern "C"
