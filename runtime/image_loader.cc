// dynibar_tpu native runtime: threaded image decode + resize.
//
// The reference feeds its trainer with 16 torch DataLoader worker
// *processes* whose real job is image decode (train.py:82-90) — torch's
// C++ decoders behind a multiprocessing fence.  Here the equivalent is a
// small C++ library with a persistent thread pool that decodes PNG/JPEG
// files straight into a caller-provided float32 NHWC buffer (and
// bilinearly resizes on the fly), callable from Python via ctypes with the
// GIL released.  One process, zero IPC, zero copies beyond the decode.
//
// C API (stable, ctypes-friendly):
//   void* dyn_loader_create(int num_threads);
//   int   dyn_loader_decode_batch(void* h, const char** paths, int n,
//                                 float* out, int out_h, int out_w);
//        -> decodes n files into out[n, out_h, out_w, 3] (values in [0,1]);
//           out_h/out_w == 0 means "native size" (all images must match).
//           returns 0 on success, else the 1-based index of the first
//           failing file negated.
//   int   dyn_loader_image_size(const char* path, int* h, int* w);
//   void  dyn_loader_destroy(void* h);

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

// ----------------------------------------------------------------- decode

struct Image {
  int h = 0, w = 0, c = 0;
  std::vector<unsigned char> data;  // HWC, 8-bit
};

bool HasSuffix(const std::string& s, const char* suf) {
  size_t n = strlen(suf);
  if (s.size() < n) return false;
  std::string tail = s.substr(s.size() - n);
  for (auto& ch : tail) ch = static_cast<char>(tolower(ch));
  return tail == suf;
}

bool DecodePng(const char* path, Image* img) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_color_8p sig_bit;
  if (png_get_sBIT(png, info, &sig_bit)) png_set_shift(png, sig_bit);
  png_read_update_info(png, info);

  img->h = static_cast<int>(png_get_image_height(png, info));
  img->w = static_cast<int>(png_get_image_width(png, info));
  img->c = static_cast<int>(png_get_channels(png, info));
  img->data.resize(static_cast<size_t>(img->h) * img->w * img->c);
  std::vector<png_bytep> rows(img->h);
  size_t stride = static_cast<size_t>(img->w) * img->c;
  for (int y = 0; y < img->h; ++y) rows[y] = img->data.data() + y * stride;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void JpegErrorExit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

bool DecodeJpeg(const char* path, Image* img) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = JpegErrorExit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img->h = static_cast<int>(cinfo.output_height);
  img->w = static_cast<int>(cinfo.output_width);
  img->c = 3;
  img->data.resize(static_cast<size_t>(img->h) * img->w * 3);
  size_t stride = static_cast<size_t>(img->w) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = img->data.data() + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return true;
}

bool DecodeAny(const char* path, Image* img) {
  std::string p(path);
  if (HasSuffix(p, ".png")) return DecodePng(path, img);
  if (HasSuffix(p, ".jpg") || HasSuffix(p, ".jpeg"))
    return DecodeJpeg(path, img);
  // sniff magic bytes
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  unsigned char magic[4] = {0};
  size_t got = fread(magic, 1, 4, fp);
  fclose(fp);
  if (got >= 4 && magic[0] == 0x89 && magic[1] == 'P')
    return DecodePng(path, img);
  return DecodeJpeg(path, img);
}

// area-average for downscale, bilinear for upscale; writes float32 RGB
void ResizeToFloat(const Image& src, float* out, int oh, int ow) {
  const float inv255 = 1.0f / 255.0f;
  const int c = src.c;
  if (oh == src.h && ow == src.w) {
    const size_t n = static_cast<size_t>(oh) * ow;
    for (size_t i = 0; i < n; ++i) {
      for (int k = 0; k < 3; ++k) {
        int kk = k < c ? k : c - 1;  // gray -> rgb broadcast
        out[i * 3 + k] = src.data[i * c + kk] * inv255;
      }
    }
    return;
  }
  const float sy = static_cast<float>(src.h) / oh;
  const float sx = static_cast<float>(src.w) / ow;
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : static_cast<int>(fy);
    int y1 = y0 + 1 < src.h ? y0 + 1 : src.h - 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < ow; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : static_cast<int>(fx);
      int x1 = x0 + 1 < src.w ? x0 + 1 : src.w - 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int k = 0; k < 3; ++k) {
        int kk = k < c ? k : c - 1;
        float v00 = src.data[(static_cast<size_t>(y0) * src.w + x0) * c + kk];
        float v01 = src.data[(static_cast<size_t>(y0) * src.w + x1) * c + kk];
        float v10 = src.data[(static_cast<size_t>(y1) * src.w + x0) * c + kk];
        float v11 = src.data[(static_cast<size_t>(y1) * src.w + x1) * c + kk];
        float v = (1 - wy) * ((1 - wx) * v00 + wx * v01) +
                  wy * ((1 - wx) * v10 + wx * v11);
        out[(static_cast<size_t>(y) * ow + x) * 3 + k] = v * inv255;
      }
    }
  }
}

// ------------------------------------------------------------- threadpool

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { Loop(); });
  }
  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void Submit(std::function<void()> fn) {
    {
      std::unique_lock<std::mutex> lk(mu_);
      tasks_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void Loop() {
    for (;;) {
      std::function<void()> task;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !tasks_.empty(); });
        if (stop_ && tasks_.empty()) return;
        task = std::move(tasks_.front());
        tasks_.pop();
      }
      task();
    }
  }
  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> tasks_;
  std::vector<std::thread> workers_;
  bool stop_;
};

struct Loader {
  explicit Loader(int n) : pool(n > 0 ? n : 1) {}
  ThreadPool pool;
};

}  // namespace

extern "C" {

void* dyn_loader_create(int num_threads) { return new Loader(num_threads); }

void dyn_loader_destroy(void* h) { delete static_cast<Loader*>(h); }

int dyn_loader_image_size(const char* path, int* h, int* w) {
  Image img;
  if (!DecodeAny(path, &img)) return -1;
  *h = img.h;
  *w = img.w;
  return 0;
}

int dyn_loader_decode_batch(void* handle, const char** paths, int n,
                            float* out, int out_h, int out_w) {
  auto* loader = static_cast<Loader*>(handle);
  std::atomic<int> failed{0};
  std::atomic<int> done{0};
  std::mutex done_mu;
  std::condition_variable done_cv;

  for (int i = 0; i < n; ++i) {
    loader->pool.Submit([&, i] {
      Image img;
      if (!DecodeAny(paths[i], &img)) {
        int expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
      } else {
        int oh = out_h > 0 ? out_h : img.h;
        int ow = out_w > 0 ? out_w : img.w;
        ResizeToFloat(img, out + static_cast<size_t>(i) * oh * ow * 3, oh,
                      ow);
      }
      if (done.fetch_add(1) + 1 == n) {
        std::unique_lock<std::mutex> lk(done_mu);
        done_cv.notify_all();
      }
    });
  }
  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return done.load() == n; });
  return -failed.load();
}

}  // extern "C"
