// Native threaded image-loading pipeline for eval sweeps.
//
// The reference loads and preprocesses every sample synchronously on the
// Python main thread between device calls (/root/reference/eval.py:84-100,
// modules/models/__init__.py:12-76).  Feeding a TPU chip, that host work
// serializes with device compute; this loader decodes (libpng/libjpeg) and
// runs the fused center-crop+resize+normalize preprocess on a std::thread
// pool so the next batch's pixels are ready the moment the chip finishes the
// current one.  C ABI consumed via ctypes (eta_inversion_tpu/native.py,
// NativeImageLoader); built as its own shared object so libimageproc.so
// keeps loading on hosts without libpng/libjpeg.
//
// Build: make -C native libimageloader.so

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <csetjmp>
#include <jpeglib.h>
#include <png.h>

// fused preprocess from imageproc.cpp (linked into this .so as well)
extern "C" void preprocess_image(const uint8_t* src, int h, int w, float* dst,
                                 int s, int center_crop);

namespace {

// ---------------------------------------------------------------- decoding

bool decode_png(const char* path, std::vector<uint8_t>& rgb, int& h, int& w) {
  png_image image;
  std::memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return false;
  image.format = PNG_FORMAT_RGB;
  rgb.resize(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, rgb.data(), 0, nullptr)) {
    png_image_free(&image);
    return false;
  }
  h = static_cast<int>(image.height);
  w = static_cast<int>(image.width);
  return true;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  std::jmp_buf jb;
};

void jpeg_error_trampoline(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  std::longjmp(err->jb, 1);  // default handler would exit() the process
}

bool decode_jpeg(const char* path, std::vector<uint8_t>& rgb, int& h, int& w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_error_trampoline;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  w = cinfo.output_width;
  h = cinfo.output_height;
  rgb.resize(static_cast<size_t>(h) * w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

bool decode_any(const char* path, std::vector<uint8_t>& rgb, int& h, int& w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[4] = {0, 0, 0, 0};
  size_t n = std::fread(magic, 1, 4, f);
  std::fclose(f);
  if (n < 4) return false;
  if (magic[0] == 0x89 && magic[1] == 'P') return decode_png(path, rgb, h, w);
  if (magic[0] == 0xFF && magic[1] == 0xD8) return decode_jpeg(path, rgb, h, w);
  return false;
}

// ------------------------------------------------------------- thread pool

struct Job {
  std::string path;
  float* dst;      // caller-owned (size*size*3) float32
  int ticket;
};

struct Loader {
  int size;
  int center_crop;
  std::vector<std::thread> workers;
  std::deque<Job> jobs;
  std::mutex mu;
  std::condition_variable cv_job;
  std::condition_variable cv_done;
  // ticket -> status: 0 pending, 1 ok, <0 error
  std::vector<int> status;
  bool stopping = false;

  void worker() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_job.wait(lk, [&] { return stopping || !jobs.empty(); });
        if (stopping && jobs.empty()) return;
        job = std::move(jobs.front());
        jobs.pop_front();
      }
      std::vector<uint8_t> rgb;
      int h = 0, w = 0;
      int st = decode_any(job.path.c_str(), rgb, h, w) ? 1 : -1;
      if (st == 1) preprocess_image(rgb.data(), h, w, job.dst, size, center_crop);
      {
        std::lock_guard<std::mutex> lk(mu);
        status[job.ticket] = st;
      }
      cv_done.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* loader_create(int threads, int size, int center_crop) {
  auto* L = new Loader;
  L->size = size;
  L->center_crop = center_crop;
  if (threads < 1) threads = 1;
  for (int i = 0; i < threads; ++i)
    L->workers.emplace_back([L] { L->worker(); });
  return L;
}

int loader_submit(void* handle, const char* path, float* dst) {
  auto* L = static_cast<Loader*>(handle);
  int ticket;
  {
    std::lock_guard<std::mutex> lk(L->mu);
    ticket = static_cast<int>(L->status.size());
    L->status.push_back(0);
    L->jobs.push_back(Job{path, dst, ticket});
  }
  L->cv_job.notify_one();
  return ticket;
}

int loader_wait(void* handle, int ticket) {
  auto* L = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv_done.wait(lk, [&] { return L->status[ticket] != 0; });
  return L->status[ticket];
}

void loader_destroy(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stopping = true;
  }
  L->cv_job.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
