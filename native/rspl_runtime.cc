// Native runtime for rspl_slam_tpu — image decode + rectification +
// multi-threaded stereo prefetcher.
//
// This is the TPU-native equivalent of the reference's native IO/runtime
// layer (the vendored TensorRT BufferManager host/device staging +
// cv::imread/cv::remap in dataset.cc/camera.cc and the bounded-queue
// feeding threads in map_builder.cc:48-69). The compute path stays in
// JAX/XLA; this library keeps the HOST side of the pipeline — disk →
// decode → rectify → pinned contiguous float buffers — off the Python
// interpreter and overlapped with device work.
//
// C API (extern "C") consumed via ctypes (no pybind11 in this image):
//   rspl_decode_gray(path, out, H, W)          one grayscale image → float
//   rspl_remap_bilinear(src, H, W, map, dst)   rectification remap
//   rspl_loader_create(...)                    threaded stereo prefetcher
//   rspl_loader_next(...)                      blocking pop (ordered)
//   rspl_loader_destroy(...)
//
// Build: make -C native  (links libpng16, libjpeg, libz, pthread)

#include <png.h>
#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <cmath>
#include <vector>

namespace {

// ---------------------------------------------------------------- decode

bool decode_png_gray(const char* path, std::vector<float>& out, int& h,
                     int& w) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return false;
  image.format = PNG_FORMAT_GRAY;
  std::vector<uint8_t> buf(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, buf.data(), 0, nullptr)) {
    png_image_free(&image);
    return false;
  }
  h = image.height;
  w = image.width;
  out.resize(static_cast<size_t>(h) * w);
  const float inv = 1.0f / 255.0f;
  for (size_t i = 0; i < out.size(); ++i) out[i] = buf[i] * inv;
  png_image_free(&image);
  return true;
}

bool decode_jpeg_gray(const char* path, std::vector<float>& out, int& h,
                      int& w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  cinfo.out_color_space = JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);
  h = cinfo.output_height;
  w = cinfo.output_width;
  out.resize(static_cast<size_t>(h) * w);
  std::vector<uint8_t> row(w);
  const float inv = 1.0f / 255.0f;
  uint8_t* rowp = row.data();
  for (int y = 0; y < h; ++y) {
    jpeg_read_scanlines(&cinfo, &rowp, 1);
    for (int x = 0; x < w; ++x) out[static_cast<size_t>(y) * w + x] = row[x] * inv;
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

bool decode_gray(const char* path, std::vector<float>& out, int& h, int& w) {
  const char* dot = std::strrchr(path, '.');
  if (dot && (!std::strcmp(dot, ".jpg") || !std::strcmp(dot, ".jpeg") ||
              !std::strcmp(dot, ".JPG"))) {
    return decode_jpeg_gray(path, out, h, w);
  }
  return decode_png_gray(path, out, h, w);
}

// ----------------------------------------------------------------- remap

void remap_bilinear(const float* src, int h, int w, const float* map_xy,
                    float* dst) {
  // map_xy: (h, w, 2) source (x, y) per output pixel; border clamp —
  // semantics of camera.remap_bilinear / cv::remap INTER_LINEAR.
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const float sx = map_xy[(static_cast<size_t>(y) * w + x) * 2 + 0];
      const float sy = map_xy[(static_cast<size_t>(y) * w + x) * 2 + 1];
      // x0 = clip(floor(sx), 0, w−2); wx = clip(sx − x0, 0, 1) — exactly
      // the jax remap_bilinear semantics (camera.py)
      int x0 = static_cast<int>(std::floor(sx));
      int y0 = static_cast<int>(std::floor(sy));
      if (x0 < 0) x0 = 0; if (x0 > w - 2) x0 = w - 2;
      if (y0 < 0) y0 = 0; if (y0 > h - 2) y0 = h - 2;
      float wx = sx - x0, wy = sy - y0;
      if (wx < 0) wx = 0; if (wx > 1) wx = 1;
      if (wy < 0) wy = 0; if (wy > 1) wy = 1;
      const float v00 = src[static_cast<size_t>(y0) * w + x0];
      const float v01 = src[static_cast<size_t>(y0) * w + x0 + 1];
      const float v10 = src[static_cast<size_t>(y0 + 1) * w + x0];
      const float v11 = src[static_cast<size_t>(y0 + 1) * w + x0 + 1];
      dst[static_cast<size_t>(y) * w + x] =
          v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
          v10 * wy * (1 - wx) + v11 * wy * wx;
    }
  }
}

// ------------------------------------------------------------- prefetcher

struct Frame {
  int index = -1;
  std::vector<float> left, right;
  bool ok = false;
};

struct Loader {
  std::vector<std::string> lefts, rights;
  int H = 0, W = 0;
  std::vector<float> map_l, map_r;  // optional rectification maps
  bool rectify = false;

  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::map<int, Frame> ready;       // decoded frames awaiting consumption
  std::atomic<int> next_to_decode{0};
  int next_to_emit = 0;
  size_t depth = 3;
  bool stop = false;
  std::vector<std::thread> workers;

  void worker() {
    std::vector<float> tmp;
    while (true) {
      const int idx = next_to_decode.fetch_add(1);
      if (idx >= static_cast<int>(lefts.size())) return;
      Frame fr;
      fr.index = idx;
      int h = 0, w = 0;
      fr.ok = decode_gray(lefts[idx].c_str(), fr.left, h, w) &&
              h == H && w == W &&
              decode_gray(rights[idx].c_str(), fr.right, h, w) &&
              h == H && w == W;
      if (fr.ok && rectify) {
        tmp = fr.left;
        remap_bilinear(tmp.data(), H, W, map_l.data(), fr.left.data());
        tmp = fr.right;
        remap_bilinear(tmp.data(), H, W, map_r.data(), fr.right.data());
      }
      std::unique_lock<std::mutex> lk(mu);
      // bounded buffer: wait while `depth` frames at/after the emit cursor
      // are already decoded (backpressure ≙ _data_buffer cap,
      // map_builder.cc:63-69 — but with condvars, not sleep-polling)
      cv_space.wait(lk, [&] {
        return stop || static_cast<int>(ready.size()) < static_cast<int>(depth) ||
               idx < next_to_emit + static_cast<int>(depth);
      });
      if (stop) return;
      ready.emplace(idx, std::move(fr));
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

int rspl_decode_gray(const char* path, float* out, int expect_h, int expect_w) {
  std::vector<float> buf;
  int h = 0, w = 0;
  if (!decode_gray(path, buf, h, w)) return -1;
  if (h != expect_h || w != expect_w) return -2;
  std::memcpy(out, buf.data(), buf.size() * sizeof(float));
  return 0;
}

int rspl_image_size(const char* path, int* h, int* w) {
  std::vector<float> buf;
  return decode_gray(path, buf, *h, *w) ? 0 : -1;
}

void rspl_remap_bilinear(const float* src, int h, int w, const float* map_xy,
                         float* dst) {
  remap_bilinear(src, h, w, map_xy, dst);
}

void* rspl_loader_create(const char** left_paths, const char** right_paths,
                         int n, int H, int W, const float* map_l,
                         const float* map_r, int depth, int n_threads) {
  auto* L = new Loader();
  L->lefts.assign(left_paths, left_paths + n);
  L->rights.assign(right_paths, right_paths + n);
  L->H = H;
  L->W = W;
  L->depth = depth > 0 ? depth : 3;
  if (map_l && map_r) {
    const size_t sz = static_cast<size_t>(H) * W * 2;
    L->map_l.assign(map_l, map_l + sz);
    L->map_r.assign(map_r, map_r + sz);
    L->rectify = true;
  }
  const int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; ++i) L->workers.emplace_back(&Loader::worker, L);
  return L;
}

// Blocking ordered pop. Returns frame index ≥ 0, or −1 at end of stream,
// −2 on decode failure of this frame.
int rspl_loader_next(void* handle, float* out_left, float* out_right) {
  auto* L = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(L->mu);
  if (L->next_to_emit >= static_cast<int>(L->lefts.size())) return -1;
  const int want = L->next_to_emit;
  L->cv_ready.wait(lk, [&] { return L->ready.count(want) > 0; });
  Frame fr = std::move(L->ready[want]);
  L->ready.erase(want);
  L->next_to_emit++;
  L->cv_space.notify_all();
  lk.unlock();
  if (!fr.ok) return -2;
  const size_t sz = static_cast<size_t>(L->H) * L->W;
  std::memcpy(out_left, fr.left.data(), sz * sizeof(float));
  std::memcpy(out_right, fr.right.data(), sz * sizeof(float));
  return fr.index;
}

void rspl_loader_destroy(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop = true;
  }
  L->cv_space.notify_all();
  L->next_to_decode.store(1 << 28);  // unblock fetchers
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
