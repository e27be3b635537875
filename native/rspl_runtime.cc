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

#include <algorithm>
#include <atomic>
#include <cmath>
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

// ---------------------------------------------------------------------------
// Line segment merging — native port of the reference's MergeLines
// (line_processor.cc:492-665). Identical semantics to the numpy
// implementation in rspl_slam_tpu/ops/lines.py::merge_lines (pair tests →
// union-find components → longest-first sub-cluster split → sequential
// length-weighted pairwise fold); this runs on the host once per image in
// the hot loop, where numpy's per-op dispatch overhead dominates.
// ---------------------------------------------------------------------------

namespace {

struct Seg {
  double x1, y1, x2, y2;
};

inline void merge_two(const double* a, const double* b, double* out) {
  const double ax = a[0], ay = a[1], bx = a[2], by = a[3];
  const double cx = b[0], cy = b[1], dx = b[2], dy = b[3];
  const double dlix = bx - ax, dliy = by - ay;
  const double dljx = dx - cx, dljy = dy - cy;
  const double li = std::hypot(dlix, dliy), lj = std::hypot(dljx, dljy);
  const double xg = (li * (ax + bx) + lj * (cx + dx)) / (2.0 * (li + lj));
  const double yg = (li * (ay + by) + lj * (cy + dy)) / (2.0 * (li + lj));
  const double thi = dlix == 0.0 ? M_PI / 2 : std::atan(dliy / dlix);
  const double thj = dljx == 0.0 ? M_PI / 2 : std::atan(dljy / dljx);
  double th;
  if (std::fabs(thi - thj) <= M_PI / 2) {
    th = (li * thi + lj * thj) / (li + lj);
  } else {
    const double tmp = thj - M_PI * (thj / std::fabs(thj));
    th = (li * thi + lj * tmp) / (li + lj);
  }
  const double ct = std::cos(th), st = std::sin(th);
  const double pa = (ay - yg) * st + (ax - xg) * ct;
  const double pb = (by - yg) * st + (bx - xg) * ct;
  const double pc = (cy - yg) * st + (cx - xg) * ct;
  const double pd = (dy - yg) * st + (dx - xg) * ct;
  const double lo = std::min(std::min(pa, pb), std::min(pc, pd));
  const double hi = std::max(std::max(pa, pb), std::max(pc, pd));
  out[0] = lo * ct + xg;
  out[1] = lo * st + yg;
  out[2] = hi * ct + xg;
  out[3] = hi * st + yg;
}

struct UF {
  std::vector<int> p;
  explicit UF(int n) : p(n) { for (int i = 0; i < n; ++i) p[i] = i; }
  int find(int x) {
    while (p[x] != x) { p[x] = p[p[x]]; x = p[x]; }
    return x;
  }
  void unite(int a, int b) {
    int ra = find(a), rb = find(b);
    if (ra != rb) p[rb] = ra;
  }
};

}  // namespace

extern "C" {

// segs: (n, 4) float64 row-major; out: caller-allocated (n, 4). Returns the
// number of merged segments written to out (≤ n), or -1 on bad input.
int rspl_merge_lines(const double* segs, int n, double angle_thr,
                     double distance_thr, double ep_thr, double* out) {
  if (n < 0) return -1;
  if (n == 0) return 0;
  if (n == 1) {
    std::memcpy(out, segs, 4 * sizeof(double));
    return 1;
  }
  std::vector<double> ang(n), len(n), A(n), B(n), C(n), D(n);
  std::vector<double> mx(n), my(n);
  // canonical axis-sorted endpoints per axis: [axis][seg][end {min,max}][xy]
  std::vector<double> P0x(2 * n), P0y(2 * n), P1x(2 * n), P1y(2 * n);
  for (int i = 0; i < n; ++i) {
    const double x1 = segs[4 * i], y1 = segs[4 * i + 1];
    const double x2 = segs[4 * i + 2], y2 = segs[4 * i + 3];
    const double ddx = x2 - x1, ddy = y2 - y1;
    ang[i] = ddx == 0.0 ? M_PI / 2 : std::atan(ddy / ddx);
    len[i] = std::hypot(ddx, ddy);
    A[i] = ddy;
    B[i] = -ddx;
    C[i] = x2 * y1 - x1 * y2;
    D[i] = std::max(std::hypot(A[i], B[i]), 1e-9);
    mx[i] = (x1 + x2) / 2;
    my[i] = (y1 + y2) / 2;
    for (int axis = 0; axis < 2; ++axis) {
      const double e1 = axis == 0 ? x1 : y1, e2 = axis == 0 ? x2 : y2;
      const bool swap = e2 < e1;
      P0x[axis * n + i] = swap ? x2 : x1;
      P0y[axis * n + i] = swap ? y2 : y1;
      P1x[axis * n + i] = swap ? x1 : x2;
      P1y[axis * n + i] = swap ? y1 : y2;
    }
  }
  // rank in stable angle sort (ties broken by index)
  std::vector<int> order(n), pos(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return ang[a] < ang[b]; });
  for (int r = 0; r < n; ++r) pos[order[r]] = r;

  const double ep2 = ep_thr * ep_thr;
  auto axis_cond = [&](int i, int j, int axis) -> bool {
    const int oi = axis * n + i, oj = axis * n + j;
    const double p1i = axis == 0 ? P1x[oi] : P1y[oi];
    const double p1j = axis == 0 ? P1x[oj] : P1y[oj];
    const bool i_first = p1i <= p1j;
    const double fex = i_first ? P1x[oi] : P1x[oj];
    const double fey = i_first ? P1y[oi] : P1y[oj];
    const double ssx = i_first ? P0x[oj] : P0x[oi];
    const double ssy = i_first ? P0y[oj] : P0y[oi];
    const bool overlap = (axis == 0 ? fex : fey) >= (axis == 0 ? ssx : ssy);
    const double gx = ssx - fex, gy = ssy - fey;
    return overlap || (gx * gx + gy * gy) < ep2;
  };

  std::vector<uint8_t> ok((size_t)n * n, 0);
  UF uf(n);
  for (int i = 0; i < n; ++i) {
    const bool to_x_i = std::fabs(ang[i]) < M_PI / 4;
    for (int j = i + 1; j < n; ++j) {
      double dA = std::fabs(ang[i] - ang[j]);
      dA = std::min(dA, M_PI - dA);
      if (dA > angle_thr) continue;
      const double dij =
          std::fabs(mx[i] * A[j] + my[i] * B[j] + C[j]) / D[j];
      const double dji =
          std::fabs(mx[j] * A[i] + my[j] * B[i] + C[i]) / D[i];
      if (dij > distance_thr && dji > distance_thr) continue;
      // endpoint overlap/gap along the dominant axis of the angle-earlier
      // line (numpy: row_cond follows to_x of the earlier-ranked segment)
      const int e = pos[i] <= pos[j] ? i : j;
      const bool to_x = e == i ? to_x_i : std::fabs(ang[j]) < M_PI / 4;
      if (!axis_cond(i, j, to_x ? 0 : 1)) continue;
      ok[(size_t)i * n + j] = ok[(size_t)j * n + i] = 1;
      uf.unite(i, j);
    }
  }

  // components in first-seen-index order
  std::vector<int> root_order;
  std::vector<std::vector<int>> comps;
  std::vector<int> comp_of(n, -1);
  for (int i = 0; i < n; ++i) {
    const int r = uf.find(i);
    if (comp_of[r] < 0) {
      comp_of[r] = (int)comps.size();
      comps.emplace_back();
    }
    comps[comp_of[r]].push_back(i);
  }

  int m = 0;
  std::vector<int> sub;
  auto fold_sub = [&](const std::vector<int>& s) {
    double cur[4] = {segs[4 * s[0]], segs[4 * s[0] + 1], segs[4 * s[0] + 2],
                     segs[4 * s[0] + 3]};
    for (size_t k = 1; k < s.size(); ++k) {
      const double* b = &segs[4 * s[k]];
      double nxt[4];
      merge_two(cur, b, nxt);
      std::memcpy(cur, nxt, sizeof(cur));
    }
    std::memcpy(&out[4 * m], cur, sizeof(cur));
    ++m;
  };
  std::vector<uint8_t> clustered(n, 0);
  for (auto& members : comps) {
    if (members.size() <= 2) {
      fold_sub(members);
      continue;
    }
    std::vector<int> cl = members;
    std::stable_sort(cl.begin(), cl.end(),
                     [&](int a, int b) { return len[a] > len[b]; });
    std::fill(clustered.begin(), clustered.end(), 0);
    for (int li : cl) {
      if (clustered[li]) continue;
      sub.clear();
      sub.push_back(li);
      for (int j = 0; j < n; ++j) {
        if (ok[(size_t)li * n + j]) {
          sub.push_back(j);
          clustered[j] = 1;
        }
      }
      // fold neighbors in angle-rank order (matches numpy merge_lines and
      // the reference's angle-sorted cluster iteration)
      std::stable_sort(sub.begin() + 1, sub.end(),
                       [&](int a, int b) { return pos[a] < pos[b]; });
      fold_sub(sub);
    }
  }
  return m;
}

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
