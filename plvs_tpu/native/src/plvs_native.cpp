// plvs_tpu native runtime: host-side graph/index/IO engine.
//
// TPU-native framework analogue of the reference's C++ runtime components
// (reference: src/KeyFrame.cc covisibility graph + spanning tree,
// src/KeyFrameDatabase.cc inverted file, Thirdparty/DBoW2, and the
// dataset-loader mains under Examples/). The TPU compute path is JAX/Pallas;
// everything here is the part of the framework that must stay on the host —
// observation-graph bookkeeping, place-recognition indexing, and image IO —
// implemented in C++ for the same reasons the reference implements them in
// C++: they are latency-critical, branchy, and run concurrently with device
// compute.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include <png.h>

extern "C" {

// ---------------------------------------------------------------------------
// Covisibility engine (reference: KeyFrame::UpdateConnections /
// GetBestCovisibilityKeyFrames, include/KeyFrame.h:124-138). Operates
// zero-copy on the MapStore observation table.
// ---------------------------------------------------------------------------

// Count, for one keyframe, the number of shared landmarks with every other
// keyframe. O(n_obs) two-pass: mark this KF's points, then scan.
void covis_counts(const int64_t* obs_kf, const int64_t* obs_pt,
                  const uint8_t* obs_mask, int64_t n_obs, int64_t kf,
                  int64_t max_kf, int64_t max_pts,
                  int32_t* out_counts /* [max_kf] zeroed */) {
  // out-of-range ids are skipped rather than trusted: a single bad index
  // from the caller must not corrupt the heap of the host process that is
  // also running the JIT compiler
  std::vector<uint8_t> mine(max_pts, 0);
  for (int64_t i = 0; i < n_obs; ++i) {
    if (obs_mask[i] && obs_kf[i] == kf && (uint64_t)obs_pt[i] < (uint64_t)max_pts)
      mine[obs_pt[i]] = 1;
  }
  for (int64_t i = 0; i < n_obs; ++i) {
    if (obs_mask[i] && obs_kf[i] != kf &&
        (uint64_t)obs_pt[i] < (uint64_t)max_pts &&
        (uint64_t)obs_kf[i] < (uint64_t)max_kf && mine[obs_pt[i]]) {
      ++out_counts[obs_kf[i]];
    }
  }
}

// Full weighted covisibility graph as COO edges (i < j). Group observations
// by landmark, then emit pairwise keyframe increments. Returns the number of
// edges written (or the required capacity if it exceeds cap).
int64_t covis_graph(const int64_t* obs_kf, const int64_t* obs_pt,
                    const uint8_t* obs_mask, int64_t n_obs, int64_t max_kf,
                    int64_t max_pts, int32_t min_weight, int64_t cap,
                    int32_t* out_i, int32_t* out_j, int32_t* out_w) {
  // counting-sort observations by landmark id
  std::vector<int32_t> head(max_pts + 1, 0);
  std::vector<int32_t> kf_of;
  kf_of.reserve(n_obs);
  auto ok = [&](int64_t i) {
    return obs_mask[i] && (uint64_t)obs_pt[i] < (uint64_t)max_pts &&
           (uint64_t)obs_kf[i] < (uint64_t)max_kf;
  };
  for (int64_t i = 0; i < n_obs; ++i)
    if (ok(i)) ++head[obs_pt[i] + 1];
  for (int64_t p = 0; p < max_pts; ++p) head[p + 1] += head[p];
  std::vector<int32_t> sorted(head[max_pts]);
  {
    std::vector<int32_t> cur(head.begin(), head.end() - 1);
    for (int64_t i = 0; i < n_obs; ++i)
      if (ok(i)) sorted[cur[obs_pt[i]]++] = (int32_t)obs_kf[i];
  }
  std::unordered_map<int64_t, int32_t> w;
  w.reserve(1 << 16);
  for (int64_t p = 0; p < max_pts; ++p) {
    int32_t a = head[p], b = head[p + 1];
    for (int32_t x = a; x < b; ++x)
      for (int32_t y = x + 1; y < b; ++y) {
        int32_t i = sorted[x], j = sorted[y];
        if (i == j) continue;
        if (i > j) std::swap(i, j);
        ++w[(int64_t)i * max_kf + j];
      }
  }
  int64_t n_out = 0;
  for (const auto& kv : w) {
    if (kv.second < min_weight) continue;
    if (n_out < cap) {
      out_i[n_out] = (int32_t)(kv.first / max_kf);
      out_j[n_out] = (int32_t)(kv.first % max_kf);
      out_w[n_out] = kv.second;
    }
    ++n_out;
  }
  return n_out;
}

// Spanning tree over keyframes from covisibility edges: each KF's parent is
// the covisible KF with the highest weight among earlier-id KFs (reference:
// KeyFrame::ChangeParent / mspChildrens semantics, built eagerly here).
void spanning_tree(const int32_t* ei, const int32_t* ej, const int32_t* ew,
                   int64_t n_edges, int64_t max_kf, int32_t* out_parent) {
  std::vector<int32_t> best_w(max_kf, 0);
  for (int64_t k = 0; k < max_kf; ++k) out_parent[k] = -1;
  for (int64_t e = 0; e < n_edges; ++e) {
    int32_t i = ei[e], j = ej[e], wt = ew[e];  // i < j
    if (wt > best_w[j]) {
      best_w[j] = wt;
      out_parent[j] = i;
    }
  }
}

// ---------------------------------------------------------------------------
// Sparse BoW inverted index (reference: KeyFrameDatabase::mvInvertedFile +
// DBoW2 L1 scoring, include/KeyFrameDatabase.h:106).
// ---------------------------------------------------------------------------

struct InvIndex {
  int64_t n_words;
  // per word: (kf id, tf-idf weight) postings
  std::vector<std::vector<std::pair<int32_t, float>>> postings;
  std::unordered_map<int32_t, float> norm;  // L1 norm per kf (==1 if normed)
};

void* invindex_create(int64_t n_words) {
  auto* ix = new InvIndex();
  ix->n_words = n_words;
  ix->postings.resize(n_words);
  return ix;
}

void invindex_destroy(void* h) { delete (InvIndex*)h; }

void invindex_add(void* h, int32_t kf, const int32_t* words,
                  const float* weights, int64_t n) {
  auto* ix = (InvIndex*)h;
  float s = 0.f;
  for (int64_t i = 0; i < n; ++i) {
    if ((uint64_t)words[i] >= (uint64_t)ix->n_words) continue;  // -1 = no word
    ix->postings[words[i]].emplace_back(kf, weights[i]);
    s += weights[i] < 0 ? -weights[i] : weights[i];
  }
  ix->norm[kf] = s > 0 ? s : 1.f;
}

void invindex_remove(void* h, int32_t kf) {
  auto* ix = (InvIndex*)h;
  for (auto& post : ix->postings) {
    post.erase(std::remove_if(post.begin(), post.end(),
                              [kf](const std::pair<int32_t, float>& p) {
                                return p.first == kf;
                              }),
               post.end());
  }
  ix->norm.erase(kf);
}

// L1 similarity over shared words (DBoW2 identity:
// score = 2 * sum_shared (|a|+|b| - |a-b|) / 2 with L1-normalised vectors;
// here both sides are normalised by their stored L1 norms). Also returns the
// shared-word count per candidate, the reference's first filter.
int64_t invindex_query(void* h, const int32_t* words, const float* weights,
                       int64_t n, int32_t max_kf, float* out_scores,
                       int32_t* out_shared) {
  auto* ix = (InvIndex*)h;
  std::memset(out_scores, 0, sizeof(float) * max_kf);
  std::memset(out_shared, 0, sizeof(int32_t) * max_kf);
  float qs = 0.f;
  for (int64_t i = 0; i < n; ++i) qs += std::abs(weights[i]);
  if (qs <= 0) qs = 1.f;
  int64_t touched = 0;
  for (int64_t i = 0; i < n; ++i) {
    if ((uint64_t)words[i] >= (uint64_t)ix->n_words) continue;
    const float qa = weights[i] / qs;
    for (const auto& p : ix->postings[words[i]]) {
      if ((uint64_t)p.first >= (uint64_t)max_kf) continue;
      const float vb = p.second / ix->norm[p.first];
      out_scores[p.first] += std::abs(qa) + std::abs(vb) - std::abs(qa - vb);
      if (out_shared[p.first]++ == 0) ++touched;
    }
  }
  for (int64_t k = 0; k < max_kf; ++k) out_scores[k] *= 0.5f;
  return touched;
}

// ---------------------------------------------------------------------------
// PNG decode + prefetching dataset loader (reference: the per-dataset image
// loops in Examples/*/ *_tum.cc etc.; TUM depth PNGs are 16-bit).
// ---------------------------------------------------------------------------

// Decode a PNG to grayscale float32 (8-bit -> [0,255]) or, for 16-bit
// single-channel images, raw uint16 values as float32 (caller scales by the
// dataset depth factor). RGB inputs are luma-converted. Returns 0 on success.
int png_read_gray_f32(const char* path, float* out, int64_t out_cap,
                      int32_t* out_h, int32_t* out_w) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return -2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);
  color = png_get_color_type(png, info);
  bit_depth = png_get_bit_depth(png, info);
  const int ch = (color == PNG_COLOR_TYPE_RGB) ? 3 : 1;
  if ((int64_t)w * h > out_cap) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return -3;
  }
  std::vector<png_byte> row(w * ch * (bit_depth / 8));
  for (png_uint_32 y = 0; y < h; ++y) {
    png_read_row(png, row.data(), nullptr);
    float* dst = out + (int64_t)y * w;
    if (bit_depth == 16) {
      // PNG is big-endian
      for (png_uint_32 x = 0; x < w; ++x) {
        const png_byte* p = &row[x * ch * 2];
        if (ch == 1) {
          dst[x] = (float)((p[0] << 8) | p[1]);
        } else {
          const float r = (float)((p[0] << 8) | p[1]);
          const float g = (float)((p[2] << 8) | p[3]);
          const float b = (float)((p[4] << 8) | p[5]);
          dst[x] = (0.299f * r + 0.587f * g + 0.114f * b) / 257.0f;
        }
      }
    } else {
      for (png_uint_32 x = 0; x < w; ++x) {
        const png_byte* p = &row[x * ch];
        dst[x] = (ch == 1)
                     ? (float)p[0]
                     : 0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2];
      }
    }
  }
  *out_h = (int32_t)h;
  *out_w = (int32_t)w;
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

// Background prefetcher: decodes a fixed list of paths in order on worker
// threads, hands frames out strictly in sequence (the SLAM front end is
// frame-serial; decoding overlaps device compute).
struct Prefetcher {
  std::vector<std::string> paths;
  int64_t cap_px;
  size_t next_issue = 0;   // next index to hand to a worker
  size_t next_serve = 0;   // next index the consumer expects
  size_t window;
  struct Slot {
    std::vector<float> px;
    int32_t h = 0, w = 0, status = -100;
    bool ready = false;
  };
  std::unordered_map<size_t, Slot> done;
  std::mutex mu;
  std::condition_variable cv_worker, cv_consumer;
  std::vector<std::thread> threads;
  bool stop = false;

  void worker() {
    for (;;) {
      size_t idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_worker.wait(lk, [&] {
          return stop || (next_issue < paths.size() &&
                          next_issue < next_serve + window);
        });
        if (stop) return;
        idx = next_issue++;
      }
      Slot s;
      s.px.resize(cap_px);
      s.status = png_read_gray_f32(paths[idx].c_str(), s.px.data(), cap_px,
                                   &s.h, &s.w);
      s.ready = true;
      {
        std::lock_guard<std::mutex> lk(mu);
        done[idx] = std::move(s);
      }
      cv_consumer.notify_all();
    }
  }
};

void* prefetch_create(const char** paths, int64_t n, int64_t cap_px,
                      int32_t n_threads, int32_t window) {
  auto* pf = new Prefetcher();
  pf->paths.assign(paths, paths + n);
  pf->cap_px = cap_px;
  pf->window = (size_t)window;
  for (int32_t t = 0; t < n_threads; ++t)
    pf->threads.emplace_back([pf] { pf->worker(); });
  return pf;
}

// Blocks until the next in-order frame is decoded; returns its status.
int32_t prefetch_next(void* h, float* out, int64_t out_cap, int32_t* out_h,
                      int32_t* out_w) {
  auto* pf = (Prefetcher*)h;
  std::unique_lock<std::mutex> lk(pf->mu);
  const size_t idx = pf->next_serve;
  if (idx >= pf->paths.size()) return -99;  // exhausted
  pf->cv_worker.notify_all();
  pf->cv_consumer.wait(lk, [&] { return pf->done.count(idx) > 0; });
  Prefetcher::Slot s = std::move(pf->done[idx]);
  pf->done.erase(idx);
  ++pf->next_serve;
  pf->cv_worker.notify_all();
  lk.unlock();
  if (s.status == 0) {
    const int64_t npx = (int64_t)s.h * s.w;
    if (npx > out_cap) return -3;
    std::memcpy(out, s.px.data(), sizeof(float) * npx);
    *out_h = s.h;
    *out_w = s.w;
  }
  return s.status;
}

void prefetch_destroy(void* h) {
  auto* pf = (Prefetcher*)h;
  {
    std::lock_guard<std::mutex> lk(pf->mu);
    pf->stop = true;
  }
  pf->cv_worker.notify_all();
  for (auto& t : pf->threads) t.join();
  delete pf;
}

}  // extern "C"
