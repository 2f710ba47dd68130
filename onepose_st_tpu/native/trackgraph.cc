// Native track-graph engine: keypoint merging, conflict-aware union-find
// track building, and greedy keyframe assignment.
//
// C++ counterpart of onepose_st_tpu/sfm/tracks.py (same semantics, bit-for-
// bit outputs; the Python module remains the reference implementation and
// fallback). This is the host-side graph stage that the reference delegates
// to COLMAP's C++ internals (track construction inside point_triangulator)
// and to `coarse_colmap_dataset.py:220-310` (greedy keyframe assignment);
// it is O(matches) pointer-chasing — no MXU work — so it lives in native
// code rather than JAX.
//
// Exposed via a C ABI consumed with ctypes (no pybind11 in this image).
#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct Graph {
  int n_images = 0;
  // merged keypoints, per image
  std::vector<std::vector<float>> kpts;    // [img][2*n]
  std::vector<std::vector<float>> scores;  // [img][n]
  // match rows (img_i, ki, img_j, kj)
  std::vector<int32_t> match_rows;
  // assigned static layout
  int64_t n_tracks = 0;
  int max_track_length = 0;
  std::vector<int32_t> ref_idx;      // [T]
  std::vector<float> kpt0;           // [T*2]
  std::vector<int32_t> obs_idx;      // [T*M]
  std::vector<float> kpt1;           // [T*M*2]
  std::vector<uint8_t> mask;         // [T*M]
  std::vector<int32_t> obs_kpt_ids;  // [T*M]
  std::vector<int32_t> ref_kpt_ids;  // [T]
  std::vector<int32_t> keyframes;
};

inline int64_t quant_key(double u, double v, double quant) {
  // llround matches Python round() for the coordinate magnitudes seen here
  // (bankers-rounding differences only arise at exact .5 in pixel units,
  // which score-weighted float averages never hit in practice).
  int64_t qx = static_cast<int64_t>(std::llround(u / quant));
  int64_t qy = static_cast<int64_t>(std::llround(v / quant));
  return (qx << 32) ^ (qy & 0xffffffffLL);
}

// ---- stage 1: merge keypoints on a quant-pixel grid, score-weighted ----
void merge_keypoints(Graph& g, int n_pairs, const int32_t* pair_imgs,
                     const int64_t* pair_offsets, const float* uv_i,
                     const float* uv_j, const float* score, double quant) {
  int n = g.n_images;
  std::vector<std::unordered_map<int64_t, int32_t>> keys(n);
  std::vector<std::vector<double>> acc_uv(n);  // [img][2*n] score-weighted sum
  std::vector<std::vector<double>> acc_w(n);
  // pre-size the hash tables (rehash churn dominates otherwise)
  {
    std::vector<int64_t> per_img(n, 0);
    for (int p = 0; p < n_pairs; ++p) {
      int64_t cnt = pair_offsets[p + 1] - pair_offsets[p];
      per_img[pair_imgs[2 * p]] += cnt;
      per_img[pair_imgs[2 * p + 1]] += cnt;
    }
    for (int img = 0; img < n; ++img)
      keys[img].reserve(static_cast<size_t>(per_img[img] / 2 + 16));
  }
  g.match_rows.reserve(4 * static_cast<size_t>(pair_offsets[n_pairs]));

  auto intern = [&](int img, double u, double v, double s) -> int32_t {
    auto& table = keys[img];
    int64_t key = quant_key(u, v, quant);
    auto it = table.find(key);
    if (it == table.end()) {
      int32_t idx = static_cast<int32_t>(table.size());
      table.emplace(key, idx);
      acc_uv[img].push_back(u * s);
      acc_uv[img].push_back(v * s);
      acc_w[img].push_back(s);
      return idx;
    }
    int32_t idx = it->second;
    acc_uv[img][2 * idx] += u * s;
    acc_uv[img][2 * idx + 1] += v * s;
    acc_w[img][idx] += s;
    return idx;
  };

  for (int p = 0; p < n_pairs; ++p) {
    int img_i = pair_imgs[2 * p], img_j = pair_imgs[2 * p + 1];
    for (int64_t k = pair_offsets[p]; k < pair_offsets[p + 1]; ++k) {
      double s = score[k];
      int32_t ki = intern(img_i, uv_i[2 * k], uv_i[2 * k + 1], s);
      int32_t kj = intern(img_j, uv_j[2 * k], uv_j[2 * k + 1], s);
      g.match_rows.push_back(img_i);
      g.match_rows.push_back(ki);
      g.match_rows.push_back(img_j);
      g.match_rows.push_back(kj);
    }
  }

  g.kpts.resize(n);
  g.scores.resize(n);
  for (int img = 0; img < n; ++img) {
    size_t m = acc_w[img].size();
    g.kpts[img].resize(2 * m);
    g.scores[img].resize(m);
    for (size_t i = 0; i < m; ++i) {
      double w = acc_w[img][i];
      g.kpts[img][2 * i] = static_cast<float>(acc_uv[img][2 * i] / w);
      g.kpts[img][2 * i + 1] = static_cast<float>(acc_uv[img][2 * i + 1] / w);
      g.scores[img][i] = static_cast<float>(w);
    }
  }
}

// ---- stage 2+3: conflict-aware union-find + greedy keyframe assignment ---
void build_and_assign(Graph& g, int min_track_length, int max_track_length) {
  int n = g.n_images;
  std::vector<int64_t> offsets(n + 1, 0);
  for (int img = 0; img < n; ++img)
    offsets[img + 1] = offsets[img] + static_cast<int64_t>(g.scores[img].size());
  int64_t total = offsets[n];

  std::vector<int64_t> parent(total);
  for (int64_t i = 0; i < total; ++i) parent[i] = i;
  std::vector<int32_t> img_of(total);
  for (int img = 0; img < n; ++img)
    for (int64_t x = offsets[img]; x < offsets[img + 1]; ++x) img_of[x] = img;

  auto find = [&](int64_t x) {
    int64_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {
      int64_t next = parent[x];
      parent[x] = root;
      x = next;
    }
    return root;
  };

  // Per-root observations as SMALL SORTED VECTORS of (img, global kpt id),
  // sorted by img (== sorted by gid, since gid ranges are per-image blocks).
  // A component holds at most one keypoint per image (the conflict rule), so
  // |obs| <= n_images; sorted-vector two-pointer scans beat the previous
  // per-root unordered_maps (720k heap-allocated hash tables at 15k-track
  // scale — the r1 scale-profile hotspot, 8.3 s -> see OPST_TRACE).
  using Obs = std::vector<std::pair<int32_t, int64_t>>;
  std::vector<Obs> obs(total);
  auto get_obs = [&](int64_t root) -> Obs& {
    Obs& o = obs[root];
    if (o.empty()) o.emplace_back(img_of[root], root);
    return o;
  };

  size_t n_matches = g.match_rows.size() / 4;
  Obs merged_tmp;
  for (size_t m = 0; m < n_matches; ++m) {
    const int32_t* row = &g.match_rows[4 * m];
    int64_t a = find(offsets[row[0]] + row[1]);
    int64_t b = find(offsets[row[2]] + row[3]);
    if (a == b) continue;
    Obs* oa = &get_obs(a);
    Obs* ob = &get_obs(b);
    if (oa->size() < ob->size()) {
      std::swap(a, b);
      std::swap(oa, ob);
    }
    // conflict = same image present on both sides (gids always differ across
    // components); sorted two-pointer intersection test
    bool conflict = false;
    {
      auto ia = oa->begin(), ea = oa->end();
      auto ib = ob->begin(), eb = ob->end();
      while (ia != ea && ib != eb) {
        if (ia->first < ib->first) ++ia;
        else if (ib->first < ia->first) ++ib;
        else { conflict = true; break; }
      }
    }
    if (conflict) continue;  // COLMAP's track-conflict rule: drop the edge
    parent[b] = a;
    merged_tmp.clear();
    merged_tmp.reserve(oa->size() + ob->size());
    std::merge(oa->begin(), oa->end(), ob->begin(), ob->end(),
               std::back_inserter(merged_tmp));
    oa->swap(merged_tmp);
    Obs().swap(*ob);  // free b's storage
  }

  // collect components in first-seen order of the global keypoint index;
  // a root's obs vector IS its member list (one keypoint per image)
  std::vector<std::vector<int64_t>> track_members;  // sorted global ids
  std::vector<uint8_t> emitted(total, 0);
  for (int64_t x = 0; x < total; ++x) {
    int64_t r = find(x);
    if (emitted[r]) continue;
    emitted[r] = 1;
    const Obs& o = obs[r];
    // lazily-initialized roots with no accepted union are singletons
    size_t sz = o.empty() ? 1 : o.size();
    if (static_cast<int>(sz) < min_track_length) continue;
    std::vector<int64_t> members;
    members.reserve(sz);
    if (o.empty()) members.push_back(r);
    else for (const auto& kv : o) members.push_back(kv.second);
    track_members.push_back(std::move(members));
  }
  int64_t T = static_cast<int64_t>(track_members.size());
  g.n_tracks = T;
  g.max_track_length = max_track_length;

  // greedy keyframe selection: repeatedly take the image observing the most
  // unassigned tracks (lowest image id on ties, matching np.argmax)
  std::vector<std::vector<int64_t>> img_tracks(n);
  for (int64_t t = 0; t < T; ++t)
    for (int64_t gid : track_members[t]) img_tracks[img_of[gid]].push_back(t);
  std::vector<int64_t> counts(n, 0);
  for (int img = 0; img < n; ++img) counts[img] = img_tracks[img].size();
  std::vector<uint8_t> unassigned(T, 1);
  g.ref_idx.assign(T, -1);
  while (true) {
    int best = -1;
    int64_t best_count = 0;
    for (int img = 0; img < n; ++img)
      if (counts[img] > best_count) {
        best = img;
        best_count = counts[img];
      }
    if (best < 0) break;
    g.keyframes.push_back(best);
    for (int64_t t : img_tracks[best]) {
      if (!unassigned[t]) continue;
      unassigned[t] = 0;
      g.ref_idx[t] = best;
      for (int64_t gid : track_members[t]) --counts[img_of[gid]];
    }
  }

  // pack the static track-major [T, M] layout
  int M = max_track_length;
  g.kpt0.assign(2 * T, 0.f);
  g.ref_kpt_ids.assign(T, 0);
  g.obs_idx.assign(T * M, 0);
  g.kpt1.assign(T * M * 2, 0.f);
  g.obs_kpt_ids.assign(T * M, -1);
  g.mask.assign(T * M, 0);
  for (int64_t t = 0; t < T; ++t) {
    const auto& members = track_members[t];
    int32_t ref = g.ref_idx[t];
    int64_t ref_gid = -1;
    for (int64_t gid : members)
      if (img_of[gid] == ref) {
        ref_gid = gid;
        break;
      }
    int32_t ref_kid = static_cast<int32_t>(ref_gid - offsets[ref]);
    g.ref_kpt_ids[t] = ref_kid;
    g.kpt0[2 * t] = g.kpts[ref][2 * ref_kid];
    g.kpt0[2 * t + 1] = g.kpts[ref][2 * ref_kid + 1];
    int m = 0;
    for (int64_t gid : members) {
      if (gid == ref_gid || m >= M) continue;
      int32_t img = img_of[gid];
      int32_t kid = static_cast<int32_t>(gid - offsets[img]);
      g.obs_idx[t * M + m] = img;
      g.kpt1[(t * M + m) * 2] = g.kpts[img][2 * kid];
      g.kpt1[(t * M + m) * 2 + 1] = g.kpts[img][2 * kid + 1];
      g.obs_kpt_ids[t * M + m] = kid;
      g.mask[t * M + m] = 1;
      ++m;
    }
  }
}

}  // namespace

extern "C" {

void* opst_process(int n_images, int n_pairs, const int32_t* pair_imgs,
                   const int64_t* pair_offsets, const float* uv_i,
                   const float* uv_j, const float* score, double quant,
                   int min_track_length, int max_track_length) {
  auto* g = new Graph();
  g->n_images = n_images;
  const bool trace = std::getenv("OPST_TRACE") != nullptr;
  auto t0 = std::chrono::steady_clock::now();
  merge_keypoints(*g, n_pairs, pair_imgs, pair_offsets, uv_i, uv_j, score,
                  quant);
  auto t1 = std::chrono::steady_clock::now();
  build_and_assign(*g, min_track_length, max_track_length);
  auto t2 = std::chrono::steady_clock::now();
  if (trace) {
    auto ms = [](auto a, auto b) {
      return std::chrono::duration<double, std::milli>(b - a).count();
    };
    std::fprintf(stderr, "[trackgraph] merge %.1f ms, build+assign %.1f ms\n",
                 ms(t0, t1), ms(t1, t2));
  }
  return g;
}

int64_t opst_n_kpts(void* h, int img) {
  return static_cast<Graph*>(h)->scores[img].size();
}

void opst_get_kpts(void* h, int img, float* uv_out, float* score_out) {
  auto* g = static_cast<Graph*>(h);
  std::memcpy(uv_out, g->kpts[img].data(), g->kpts[img].size() * sizeof(float));
  std::memcpy(score_out, g->scores[img].data(),
              g->scores[img].size() * sizeof(float));
}

int64_t opst_n_match_rows(void* h) {
  return static_cast<Graph*>(h)->match_rows.size() / 4;
}

void opst_get_match_rows(void* h, int32_t* out) {
  auto* g = static_cast<Graph*>(h);
  std::memcpy(out, g->match_rows.data(),
              g->match_rows.size() * sizeof(int32_t));
}

int64_t opst_n_tracks(void* h) { return static_cast<Graph*>(h)->n_tracks; }

int opst_n_keyframes(void* h) {
  return static_cast<int>(static_cast<Graph*>(h)->keyframes.size());
}

void opst_get_assigned(void* h, int32_t* ref_idx, float* kpt0,
                       int32_t* obs_idx, float* kpt1, uint8_t* mask,
                       int32_t* obs_kpt_ids, int32_t* ref_kpt_ids,
                       int32_t* keyframes) {
  auto* g = static_cast<Graph*>(h);
  int64_t T = g->n_tracks;
  int M = g->max_track_length;
  std::memcpy(ref_idx, g->ref_idx.data(), T * sizeof(int32_t));
  std::memcpy(kpt0, g->kpt0.data(), 2 * T * sizeof(float));
  std::memcpy(obs_idx, g->obs_idx.data(), T * M * sizeof(int32_t));
  std::memcpy(kpt1, g->kpt1.data(), 2 * T * M * sizeof(float));
  std::memcpy(mask, g->mask.data(), T * M * sizeof(uint8_t));
  std::memcpy(obs_kpt_ids, g->obs_kpt_ids.data(), T * M * sizeof(int32_t));
  std::memcpy(ref_kpt_ids, g->ref_kpt_ids.data(), T * sizeof(int32_t));
  std::memcpy(keyframes, g->keyframes.data(),
              g->keyframes.size() * sizeof(int32_t));
}

void opst_free(void* h) { delete static_cast<Graph*>(h); }

}  // extern "C"
