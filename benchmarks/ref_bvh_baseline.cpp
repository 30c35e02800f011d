// Head-to-head baseline: the reference engine's CPU path, reimplemented in
// C++ so it can run at compiled (numba-equivalent) speed in environments
// without numba.
//
// This is a faithful reproduction of the REFERENCE's algorithm — median-split
// BVH over the longest centroid axis with leaf size 8
// (reference: src/raystrack/utils/bvh.py:14-72), near-child-first stack
// traversal pruned by the running nearest hit
// (reference: src/raystrack/utils/cpu_trace.py:120-277), Möller–Trumbore with
// the reference's epsilons (|det| >= 1e-7, t > 1e-6), f32 math with fastmath
// (mirroring numba's fastmath=True), parallel over rays — NOT a
// state-of-the-art SBVH. It exists to answer one question honestly: how fast
// is the reference's own accelerated path on this host's CPU cores vs the
// TPU-native gated sweep on one chip, at equal work and equal hit accounting.
//
// It is a benchmark harness, not part of raystrack_tpu; the framework's
// acceleration structure is the two-level distance gate (see
// raystrack_tpu/ops/trace_pallas.py), not a BVH.
//
// Input (binary, little-endian), written by benchmarks/head_to_head.py:
//   int64 n_tri, int64 n_rays, int32 n_surf, int32 emit_sid, int32 min_sid
//   int32 surf_active[n_surf]
//   f32 v0[n_tri][3], e1[n_tri][3], e2[n_tri][3], norm[n_tri][3]
//   int32 sid[n_tri]
//   f32 orig[n_rays][3], dirs[n_rays][3]
// Output: one JSON line on stdout with build/trace timing and the same hit
// checksum the TPU bench computes (sum over surfaces of front-facing nearest
// hits on matrix-eligible receivers).
//
// Build: g++ -O3 -march=native -ffast-math -funroll-loops -std=c++17 -pthread

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr float kInf = 1.0e20f;
constexpr int kLeafSize = 8;   // reference: bvh.py:4
constexpr int kStackSize = 64; // reference: cpu_trace.py:9

struct Scene {
  int64_t n_tri = 0;
  std::vector<float> v0, e1, e2, norm; // n_tri * 3 each
  std::vector<int32_t> sid;
};

struct Bvh {
  // Node arrays, SoA like the reference's build output (bvh.py:66-72).
  std::vector<float> bmin, bmax; // n_nodes * 3
  std::vector<int32_t> left, right, start, count;
  std::vector<int32_t> order; // triangle permutation, leaf ranges index it
};

double now_s() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

// Median split on the longest extent axis, leaf <= 8 — the reference's exact
// build rule (bvh.py:49-61). Iterative with an explicit work stack (the
// reference recurses; at 10M triangles recursion depth is fine either way,
// an explicit stack just avoids any platform limit).
Bvh build_bvh(const Scene& s) {
  const int64_t m = s.n_tri;
  std::vector<float> tmin(m * 3), tmax(m * 3), cent(m * 3);
  for (int64_t i = 0; i < m; ++i) {
    for (int a = 0; a < 3; ++a) {
      const float p0 = s.v0[i * 3 + a];
      const float p1 = p0 + s.e1[i * 3 + a];
      const float p2 = p0 + s.e2[i * 3 + a];
      tmin[i * 3 + a] = std::min(p0, std::min(p1, p2));
      tmax[i * 3 + a] = std::max(p0, std::max(p1, p2));
      cent[i * 3 + a] = (p0 + p1 + p2) / 3.0f;
    }
  }

  Bvh b;
  std::vector<int32_t> idx(m);
  for (int64_t i = 0; i < m; ++i) idx[i] = static_cast<int32_t>(i);
  b.order.reserve(m);

  struct Job {
    int64_t lo, hi;  // range into idx
    int32_t node;    // node id to fill
  };
  auto alloc_node = [&b]() {
    const int32_t id = static_cast<int32_t>(b.left.size());
    b.bmin.insert(b.bmin.end(), {0, 0, 0});
    b.bmax.insert(b.bmax.end(), {0, 0, 0});
    b.left.push_back(-1);
    b.right.push_back(-1);
    b.start.push_back(0);
    b.count.push_back(0);
    return id;
  };

  std::vector<Job> jobs;
  jobs.push_back({0, m, alloc_node()});
  while (!jobs.empty()) {
    const Job j = jobs.back();
    jobs.pop_back();
    float lo[3] = {kInf, kInf, kInf}, hi[3] = {-kInf, -kInf, -kInf};
    for (int64_t k = j.lo; k < j.hi; ++k) {
      const int32_t t = idx[k];
      for (int a = 0; a < 3; ++a) {
        lo[a] = std::min(lo[a], tmin[t * 3 + a]);
        hi[a] = std::max(hi[a], tmax[t * 3 + a]);
      }
    }
    std::memcpy(&b.bmin[j.node * 3], lo, sizeof lo);
    std::memcpy(&b.bmax[j.node * 3], hi, sizeof hi);

    const int64_t n = j.hi - j.lo;
    if (n <= kLeafSize) {
      b.start[j.node] = static_cast<int32_t>(b.order.size());
      b.count[j.node] = static_cast<int32_t>(n);
      for (int64_t k = j.lo; k < j.hi; ++k) b.order.push_back(idx[k]);
      continue;
    }
    int axis = 0;
    float best_ext = hi[0] - lo[0];
    for (int a = 1; a < 3; ++a) {
      const float ext = hi[a] - lo[a];
      if (ext > best_ext) {
        best_ext = ext;
        axis = a;
      }
    }
    const int64_t mid = j.lo + n / 2;
    // nth_element realizes the same median-by-centroid split membership as
    // the reference's full argsort (bvh.py:56-57) in O(n) per level.
    std::nth_element(idx.begin() + j.lo, idx.begin() + mid,
                     idx.begin() + j.hi, [&cent, axis](int32_t a, int32_t c) {
                       return cent[a * 3 + axis] < cent[c * 3 + axis];
                     });
    const int32_t l = alloc_node();
    const int32_t r = alloc_node();
    b.left[j.node] = l;
    b.right[j.node] = r;
    jobs.push_back({j.lo, mid, l});
    jobs.push_back({mid, j.hi, r});
  }
  return b;
}

// Slab test returning the entry parameter, or kInf on a miss
// (reference: cpu_trace.py:12-42).
inline float aabb_tmin(const float o[3], const float inv[3], const float* bmin,
                       const float* bmax) {
  float tmin = -kInf, tmax = kInf;
  for (int a = 0; a < 3; ++a) {
    float t0 = (bmin[a] - o[a]) * inv[a];
    float t1 = (bmax[a] - o[a]) * inv[a];
    if (t0 > t1) std::swap(t0, t1);
    if (t0 > tmin) tmin = t0;
    if (t1 < tmax) tmax = t1;
    if (tmin > tmax) return kInf;
  }
  if (tmax < 0.0f) return kInf;
  return tmin > 0.0f ? tmin : 0.0f;
}

struct TraceCtx {
  const Scene* s;
  const Bvh* b;
  const std::vector<int32_t>* surf_active;
  int32_t emit_sid, min_sid;
  const float* orig;
  const float* dirs;
  int32_t* out_sid;   // nearest eligible hit surface, or -1
  uint8_t* out_front; // 1 when the nearest hit is front-facing
  int64_t n_rays;
};

// One ray: reference traversal (cpu_trace.py:142-277) — near child first,
// subtree pruned when its entry t can no longer beat the running best.
void trace_ray(const TraceCtx& c, int64_t k) {
  const float o[3] = {c.orig[k * 3], c.orig[k * 3 + 1], c.orig[k * 3 + 2]};
  const float d[3] = {c.dirs[k * 3], c.dirs[k * 3 + 1], c.dirs[k * 3 + 2]};
  float inv[3];
  for (int a = 0; a < 3; ++a)
    inv[a] = std::fabs(d[a]) > 1e-9f ? 1.0f / d[a] : 1e10f;

  const Bvh& b = *c.b;
  const Scene& s = *c.s;
  float best = kInf;
  int32_t hit = -1;
  uint8_t front = 0;

  const float root_t = aabb_tmin(o, inv, &b.bmin[0], &b.bmax[0]);
  if (root_t < kInf) {
    int32_t stack[kStackSize];
    float tstack[kStackSize];
    int sp = 0;
    stack[sp] = 0;
    tstack[sp] = root_t;
    ++sp;
    while (sp > 0) {
      --sp;
      const int32_t node = stack[sp];
      if (tstack[sp] >= best) continue;
      if (b.count[node] > 0) {
        for (int32_t t = 0; t < b.count[node]; ++t) {
          const int32_t tri = b.order[b.start[node] + t];
          const int32_t surf = s.sid[tri];
          // reference skip rule (cpu_trace.py:46-52)
          if ((*c.surf_active)[surf] == 0 || surf < c.min_sid ||
              surf == c.emit_sid)
            continue;
          const float* e1 = &s.e1[tri * 3];
          const float* e2 = &s.e2[tri * 3];
          const float px = d[1] * e2[2] - d[2] * e2[1];
          const float py = d[2] * e2[0] - d[0] * e2[2];
          const float pz = d[0] * e2[1] - d[1] * e2[0];
          const float det = e1[0] * px + e1[1] * py + e1[2] * pz;
          if (std::fabs(det) < 1e-7f) continue;
          const float inv_det = 1.0f / det;
          const float tx = o[0] - s.v0[tri * 3];
          const float ty = o[1] - s.v0[tri * 3 + 1];
          const float tz = o[2] - s.v0[tri * 3 + 2];
          const float u = (tx * px + ty * py + tz * pz) * inv_det;
          if (u < 0.0f || u > 1.0f) continue;
          const float qx = ty * e1[2] - tz * e1[1];
          const float qy = tz * e1[0] - tx * e1[2];
          const float qz = tx * e1[1] - ty * e1[0];
          const float v = (d[0] * qx + d[1] * qy + d[2] * qz) * inv_det;
          if (v < 0.0f || u + v > 1.0f) continue;
          const float tp = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det;
          if (tp > 1e-6f && tp < best) {
            best = tp;
            hit = surf;
            const float* n = &s.norm[tri * 3];
            front = (-(d[0] * n[0] + d[1] * n[1] + d[2] * n[2]) > 0.0f) ? 1 : 0;
          }
        }
      } else {
        const int32_t ln = b.left[node], rn = b.right[node];
        const float tl = aabb_tmin(o, inv, &b.bmin[ln * 3], &b.bmax[ln * 3]);
        const float tr = aabb_tmin(o, inv, &b.bmin[rn * 3], &b.bmax[rn * 3]);
        // push far child first so the near child pops first
        const int32_t first = tl < tr ? ln : rn;
        const int32_t second = tl < tr ? rn : ln;
        const float tfirst = std::min(tl, tr), tsecond = std::max(tl, tr);
        if (tsecond < best && sp < kStackSize) {
          stack[sp] = second;
          tstack[sp] = tsecond;
          ++sp;
        }
        if (tfirst < best && sp < kStackSize) {
          stack[sp] = first;
          tstack[sp] = tfirst;
          ++sp;
        }
      }
    }
  }
  c.out_sid[k] = hit;
  c.out_front[k] = hit >= 0 ? front : 0;
}

void trace_all(const TraceCtx& c, int n_threads) {
  if (n_threads <= 1) {
    for (int64_t k = 0; k < c.n_rays; ++k) trace_ray(c, k);
    return;
  }
  std::atomic<int64_t> next(0);
  constexpr int64_t kGrain = 1024;
  auto worker = [&]() {
    for (;;) {
      const int64_t lo = next.fetch_add(kGrain);
      if (lo >= c.n_rays) break;
      const int64_t hi = std::min(lo + kGrain, c.n_rays);
      for (int64_t k = lo; k < hi; ++k) trace_ray(c, k);
    }
  };
  std::vector<std::thread> pool;
  for (int i = 0; i < n_threads; ++i) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
}

template <typename T>
void read_vec(FILE* f, std::vector<T>& v, size_t n) {
  v.resize(n);
  if (fread(v.data(), sizeof(T), n, f) != n) {
    fprintf(stderr, "short read\n");
    exit(2);
  }
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s scene.bin [n_threads] [reps]\n", argv[0]);
    return 2;
  }
  FILE* f = fopen(argv[1], "rb");
  if (!f) {
    perror("open");
    return 2;
  }
  int64_t n_tri = 0, n_rays = 0;
  int32_t n_surf = 0, emit_sid = 0, min_sid = 0;
  if (fread(&n_tri, 8, 1, f) + fread(&n_rays, 8, 1, f) +
          fread(&n_surf, 4, 1, f) + fread(&emit_sid, 4, 1, f) +
          fread(&min_sid, 4, 1, f) !=
      5) {
    fprintf(stderr, "bad header\n");
    return 2;
  }
  std::vector<int32_t> surf_active;
  read_vec(f, surf_active, n_surf);
  Scene s;
  s.n_tri = n_tri;
  read_vec(f, s.v0, n_tri * 3);
  read_vec(f, s.e1, n_tri * 3);
  read_vec(f, s.e2, n_tri * 3);
  read_vec(f, s.norm, n_tri * 3);
  read_vec(f, s.sid, n_tri);
  std::vector<float> orig, dirs;
  read_vec(f, orig, n_rays * 3);
  read_vec(f, dirs, n_rays * 3);
  fclose(f);

  const int hw = static_cast<int>(std::thread::hardware_concurrency());
  const int n_threads = argc > 2 ? atoi(argv[2]) : std::max(1, hw);
  const int reps = argc > 3 ? atoi(argv[3]) : 3;

  const double b0 = now_s();
  const Bvh b = build_bvh(s);
  const double build_s = now_s() - b0;

  std::vector<int32_t> out_sid(n_rays);
  std::vector<uint8_t> out_front(n_rays);
  TraceCtx ctx{&s,           &b,           &surf_active, emit_sid,
               min_sid,      orig.data(),  dirs.data(),  out_sid.data(),
               out_front.data(), n_rays};

  double best_s = 1e30;
  for (int r = 0; r < reps; ++r) {
    const double t0 = now_s();
    trace_all(ctx, n_threads);
    best_s = std::min(best_s, now_s() - t0);
  }

  // Same accounting as the TPU bench's checksum: front-facing nearest hits
  // summed over receiver surfaces (bench.py _force == sum of counts_f).
  int64_t hits_front = 0, hits_back = 0;
  for (int64_t k = 0; k < n_rays; ++k) {
    if (out_sid[k] >= 0) {
      if (out_front[k])
        ++hits_front;
      else
        ++hits_back;
    }
  }

  printf(
      "{\"n_tri\": %lld, \"n_rays\": %lld, \"threads\": %d, "
      "\"build_s\": %.3f, \"trace_s\": %.4f, \"rays_per_sec\": %.0f, "
      "\"hits_front\": %lld, \"hits_back\": %lld, \"n_nodes\": %zu}\n",
      static_cast<long long>(n_tri), static_cast<long long>(n_rays), n_threads,
      build_s, best_s, n_rays / best_s, static_cast<long long>(hits_front),
      static_cast<long long>(hits_back), b.left.size());
  return 0;
}
