// Native LBVH builder: Morton sort + Karras radix-tree + threaded
// (preorder/skip-link) layout emission.
//
// This is the TPU framework's native runtime piece for acceleration
// structure builds — the role DXR BLAS/TLAS builds play in the reference
// (Sample.cpp:1088-1242); per-frame rebuilds of animated scenes run here
// while the device consumes the packed [M,17] node table
// (rtxpt_tpu/accel/bvh.py layout).
//
// Exposed via a C ABI for ctypes (rtxpt_tpu/accel/native.py). The
// algorithm matches the numpy reference implementation in
// rtxpt_tpu/accel/lbvh.py (Karras 2012), bit-for-bit in topology.
//
// Build: g++ -O3 -shared -fPIC -o librtxpt_lbvh.so lbvh.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline uint64_t expand_bits(uint64_t v) {
  v = (v * 0x00010001ULL) & 0xFF0000FFULL;
  v = (v * 0x00000101ULL) & 0x0F00F00FULL;
  v = (v * 0x00000011ULL) & 0xC30C30C3ULL;
  v = (v * 0x00000005ULL) & 0x49249249ULL;
  return v;
}

inline int delta(const std::vector<uint64_t>& keys, int64_t i, int64_t j,
                 int64_t n) {
  if (j < 0 || j >= n) return -1;
  uint64_t x = keys[i] ^ keys[j];
  if (x == 0) return 64;
  return __builtin_clzll(x);
}

struct Range { int64_t lo, hi, gamma; };

}  // namespace

extern "C" {

// positions: [n_vertices,3] f32; indices: [n_tris,3] i32
// out_nodes: [2*n_tris-1, 17] f32 (threaded preorder layout)
// out_prim_tri: [n_tris] i32 (leaf-order -> original tri id)
// Returns 0 on success.
int rtxpt_build_lbvh(const float* positions, int64_t n_vertices,
                     const int32_t* indices, int64_t n_tris,
                     float* out_nodes, int32_t* out_prim_tri) {
  (void)n_vertices;
  const int64_t n = n_tris;
  if (n < 1) return 1;
  const float kEps = 1e-7f;

  // --- per-tri AABBs + centroids ---
  std::vector<float> tmin(n * 3), tmax(n * 3), cent(n * 3);
  float smin[3] = {1e30f, 1e30f, 1e30f}, smax[3] = {-1e30f, -1e30f, -1e30f};
  for (int64_t t = 0; t < n; ++t) {
    const float* v0 = positions + 3 * (int64_t)indices[3 * t + 0];
    const float* v1 = positions + 3 * (int64_t)indices[3 * t + 1];
    const float* v2 = positions + 3 * (int64_t)indices[3 * t + 2];
    for (int k = 0; k < 3; ++k) {
      float lo = std::min(v0[k], std::min(v1[k], v2[k]));
      float hi = std::max(v0[k], std::max(v1[k], v2[k]));
      tmin[3 * t + k] = lo;
      tmax[3 * t + k] = hi;
      cent[3 * t + k] = 0.5f * (lo + hi);
      smin[k] = std::min(smin[k], lo);
      smax[k] = std::max(smax[k], hi);
    }
  }

  // --- morton codes + sort ---
  std::vector<std::pair<uint64_t, int32_t>> order(n);
  for (int64_t t = 0; t < n; ++t) {
    uint64_t code = 0;
    uint64_t q[3];
    for (int k = 0; k < 3; ++k) {
      float ext = std::max(smax[k] - smin[k], 1e-12f);
      float x = (cent[3 * t + k] - smin[k]) / ext * 1024.0f;
      x = std::min(std::max(x, 0.0f), 1023.0f);
      q[k] = (uint64_t)x;
    }
    code = (expand_bits(q[0]) << 2) | (expand_bits(q[1]) << 1)
           | expand_bits(q[2]);
    order[t] = {code, (int32_t)t};
  }
  std::stable_sort(order.begin(), order.end(),
                   [](const auto& a, const auto& b) {
                     return a.first < b.first;
                   });
  std::vector<uint64_t> keys(n);
  for (int64_t i = 0; i < n; ++i) {
    keys[i] = (order[i].first << 32) | (uint64_t)i;
    out_prim_tri[i] = order[i].second;
  }

  if (n == 1) {
    const int64_t t = out_prim_tri[0];
    float* row = out_nodes;
    for (int k = 0; k < 3; ++k) {
      row[k] = tmin[3 * t + k] - kEps;
      row[3 + k] = tmax[3 * t + k] + kEps;
    }
    row[6] = 0.0f;
    row[7] = -1.0f;
    const float* v0 = positions + 3 * (int64_t)indices[3 * t + 0];
    const float* v1 = positions + 3 * (int64_t)indices[3 * t + 1];
    const float* v2 = positions + 3 * (int64_t)indices[3 * t + 2];
    for (int k = 0; k < 3; ++k) {
      row[8 + k] = v0[k];
      row[11 + k] = v1[k] - v0[k];
      row[14 + k] = v2[k] - v0[k];
    }
    return 0;
  }

  // --- Karras topology: internal nodes 0..n-2 ---
  const int64_t ni = n - 1;
  std::vector<int64_t> left(ni), right(ni);   // child ids: leaf k = ni + k
  std::vector<Range> rng(ni);
  for (int64_t i = 0; i < ni; ++i) {
    int d = (delta(keys, i, i + 1, n) - delta(keys, i, i - 1, n)) > 0 ? 1
                                                                      : -1;
    int dmin = delta(keys, i, i - d, n);
    int64_t lmax = 2;
    while (delta(keys, i, i + lmax * d, n) > dmin) lmax *= 2;
    int64_t l = 0;
    for (int64_t t = lmax / 2; t >= 1; t /= 2)
      if (delta(keys, i, i + (l + t) * d, n) > dmin) l += t;
    int64_t j = i + l * d;
    int dnode = delta(keys, i, j, n);
    int64_t s = 0, t = l;
    do {
      t = (t + 1) >> 1;
      if (delta(keys, i, i + (s + t) * d, n) > dnode) s += t;
    } while (t > 1);
    int64_t gamma = i + s * d + std::min(d, 0);
    int64_t lo = std::min(i, j), hi = std::max(i, j);
    left[i] = (lo == gamma) ? (ni + gamma) : gamma;
    right[i] = (hi == gamma + 1) ? (ni + gamma + 1) : (gamma + 1);
    rng[i] = {lo, hi, gamma};
  }

  // --- AABBs bottom-up (leaf-to-root counters) ---
  const int64_t m = 2 * n - 1;
  std::vector<float> amin(m * 3), amax(m * 3);
  std::vector<int64_t> parent(m, -1);
  for (int64_t i = 0; i < ni; ++i) {
    parent[left[i]] = i;
    parent[right[i]] = i;
  }
  for (int64_t k = 0; k < n; ++k) {
    const int64_t t = out_prim_tri[k];
    for (int c = 0; c < 3; ++c) {
      amin[3 * (ni + k) + c] = tmin[3 * t + c];
      amax[3 * (ni + k) + c] = tmax[3 * t + c];
    }
  }
  std::vector<int> visits(ni, 0);
  for (int64_t k = 0; k < n; ++k) {
    int64_t node = parent[ni + k];
    while (node >= 0 && ++visits[node] == 2) {
      for (int c = 0; c < 3; ++c) {
        amin[3 * node + c] = std::min(amin[3 * left[node] + c],
                                      amin[3 * right[node] + c]);
        amax[3 * node + c] = std::max(amax[3 * left[node] + c],
                                      amax[3 * right[node] + c]);
      }
      node = parent[node];
    }
  }

  // --- preorder + miss links via explicit DFS ---
  // subtree size of internal i covering [lo,hi] = 2*(hi-lo+1)-1
  std::vector<int64_t> stack;
  std::vector<int64_t> miss_of(m), pre_of(m);
  stack.push_back(0);
  std::vector<int64_t> miss_stack;
  miss_of[0] = -1;
  int64_t counter = 0;
  // iterative preorder with explicit (node, miss) entries
  struct Ent { int64_t node, miss; };
  std::vector<Ent> st;
  st.push_back({0, -1});
  while (!st.empty()) {
    Ent e = st.back();
    st.pop_back();
    int64_t id = counter++;
    pre_of[e.node] = id;
    miss_of[e.node] = e.miss;
    if (e.node < ni) {
      int64_t lsize = 2 * (rng[e.node].gamma - rng[e.node].lo + 1) - 1;
      int64_t pre_right = id + 1 + lsize;
      // push right first so left pops first
      st.push_back({right[e.node], e.miss});
      st.push_back({left[e.node], pre_right});
    }
  }

  // --- emit packed rows ---
  for (int64_t node = 0; node < m; ++node) {
    float* row = out_nodes + 17 * pre_of[node];
    for (int c = 0; c < 3; ++c) {
      row[c] = amin[3 * node + c] - kEps;
      row[3 + c] = amax[3 * node + c] + kEps;
    }
    if (node < ni) {
      row[6] = -1.0f;
      for (int c = 8; c < 17; ++c) row[c] = 0.0f;
    } else {
      const int64_t leaf = node - ni;
      row[6] = (float)leaf;
      const int64_t t = out_prim_tri[leaf];
      const float* v0 = positions + 3 * (int64_t)indices[3 * t + 0];
      const float* v1 = positions + 3 * (int64_t)indices[3 * t + 1];
      const float* v2 = positions + 3 * (int64_t)indices[3 * t + 2];
      for (int c = 0; c < 3; ++c) {
        row[8 + c] = v0[c];
        row[11 + c] = v1[c] - v0[c];
        row[14 + c] = v2[c] - v0[c];
      }
    }
    row[7] = (float)miss_of[node];
  }
  // fix miss links: they are preorder ids of nodes already (computed from
  // preorder counter), nothing to remap.
  return 0;
}

}  // extern "C"
