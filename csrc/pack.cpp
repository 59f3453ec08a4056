// Native TightScene cut + pack (the host-build epilogue).
//
// Re-designs the numpy epilogue of bvh_tpu/ops/cluster.py::build_tight_scene
// (cut_clusters + lane assignment + group-row packing), which costs ~40 ms
// at 120k triangles on this one-core host — the reference's whole serial
// build is 37 ms (src/bvh/bvh_impl.rs:40-45), so the pack must not dominate.
// One O(total) pass: walk each cluster root's DFS range, assign every leaf
// triangle a lane (cluster*W + slot) and write its cluster-relative rows
// directly in the kernel's [G, 16, 128] transposed layout.
//
// Outputs are required to be bit-identical to the numpy path
// (differentially tested in tests/test_native.py).

#include <cstdint>

extern "C" {

// Per-triangle AABBs: mn/mx[n,3] from vertex arrays a/b/c[n,3].
int bvh_tri_aabbs(const float* a, const float* b, const float* c, int64_t n,
                  float* mn, float* mx) {
  for (int64_t i = 0; i < n; ++i) {
    for (int d = 0; d < 3; ++d) {
      float va = a[3 * i + d], vb = b[3 * i + d], vc = c[3 * i + d];
      float lo = va < vb ? va : vb;
      lo = lo < vc ? lo : vc;
      float hi = va > vb ? va : vb;
      hi = hi > vc ? hi : vc;
      mn[3 * i + d] = lo;
      mx[3 * i + d] = hi;
    }
  }
  return 0;
}

// Cut a DFS entry/exit tree into maximal subtrees of <= leaf_size shapes.
// Writes cluster root node indices (DFS order) into roots (capacity >= n
// shapes); returns the cluster count C, or -1 on error.
int64_t bvh_cut_tight(const int32_t* entry, const int32_t* exit_,
                      int64_t total, int32_t leaf_size, int32_t* roots) {
  int64_t C = 0;
  int64_t i = 0;
  while (i < total) {
    // shapes under node i: (exit - i + 1) / 2  (2k-1 nodes <=> k shapes)
    int64_t count = ((int64_t)exit_[i] - i + 1) / 2;
    if (count <= leaf_size) {
      roots[C++] = (int32_t)i;
      i = exit_[i];  // skip the whole subtree: it IS the cluster
    } else {
      i += 1;  // descend (DFS: left child is i+1)
    }
  }
  return C;
}

// Pack triangles into the tight kernel's group rows.
//   a,b,c      [n,3] vertices
//   shape      [total] tri id at leaves (-1 internal)
//   entry,exit [total] DFS tree
//   roots      [C] cluster root node ids (from bvh_cut_tight)
//   cc         [C,3] cluster centers (caller computes from root boxes)
//   groups     [G*16*128] OUT (caller zero-filled), layout [G,16,128],
//              lane L = cluster*W + slot, g = L/128, col = L%128
//   tri_map    [G*128] OUT (caller -1-filled)
int bvh_pack_tight(const float* a, const float* b, const float* c,
                   const int32_t* shape, const int32_t* entry,
                   const int32_t* exit_, const int32_t* roots, int64_t C,
                   int32_t W, const float* cc, float* groups,
                   int32_t* tri_map) {
  for (int64_t k = 0; k < C; ++k) {
    int64_t node = roots[k];
    int64_t end = exit_[node];
    int64_t slot = 0;
    float cx = cc[3 * k + 0], cy = cc[3 * k + 1], cz = cc[3 * k + 2];
    for (int64_t i = node; i < end; ++i) {
      if (entry[i] >= 0) continue;  // internal
      int32_t tid = shape[i];
      int64_t L = k * W + slot;
      ++slot;
      if (slot > W) return 1;  // cluster overflow: cut invariant broken
      int64_t g = L >> 7;
      int64_t col = L & 127;
      float* base = groups + (g * 16) * 128 + col;
      float ax = a[3 * tid], ay = a[3 * tid + 1], az = a[3 * tid + 2];
      float bx = b[3 * tid], by = b[3 * tid + 1], bz = b[3 * tid + 2];
      float cxx = c[3 * tid], cyy = c[3 * tid + 1], czz = c[3 * tid + 2];
      base[0 * 128] = ax - cx;   // a' rows
      base[1 * 128] = ay - cy;
      base[2 * 128] = az - cz;
      base[3 * 128] = bx - ax;   // e1 rows
      base[4 * 128] = by - ay;
      base[5 * 128] = bz - az;
      base[6 * 128] = cxx - ax;  // e2 rows
      base[7 * 128] = cyy - ay;
      base[8 * 128] = czz - az;
      tri_map[L] = tid;
    }
  }
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Wide (K-ary group-walk) table construction — C++ port of
// bvh_tpu/ops/cluster.py::build_wide_table (the hierarchical frontier cut).
// Input: the BINARY upper entry/exit table [8, nn] (row-major, row r at
// nodes + r*nn). Output: gnodes [(7K+1), Gn] (NaN empty boxes, payload -1,
// leaf-mask row 7K), gslot [num_clusters], depth via out_depth.
// Returns Gn (bucketed to a multiple of 8) or -1 on failure (caller falls
// back to the numpy path; gnodes_cap is the allocated column capacity).
// ---------------------------------------------------------------------------

#include <cmath>
#include <cstring>
#include <vector>
#include <algorithm>
#include <cstdint>

extern "C" int64_t bvh_build_wide(const float* nodes, int64_t nn,
                                  int64_t num_clusters, int32_t K,
                                  float* gnodes, int64_t gnodes_cap,
                                  int32_t* gslot, int32_t* out_depth) {
  if (nn <= 0 || K < 2) return -1;
  const float* amin = nodes;            // rows 0..2
  const float* amax = nodes + 3 * nn;   // rows 3..5
  const float* entry_f = nodes + 6 * nn;
  const float* exit_f = nodes + 7 * nn;
  std::vector<int64_t> entry(nn), exit_(nn);
  for (int64_t i = 0; i < nn; ++i) {
    entry[i] = (int64_t)entry_f[i];
    exit_[i] = (int64_t)exit_f[i];
  }
  const float NaN = std::nanf("");

  auto fill_empty = [&](int64_t Gn) {
    for (int64_t r = 0; r < 7 * K + 1; ++r) {
      float v = (r < 7 * K && r % 7 == 6) ? -1.0f : ((r == 7 * K) ? 0.0f : NaN);
      float* row = gnodes + r * Gn;
      for (int64_t g = 0; g < Gn; ++g) row[g] = v;
    }
  };

  if (entry[0] < 0) {  // single-leaf tree: one group, child 0 = the root
    int64_t Gn = 8;
    if (Gn > gnodes_cap) return -1;
    fill_empty(Gn);
    for (int r = 0; r < 3; ++r) gnodes[r * Gn] = amin[r * nn];
    for (int r = 0; r < 3; ++r) gnodes[(3 + r) * Gn] = amax[r * nn];
    gnodes[6 * Gn] = entry_f[0];
    gnodes[(7 * K) * Gn] = 1.0f;
    int64_t c0 = (int64_t)(-entry_f[0]) - 1;
    if (c0 >= 0 && c0 < num_clusters) gslot[c0] = 0;
    *out_depth = 1;
    return Gn;
  }

  // parents (binary table: left = entry[i], right = exit[left])
  std::vector<int64_t> parent(nn, -1);
  for (int64_t i = 0; i < nn; ++i) {
    if (entry[i] >= 0) {
      int64_t l = entry[i], r = exit_[l];
      if (l < 0 || l >= nn || r < 0 || r >= nn || r >= exit_[i]) return -1;
      parent[l] = i;
      parent[r] = i;
    }
  }

  // levels: frontier cut, identical to the numpy algorithm
  std::vector<std::vector<int64_t>> levels;
  std::vector<int64_t> marks;
  for (int64_t i = 0; i < nn; ++i)
    if (entry[i] < 0) marks.push_back(i);
  levels.push_back(marks);
  while (!(marks.size() == 1 && marks[0] == 0)) {
    std::vector<int64_t> roots;
    std::vector<int64_t> cnt(nn);
    for (int64_t i = 0; i < nn; ++i) {
      auto lo = std::lower_bound(marks.begin(), marks.end(), i);
      auto hi = std::lower_bound(marks.begin(), marks.end(), exit_[i]);
      cnt[i] = hi - lo;
    }
    for (int64_t i = 0; i < nn; ++i) {
      bool small_i = cnt[i] <= K;
      bool psmall = parent[i] >= 0 && cnt[parent[i]] <= K;
      if (small_i && !psmall && cnt[i] >= 1) roots.push_back(i);
    }
    if (!(roots.size() < marks.size() || roots.size() == 1)) return -1;
    levels.push_back(roots);
    marks = roots;
  }
  int64_t depth = (int64_t)levels.size() - 1;

  int64_t n_groups = 0;
  for (size_t lv = 1; lv < levels.size(); ++lv) n_groups += levels[lv].size();
  // _bucket(n_groups, 8): ceil to a multiple of the 1/8-granularity
  // power-of-two bucket (must match cluster.py::_bucket exactly — the
  // numpy path pads to the same shape)
  int64_t bl = 0;
  for (int64_t t = n_groups; t; t >>= 1) ++bl;
  int64_t bkt = (int64_t)1 << std::max<int64_t>(bl - 3, 0);
  if (bkt < 8) bkt = 8;
  int64_t Gn = ((n_groups + bkt - 1) / bkt) * bkt;
  if (Gn < 8) Gn = 8;
  if (Gn > gnodes_cap) return -1;
  fill_empty(Gn);

  // level-major ids, top level first (root group id 0)
  std::vector<int64_t> offset(depth + 1, 0);
  int64_t acc = 0;
  for (int64_t lvl = depth; lvl >= 1; --lvl) {
    offset[lvl] = acc;
    acc += (int64_t)levels[lvl].size();
  }
  for (int64_t lvl = depth; lvl >= 1; --lvl) {
    const auto& roots = levels[lvl];
    const auto& prev = levels[lvl - 1];
    size_t pi = 0;
    for (size_t ri = 0; ri < roots.size(); ++ri) {
      int64_t g = offset[lvl] + (int64_t)ri;
      int64_t lim = exit_[roots[ri]];
      int64_t k = 0;
      while (pi < prev.size() && prev[pi] < lim) {
        if (k >= K) return -1;
        int64_t ch = prev[pi];
        for (int r = 0; r < 3; ++r) gnodes[(7 * k + r) * Gn + g] = amin[r * nn + ch];
        for (int r = 0; r < 3; ++r) gnodes[(7 * k + 3 + r) * Gn + g] = amax[r * nn + ch];
        if (lvl == 1) {
          float pay = entry_f[ch];  // -(cluster+1)
          gnodes[(7 * k + 6) * Gn + g] = pay;
          int64_t cl = (int64_t)(-pay) - 1;
          if (cl < 0 || cl >= num_clusters) return -1;
          gslot[cl] = (int32_t)(g * K + k);
          gnodes[(7 * K) * Gn + g] += (float)(1 << k);
        } else {
          gnodes[(7 * k + 6) * Gn + g] = (float)(offset[lvl - 1] + (int64_t)pi);
        }
        ++pi;
        ++k;
      }
      if (k < 1) return -1;
    }
    if (pi != prev.size()) return -1;
  }
  *out_depth = (int32_t)depth;
  return Gn;
}
