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
