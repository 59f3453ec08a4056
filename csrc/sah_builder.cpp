// Native host-side binned-SAH BVH builder.
//
// The device path builds with JAX/Pallas; this is the framework's native
// runtime component for host-side construction (large static scenes loaded
// from disk, or hosts feeding many TPU workers). It emits the flat DFS
// entry/exit layout directly (see bvh_tpu/bvh/flat.py) and is required to be
// bit-identical to the Python reference builder (bvh_tpu/bvh/sah_build.py):
// same 6-bucket binning, strict-< SAH plane selection, stable bucket
// partition, median fallback, all in float32 (compile with contraction off).
//
// Parallelism: fork-join over subtrees (std::thread) above a size cutoff —
// the natural CPU shape, analogous to the reference crate's rayon executor.
//
// Build: make -C csrc   (produces libbvhbuild.so; loaded via ctypes)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

#if defined(__SSE2__)
#include <immintrin.h>
#define BVH_SSE 1
#endif

namespace {

constexpr int NB = 6;
constexpr float BUCKET_SCALE = 6.0f - 0.01f;
const float F32_EPS = std::numeric_limits<float>::epsilon();
const float INF = std::numeric_limits<float>::infinity();

struct V3 {
  float x, y, z;
};

// Ties (including -0.0 vs +0.0) must return the SECOND operand to stay
// bit-identical with np.minimum/np.maximum and _mm_min_ps/_mm_max_ps —
// std::min/std::max return the FIRST on ties, which flips the zero sign
// for mixed-sign-zero geometry. (No NaNs reach the builder.)
inline float fmin2(float a, float b) { return a < b ? a : b; }
inline float fmax2(float a, float b) { return a > b ? a : b; }
inline V3 vmin(const V3& a, const V3& b) {
  return {fmin2(a.x, b.x), fmin2(a.y, b.y), fmin2(a.z, b.z)};
}
inline V3 vmax(const V3& a, const V3& b) {
  return {fmax2(a.x, b.x), fmax2(a.y, b.y), fmax2(a.z, b.z)};
}

inline float surface_area(const V3& mn, const V3& mx) {
  // reference area proxy: 2 * size.dot(size)
  float sx = mx.x - mn.x, sy = mx.y - mn.y, sz = mx.z - mn.z;
  return 2.0f * (sx * sx + sy * sy + sz * sz);
}

struct Rec {
  V3 mn, mx, c;  // one 36-byte record per shape: single cache-line gather
};

struct Ctx {
  const float* smin;
  const float* smax;
  std::vector<Rec> rec;  // padded by one record: SSE loads read 1 float past
  std::vector<int8_t> bucket_scratch;  // [n] per-position, segment-passed
  float* out_amin;
  float* out_amax;
  int32_t* entry;
  int32_t* exit_;
  int32_t* shape;
  int32_t* parent;
  int32_t* s2n;
  int64_t total;
  std::atomic<int> threads_left;
  int64_t par_cutoff;
  // Subtrees at or below this leaf count split by MEDIAN instead of binned
  // SAH (0 = never). The tight-scene pipeline cuts the tree into <=W-leaf
  // clusters whose internal structure the packet kernel never traverses
  // (the narrowphase tests all W lanes at once), so the ~15/16 of internal
  // nodes living below the cut pay the full 6-bucket bin+sweep for nothing.
  // Median splits keep the SAME leaf sets per subtree (the cut roots are
  // "first node on each path with len <= W", which only depends on counts)
  // and exact bounds; only the intra-cluster LANE ORDER changes class.
  int64_t cluster_hint;
};

inline V3 load(const float* p, int64_t i) { return {p[3 * i], p[3 * i + 1], p[3 * i + 2]}; }

struct Bounds {
  V3 amin, amax, cmin, cmax;
};

Bounds bounds_of(const Ctx& ctx, const int32_t* idx, int64_t len) {
#ifdef BVH_SSE
  // lane 3 of each load is the next field's first float (the rec vector is
  // padded by one element so the last load stays in bounds); it accumulates
  // junk that the .xyz extraction below never reads. min/max on finite
  // floats is bit-identical to the scalar path.
  __m128 amin = _mm_set1_ps(INF), amax = _mm_set1_ps(-INF);
  __m128 cmin = _mm_set1_ps(INF), cmax = _mm_set1_ps(-INF);
  for (int64_t k = 0; k < len; ++k) {
    const Rec& r = ctx.rec[idx[k]];
    __m128 mn4 = _mm_loadu_ps(&r.mn.x);
    __m128 mx4 = _mm_loadu_ps(&r.mx.x);
    __m128 c4 = _mm_loadu_ps(&r.c.x);
    amin = _mm_min_ps(amin, mn4);
    amax = _mm_max_ps(amax, mx4);
    cmin = _mm_min_ps(cmin, c4);
    cmax = _mm_max_ps(cmax, c4);
  }
  alignas(16) float a0[4], a1[4], c0[4], c1[4];
  _mm_store_ps(a0, amin);
  _mm_store_ps(a1, amax);
  _mm_store_ps(c0, cmin);
  _mm_store_ps(c1, cmax);
  return {{a0[0], a0[1], a0[2]}, {a1[0], a1[1], a1[2]},
          {c0[0], c0[1], c0[2]}, {c1[0], c1[1], c1[2]}};
#else
  Bounds b{{INF, INF, INF}, {-INF, -INF, -INF}, {INF, INF, INF}, {-INF, -INF, -INF}};
  for (int64_t k = 0; k < len; ++k) {
    const Rec& r = ctx.rec[idx[k]];
    b.amin = vmin(b.amin, r.mn);
    b.amax = vmax(b.amax, r.mx);
    b.cmin = vmin(b.cmin, r.c);
    b.cmax = vmax(b.cmax, r.c);
  }
  return b;
#endif
}

// Builds the subtree over idx[0..len) into node slot `node`, whose skip
// pointer is `exit_idx`. `other` is the same-offset segment of the second
// index buffer: partitions write into it and the buffers swap for the
// children (double-buffering removes the per-node scratch allocation and
// copy-back of the original formulation — ~30% of build time at 120k).
void build_node(Ctx& ctx, int32_t* idx, int32_t* other, int8_t* bkt_buf,
                int64_t len, int64_t node, int64_t parent, int64_t exit_idx,
                const Bounds& b) {
  ctx.parent[node] = (int32_t)parent;
  ctx.exit_[node] = (int32_t)exit_idx;
  ctx.out_amin[3 * node] = b.amin.x;
  ctx.out_amin[3 * node + 1] = b.amin.y;
  ctx.out_amin[3 * node + 2] = b.amin.z;
  ctx.out_amax[3 * node] = b.amax.x;
  ctx.out_amax[3 * node + 1] = b.amax.y;
  ctx.out_amax[3 * node + 2] = b.amax.z;

  if (len == 1) {
    ctx.entry[node] = -1;
    ctx.shape[node] = (int32_t)idx[0];
    ctx.s2n[idx[0]] = (int32_t)node;
    return;
  }
  ctx.shape[node] = -1;

  // split axis = largest centroid extent
  float ext[3] = {b.cmax.x - b.cmin.x, b.cmax.y - b.cmin.y, b.cmax.z - b.cmin.z};
  int axis = 0;
  if (ext[1] > ext[axis]) axis = 1;
  if (ext[2] > ext[axis]) axis = 2;
  float axis_size = ext[axis];
  float cmin_ax = axis == 0 ? b.cmin.x : (axis == 1 ? b.cmin.y : b.cmin.z);

  int64_t l_count;
  Bounds lb, rb;
  bool partitioned = false;

  if (axis_size < F32_EPS || len <= ctx.cluster_hint) {
    // degenerate extent, or below the cluster cut: median split of the
    // current order (bounds still exact via direct scans)
    l_count = len / 2;
    lb = bounds_of(ctx, idx, l_count);
    rb = bounds_of(ctx, idx + l_count, len - l_count);
  } else {
    // stable 6-bucket binning on the centroid axis (bucket labels go to
    // the shared per-position scratch; one allocation per build, not per
    // node). The bucket-index float math stays scalar in the same
    // operation order as the numpy reference (bit-identity requirement).
    Bounds bb[NB];
    int64_t cnt[NB] = {0};
    int8_t* bucket = bkt_buf;
#ifdef BVH_SSE
    __m128 bamin[NB], bamax[NB], bcmin[NB], bcmax[NB];
    for (int i = 0; i < NB; ++i) {
      bamin[i] = _mm_set1_ps(INF);
      bamax[i] = _mm_set1_ps(-INF);
      bcmin[i] = _mm_set1_ps(INF);
      bcmax[i] = _mm_set1_ps(-INF);
    }
    for (int64_t k = 0; k < len; ++k) {
      const Rec& rc = ctx.rec[idx[k]];
      float ca = axis == 0 ? rc.c.x : (axis == 1 ? rc.c.y : rc.c.z);
      float rel = (ca - cmin_ax) / axis_size;
      int bkt = (int)(rel * BUCKET_SCALE);
      bucket[k] = (int8_t)bkt;
      cnt[bkt]++;
      __m128 mn4 = _mm_loadu_ps(&rc.mn.x);
      __m128 mx4 = _mm_loadu_ps(&rc.mx.x);
      __m128 c4 = _mm_loadu_ps(&rc.c.x);
      bamin[bkt] = _mm_min_ps(bamin[bkt], mn4);
      bamax[bkt] = _mm_max_ps(bamax[bkt], mx4);
      bcmin[bkt] = _mm_min_ps(bcmin[bkt], c4);
      bcmax[bkt] = _mm_max_ps(bcmax[bkt], c4);
    }
    for (int i = 0; i < NB; ++i) {
      alignas(16) float a0[4], a1[4], c0[4], c1[4];
      _mm_store_ps(a0, bamin[i]);
      _mm_store_ps(a1, bamax[i]);
      _mm_store_ps(c0, bcmin[i]);
      _mm_store_ps(c1, bcmax[i]);
      bb[i] = {{a0[0], a0[1], a0[2]}, {a1[0], a1[1], a1[2]},
               {c0[0], c0[1], c0[2]}, {c1[0], c1[1], c1[2]}};
    }
#else
    for (auto& x : bb) x = {{INF, INF, INF}, {-INF, -INF, -INF}, {INF, INF, INF}, {-INF, -INF, -INF}};
    for (int64_t k = 0; k < len; ++k) {
      const Rec& rc = ctx.rec[idx[k]];
      float ca = axis == 0 ? rc.c.x : (axis == 1 ? rc.c.y : rc.c.z);
      float rel = (ca - cmin_ax) / axis_size;
      int bkt = (int)(rel * BUCKET_SCALE);
      bucket[k] = (int8_t)bkt;
      cnt[bkt]++;
      bb[bkt].amin = vmin(bb[bkt].amin, rc.mn);
      bb[bkt].amax = vmax(bb[bkt].amax, rc.mx);
      bb[bkt].cmin = vmin(bb[bkt].cmin, rc.c);
      bb[bkt].cmax = vmax(bb[bkt].cmax, rc.c);
    }
#endif
    // sweep the 5 planes, strict < keeps the first minimum
    float parent_sa = surface_area(b.amin, b.amax);
    float best_cost = INF;
    Bounds best_l, best_r;
    int64_t best_lc = 0;
    for (int plane = 0; plane < NB - 1; ++plane) {
      Bounds l{{INF, INF, INF}, {-INF, -INF, -INF}, {INF, INF, INF}, {-INF, -INF, -INF}};
      Bounds r = l;
      int64_t nl = 0, nr = 0;
      for (int i = 0; i <= plane; ++i) {
        nl += cnt[i];
        l.amin = vmin(l.amin, bb[i].amin);
        l.amax = vmax(l.amax, bb[i].amax);
        l.cmin = vmin(l.cmin, bb[i].cmin);
        l.cmax = vmax(l.cmax, bb[i].cmax);
      }
      for (int i = plane + 1; i < NB; ++i) {
        nr += cnt[i];
        r.amin = vmin(r.amin, bb[i].amin);
        r.amax = vmax(r.amax, bb[i].amax);
        r.cmin = vmin(r.cmin, bb[i].cmin);
        r.cmax = vmax(r.cmax, bb[i].cmax);
      }
      if (nl == 0 || nr == 0) continue;
      float cost = ((float)nl * surface_area(l.amin, l.amax) +
                    (float)nr * surface_area(r.amin, r.amax)) /
                   parent_sa;
      if (cost < best_cost) {
        best_cost = cost;
        best_l = l;
        best_r = r;
        best_lc = nl;
      }
    }
    // stable partition: group by bucket number, preserving in-bucket order
    // (written into the second buffer; children swap buffers)
    int64_t offs[NB + 1] = {0};
    for (int i = 0; i < NB; ++i) offs[i + 1] = offs[i] + cnt[i];
    int64_t pos[NB];
    std::memcpy(pos, offs, sizeof(pos));
    for (int64_t k = 0; k < len; ++k) other[pos[bucket[k]]++] = idx[k];
    partitioned = true;
    l_count = best_lc;
    lb = best_l;
    rb = best_r;
  }
  if (partitioned) std::swap(idx, other);

  int64_t left = node + 1;
  int64_t right = left + 2 * l_count - 1;
  ctx.entry[node] = (int32_t)left;
  // left child's skip pointer is its right sibling; right child inherits ours

  bool parallel = false;
  if (len >= ctx.par_cutoff) {
    if (ctx.threads_left.fetch_sub(1) > 0) {
      parallel = true;
    } else {
      ctx.threads_left.fetch_add(1);  // undo: no budget left
    }
  }
  if (parallel) {
    std::thread tl([&ctx, idx, other, bkt_buf, l_count, left, node, right, lb] {
      build_node(ctx, idx, other, bkt_buf, l_count, left, node, right, lb);
    });
    build_node(ctx, idx + l_count, other + l_count, bkt_buf + l_count,
               len - l_count, right, node, exit_idx, rb);
    tl.join();
    ctx.threads_left.fetch_add(1);
  } else {
    build_node(ctx, idx, other, bkt_buf, l_count, left, node, right, lb);
    build_node(ctx, idx + l_count, other + l_count, bkt_buf + l_count,
               len - l_count, right, node, exit_idx, rb);
  }
}

}  // namespace

// ---------------------------------------------------------------------------
// Cluster-stopping build (the tight-scene fast path).
//
// build_tight_scene only consumes three things from the full lower tree:
// the cluster CUT (maximal subtrees <= leaf_size), each cluster's exact
// bounds, and the DFS triangle order within clusters. The hint build
// constructs all ~2n-1 nodes — ~15/16 of them BELOW the cut, built only to
// be dissolved (below the hint, median splits don't even reorder idx, so
// the DFS leaf order IS the segment order at the stop). This entry runs the
// identical exact-SAH recursion ABOVE the cut and simply stops at <=
// leaf_size, emitting (bounds, triangle segment) per cluster: bit-identical
// cluster sets, bounds (the parent sweep's folded child bounds — the same
// floats the full build stores at the cut roots), and lane order, at a
// fraction of the node-construction work.
//
// SERIAL by design: clusters must be emitted in DFS order, and the target
// host is single-core (the fork-join path in build_node never engages
// there either).
// ---------------------------------------------------------------------------

namespace {

struct CCtx {
  std::vector<Rec> rec;
  std::vector<int8_t> bucket_scratch;
  float* cl_min;
  float* cl_max;
  int32_t* tri_order;
  int64_t* cl_off;
  int64_t n_clusters;
  int64_t emitted;
  int64_t leaf_size;
};

void build_cluster_node(CCtx& ctx, int32_t* idx, int32_t* other,
                        int8_t* bkt_buf, int64_t len, const Bounds& b) {
  if (len <= ctx.leaf_size) {
    int64_t c = ctx.n_clusters++;
    ctx.cl_min[3 * c] = b.amin.x;
    ctx.cl_min[3 * c + 1] = b.amin.y;
    ctx.cl_min[3 * c + 2] = b.amin.z;
    ctx.cl_max[3 * c] = b.amax.x;
    ctx.cl_max[3 * c + 1] = b.amax.y;
    ctx.cl_max[3 * c + 2] = b.amax.z;
    std::memcpy(ctx.tri_order + ctx.emitted, idx, len * sizeof(int32_t));
    ctx.emitted += len;
    ctx.cl_off[ctx.n_clusters] = ctx.emitted;
    return;
  }

  // identical split logic to build_node's exact-SAH branch (above the cut
  // len > leaf_size >= 1, so the len==1 leaf case never arises here)
  float ext[3] = {b.cmax.x - b.cmin.x, b.cmax.y - b.cmin.y,
                  b.cmax.z - b.cmin.z};
  int axis = 0;
  if (ext[1] > ext[axis]) axis = 1;
  if (ext[2] > ext[axis]) axis = 2;
  float axis_size = ext[axis];
  float cmin_ax = axis == 0 ? b.cmin.x : (axis == 1 ? b.cmin.y : b.cmin.z);

  int64_t l_count;
  Bounds lb, rb;
  bool partitioned = false;

  if (axis_size < F32_EPS) {
    l_count = len / 2;
    // bounds_of needs a Ctx-shaped rec accessor; inline the scan here
    auto scan = [&](const int32_t* p, int64_t m) {
      Bounds r{{INF, INF, INF}, {-INF, -INF, -INF},
               {INF, INF, INF}, {-INF, -INF, -INF}};
      for (int64_t k = 0; k < m; ++k) {
        const Rec& rc = ctx.rec[p[k]];
        r.amin = vmin(r.amin, rc.mn);
        r.amax = vmax(r.amax, rc.mx);
        r.cmin = vmin(r.cmin, rc.c);
        r.cmax = vmax(r.cmax, rc.c);
      }
      return r;
    };
    lb = scan(idx, l_count);
    rb = scan(idx + l_count, len - l_count);
  } else {
    Bounds bb[NB];
    int64_t cnt[NB] = {0};
    int8_t* bucket = bkt_buf;
#ifdef BVH_SSE
    __m128 bamin[NB], bamax[NB], bcmin[NB], bcmax[NB];
    for (int i = 0; i < NB; ++i) {
      bamin[i] = _mm_set1_ps(INF);
      bamax[i] = _mm_set1_ps(-INF);
      bcmin[i] = _mm_set1_ps(INF);
      bcmax[i] = _mm_set1_ps(-INF);
    }
    for (int64_t k = 0; k < len; ++k) {
      const Rec& rc = ctx.rec[idx[k]];
      float ca = axis == 0 ? rc.c.x : (axis == 1 ? rc.c.y : rc.c.z);
      float rel = (ca - cmin_ax) / axis_size;
      int bkt = (int)(rel * BUCKET_SCALE);
      bucket[k] = (int8_t)bkt;
      cnt[bkt]++;
      __m128 mn4 = _mm_loadu_ps(&rc.mn.x);
      __m128 mx4 = _mm_loadu_ps(&rc.mx.x);
      __m128 c4 = _mm_loadu_ps(&rc.c.x);
      bamin[bkt] = _mm_min_ps(bamin[bkt], mn4);
      bamax[bkt] = _mm_max_ps(bamax[bkt], mx4);
      bcmin[bkt] = _mm_min_ps(bcmin[bkt], c4);
      bcmax[bkt] = _mm_max_ps(bcmax[bkt], c4);
    }
    for (int i = 0; i < NB; ++i) {
      alignas(16) float a0[4], a1[4], c0[4], c1[4];
      _mm_store_ps(a0, bamin[i]);
      _mm_store_ps(a1, bamax[i]);
      _mm_store_ps(c0, bcmin[i]);
      _mm_store_ps(c1, bcmax[i]);
      bb[i] = {{a0[0], a0[1], a0[2]}, {a1[0], a1[1], a1[2]},
               {c0[0], c0[1], c0[2]}, {c1[0], c1[1], c1[2]}};
    }
#else
    for (auto& x : bb)
      x = {{INF, INF, INF}, {-INF, -INF, -INF},
           {INF, INF, INF}, {-INF, -INF, -INF}};
    for (int64_t k = 0; k < len; ++k) {
      const Rec& rc = ctx.rec[idx[k]];
      float ca = axis == 0 ? rc.c.x : (axis == 1 ? rc.c.y : rc.c.z);
      float rel = (ca - cmin_ax) / axis_size;
      int bkt = (int)(rel * BUCKET_SCALE);
      bucket[k] = (int8_t)bkt;
      cnt[bkt]++;
      bb[bkt].amin = vmin(bb[bkt].amin, rc.mn);
      bb[bkt].amax = vmax(bb[bkt].amax, rc.mx);
      bb[bkt].cmin = vmin(bb[bkt].cmin, rc.c);
      bb[bkt].cmax = vmax(bb[bkt].cmax, rc.c);
    }
#endif
    float parent_sa = surface_area(b.amin, b.amax);
    float best_cost = INF;
    Bounds best_l, best_r;
    int64_t best_lc = 0;
    for (int plane = 0; plane < NB - 1; ++plane) {
      Bounds l{{INF, INF, INF}, {-INF, -INF, -INF},
               {INF, INF, INF}, {-INF, -INF, -INF}};
      Bounds r = l;
      int64_t nl = 0, nr = 0;
      for (int i = 0; i <= plane; ++i) {
        nl += cnt[i];
        l.amin = vmin(l.amin, bb[i].amin);
        l.amax = vmax(l.amax, bb[i].amax);
        l.cmin = vmin(l.cmin, bb[i].cmin);
        l.cmax = vmax(l.cmax, bb[i].cmax);
      }
      for (int i = plane + 1; i < NB; ++i) {
        nr += cnt[i];
        r.amin = vmin(r.amin, bb[i].amin);
        r.amax = vmax(r.amax, bb[i].amax);
        r.cmin = vmin(r.cmin, bb[i].cmin);
        r.cmax = vmax(r.cmax, bb[i].cmax);
      }
      if (nl == 0 || nr == 0) continue;
      float cost = ((float)nl * surface_area(l.amin, l.amax) +
                    (float)nr * surface_area(r.amin, r.amax)) /
                   parent_sa;
      if (cost < best_cost) {
        best_cost = cost;
        best_l = l;
        best_r = r;
        best_lc = nl;
      }
    }
    int64_t offs[NB + 1] = {0};
    for (int i = 0; i < NB; ++i) offs[i + 1] = offs[i] + cnt[i];
    int64_t pos[NB];
    std::memcpy(pos, offs, sizeof(pos));
    for (int64_t k = 0; k < len; ++k) other[pos[bucket[k]]++] = idx[k];
    partitioned = true;
    l_count = best_lc;
    lb = best_l;
    rb = best_r;
  }
  if (partitioned) std::swap(idx, other);
  build_cluster_node(ctx, idx, other, bkt_buf, l_count, lb);
  build_cluster_node(ctx, idx + l_count, other + l_count, bkt_buf + l_count,
                     len - l_count, rb);
}

}  // namespace

// Returns the cluster count C (>0), with cl_min/cl_max [C, 3] bounds,
// tri_order [n] the packed triangle ids, cl_off [C+1] segment offsets.
// Buffers must be sized for the worst case: n clusters, n+1 offsets.
extern "C" int64_t bvh_build_sah_clusters(
    const float* shape_min, const float* shape_max, int64_t n,
    int32_t leaf_size, float* cl_min, float* cl_max, int32_t* tri_order,
    int64_t* cl_off) {
  if (n <= 0 || leaf_size < 1) return -1;
  CCtx ctx;
  ctx.cl_min = cl_min;
  ctx.cl_max = cl_max;
  ctx.tri_order = tri_order;
  ctx.cl_off = cl_off;
  ctx.n_clusters = 0;
  ctx.emitted = 0;
  ctx.leaf_size = leaf_size;
  ctx.rec.resize(n + 1);
  ctx.bucket_scratch.resize(n);
  for (int64_t i = 0; i < n; ++i) {
    V3 mn = load(shape_min, i), mx = load(shape_max, i);
    ctx.rec[i] = {mn, mx,
                  {mn.x * 0.5f + mx.x * 0.5f, mn.y * 0.5f + mx.y * 0.5f,
                   mn.z * 0.5f + mx.z * 0.5f}};
  }
  std::vector<int32_t> idx(n), other(n);
  for (int64_t i = 0; i < n; ++i) idx[i] = (int32_t)i;
  cl_off[0] = 0;

  // root bounds: direct scan (bit-identical to bounds_of's scalar fold)
  Bounds root{{INF, INF, INF}, {-INF, -INF, -INF},
              {INF, INF, INF}, {-INF, -INF, -INF}};
  for (int64_t i = 0; i < n; ++i) {
    const Rec& rc = ctx.rec[i];
    root.amin = vmin(root.amin, rc.mn);
    root.amax = vmax(root.amax, rc.mx);
    root.cmin = vmin(root.cmin, rc.c);
    root.cmax = vmax(root.cmax, rc.c);
  }
  build_cluster_node(ctx, idx.data(), other.data(),
                     ctx.bucket_scratch.data(), n, root);
  return ctx.n_clusters;
}

// Pack group rows straight from the cluster segments (no flat-tree walk):
// lane = cluster * W + j, rows a' (cluster-frame) | e1 | e2 in the kernel's
// [G, 16, 128] transposed layout. Mirrors bvh_pack_tight's row math.
extern "C" int bvh_pack_clusters(const float* a, const float* b,
                                 const float* c, const int32_t* tri_order,
                                 const int64_t* cl_off, int64_t C, int32_t W,
                                 const float* cc, float* groups,
                                 int32_t* tri_map) {
  if (C <= 0 || W < 1 || 128 % W) return -1;
  for (int64_t ci = 0; ci < C; ++ci) {
    int64_t lo = cl_off[ci], hi = cl_off[ci + 1];
    if (hi - lo > W) return -2;
    float ccx = cc[3 * ci], ccy = cc[3 * ci + 1], ccz = cc[3 * ci + 2];
    int64_t g = ci / (128 / W);
    int64_t lane0 = (ci % (128 / W)) * W;
    float* grow = groups + g * 16 * 128;
    for (int64_t k = lo; k < hi; ++k) {
      int32_t t = tri_order[k];
      int64_t lane = lane0 + (k - lo);
      tri_map[ci * W + (k - lo)] = t;
      float ax = a[3 * t], ay = a[3 * t + 1], az = a[3 * t + 2];
      grow[0 * 128 + lane] = ax - ccx;
      grow[1 * 128 + lane] = ay - ccy;
      grow[2 * 128 + lane] = az - ccz;
      grow[3 * 128 + lane] = b[3 * t] - ax;
      grow[4 * 128 + lane] = b[3 * t + 1] - ay;
      grow[5 * 128 + lane] = b[3 * t + 2] - az;
      grow[6 * 128 + lane] = c[3 * t] - ax;
      grow[7 * 128 + lane] = c[3 * t + 1] - ay;
      grow[8 * 128 + lane] = c[3 * t + 2] - az;
    }
  }
  return 0;
}

extern "C" int bvh_build_sah_hint(const float* shape_min, const float* shape_max,
                                  int64_t n, float* out_amin, float* out_amax,
                                  int32_t* entry, int32_t* exit_, int32_t* shape,
                                  int32_t* parent, int32_t* s2n, int32_t nthreads,
                                  int32_t cluster_hint) {
  if (n <= 0) return -1;
  Ctx ctx;
  ctx.smin = shape_min;
  ctx.smax = shape_max;
  ctx.out_amin = out_amin;
  ctx.out_amax = out_amax;
  ctx.entry = entry;
  ctx.exit_ = exit_;
  ctx.shape = shape;
  ctx.parent = parent;
  ctx.s2n = s2n;
  ctx.total = 2 * n - 1;
  int hw = nthreads > 0 ? nthreads : (int)std::thread::hardware_concurrency();
  ctx.threads_left.store(std::max(hw - 1, 0));
  ctx.par_cutoff = 4096;
  ctx.cluster_hint = cluster_hint;

  ctx.rec.resize(n + 1);  // +1: SSE loads read one float past the record
  ctx.bucket_scratch.resize(n);
  for (int64_t i = 0; i < n; ++i) {
    V3 mn = load(shape_min, i), mx = load(shape_max, i);
    ctx.rec[i] = {mn, mx,
                  {mn.x * 0.5f + mx.x * 0.5f, mn.y * 0.5f + mx.y * 0.5f,
                   mn.z * 0.5f + mx.z * 0.5f}};
  }
  std::vector<int32_t> idx(n), other(n);
  for (int64_t i = 0; i < n; ++i) idx[i] = (int32_t)i;

  Bounds root = bounds_of(ctx, idx.data(), n);
  build_node(ctx, idx.data(), other.data(), ctx.bucket_scratch.data(), n, 0,
             -1, ctx.total, root);
  return 0;
}

// Bit-identical-to-numpy mode (the differentially-tested contract).
extern "C" int bvh_build_sah(const float* shape_min, const float* shape_max, int64_t n,
                             float* out_amin, float* out_amax, int32_t* entry,
                             int32_t* exit_, int32_t* shape, int32_t* parent, int32_t* s2n,
                             int32_t nthreads) {
  return bvh_build_sah_hint(shape_min, shape_max, n, out_amin, out_amax, entry,
                            exit_, shape, parent, s2n, nthreads, 0);
}

extern "C" int bvh_native_version() { return 3; }
