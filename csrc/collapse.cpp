// Native K-ary collapse of a binary DFS entry/exit node table.
//
// Semantics are required to be identical to the Python reference
// (bvh_tpu/ops/cluster.py::collapse_upper, differentially tested): each kept
// internal absorbs up to K children by greedily expanding the
// largest-surface-area binary internal first (FIFO tie-break on equal area),
// children keep DFS (SAH) order, leaf payloads pass through.
//
// Table format: [8, nn] float32, rows amin(3) amax(3) entry exit; leaves
// encode payloads as entry < 0. The output is written into a caller buffer
// with the SAME row stride nn (collapse never grows); *out_nn returns the
// collapsed column count, callers slice [:, :out_nn].

#include <algorithm>
#include <cstdint>
#include <queue>
#include <vector>

namespace {

struct HeapItem {
  float neg_area;
  int64_t order;
  int64_t node;
};

struct HeapCmp {
  // min-heap on (neg_area, order): pops the largest area first, FIFO on ties
  bool operator()(const HeapItem& a, const HeapItem& b) const {
    if (a.neg_area != b.neg_area) return a.neg_area > b.neg_area;
    return a.order > b.order;
  }
};

}  // namespace

extern "C" int bvh_collapse(const float* nodes, int64_t nn, int32_t K,
                            float* out, int64_t* out_nn) {
  if (nn <= 3 || K <= 2) {
    for (int r = 0; r < 8; ++r)
      for (int64_t i = 0; i < nn; ++i) out[r * nn + i] = nodes[r * nn + i];
    *out_nn = nn;
    return 0;
  }
  const float* entry = nodes + 6 * nn;
  const float* exit_ = nodes + 7 * nn;
  std::vector<float> area(nn);
  for (int64_t i = 0; i < nn; ++i) {
    float sx = nodes[3 * nn + i] - nodes[0 * nn + i];
    float sy = nodes[4 * nn + i] - nodes[1 * nn + i];
    float sz = nodes[5 * nn + i] - nodes[2 * nn + i];
    area[i] = sx * sy + sy * sz + sz * sx;
  }
  auto left_of = [&](int64_t i) { return (int64_t)entry[i]; };
  auto right_of = [&](int64_t l) { return (int64_t)exit_[l]; };

  std::vector<int64_t> out_bin;      // binary id per output node
  std::vector<int64_t> first_child;  // output idx of first child (-1 leaf)
  std::vector<int64_t> last_child;   // output idx of last child
  out_bin.reserve(nn);
  first_child.reserve(nn);
  last_child.reserve(nn);

  std::vector<std::pair<int64_t, int64_t>> stack;  // (binary idx, parent out)
  stack.push_back({0, -1});
  std::priority_queue<HeapItem, std::vector<HeapItem>, HeapCmp> heap;
  std::vector<int64_t> leaves_acc, frontier;
  while (!stack.empty()) {
    auto [i, parent] = stack.back();
    stack.pop_back();
    int64_t oi = (int64_t)out_bin.size();
    out_bin.push_back(i);
    first_child.push_back(-1);
    last_child.push_back(-1);
    if (parent >= 0) {
      if (first_child[parent] < 0) first_child[parent] = oi;
      last_child[parent] = oi;
    }
    if (entry[i] >= 0.0f) {
      while (!heap.empty()) heap.pop();
      leaves_acc.clear();
      int64_t cnt = 0;
      auto push = [&](int64_t j) {
        if (entry[j] < 0.0f)
          leaves_acc.push_back(j);
        else
          heap.push({-area[j], cnt++, j});
      };
      int64_t l = left_of(i);
      push(l);
      push(right_of(l));
      while (!heap.empty() &&
             (int64_t)(leaves_acc.size() + heap.size()) < (int64_t)K) {
        int64_t j = heap.top().node;
        heap.pop();
        int64_t jl = left_of(j);
        push(jl);
        push(right_of(jl));
      }
      frontier = leaves_acc;
      while (!heap.empty()) {
        frontier.push_back(heap.top().node);
        heap.pop();
      }
      std::sort(frontier.begin(), frontier.end());  // DFS (SAH) child order
      for (auto it = frontier.rbegin(); it != frontier.rend(); ++it)
        stack.push_back({*it, oi});
    }
  }

  int64_t nn2 = (int64_t)out_bin.size();
  std::vector<int64_t> end(nn2);
  for (int64_t oi = nn2 - 1; oi >= 0; --oi)
    end[oi] = first_child[oi] < 0 ? oi + 1 : end[last_child[oi]];
  for (int64_t oi = 0; oi < nn2; ++oi) {
    int64_t i = out_bin[oi];
    for (int r = 0; r < 6; ++r) out[r * nn + oi] = nodes[r * nn + i];
    out[6 * nn + oi] =
        first_child[oi] < 0 ? entry[i] : (float)first_child[oi];
    out[7 * nn + oi] = (float)end[oi];
  }
  *out_nn = nn2;
  return 0;
}
