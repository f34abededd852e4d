// Host-side sum/min segment trees for prioritized replay over host-RAM
// storage.  Native counterpart of the reference C++ implementation
// (/root/reference/torchrl/csrc/segment_tree.h:41-458): fixed-capacity
// binary-indexed tree with batched Update, range Query, and ScanLowerBound
// (inverse-CDF sampling).  The device path uses the XLA cumsum+searchsorted
// sampler (rl_tpu/data/replay/samplers.py); this covers LazyMemmapStorage /
// host buffers where the data never touches HBM.
//
// Exposed via a C ABI for ctypes (no pybind dependency in the image).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

template <typename T, typename Op>
class SegmentTree {
 public:
  explicit SegmentTree(int64_t size, T identity)
      : size_(size), identity_(identity) {
    cap_ = 1;
    while (cap_ < size_) cap_ <<= 1;
    tree_.assign(2 * cap_, identity_);
  }

  void Update(int64_t index, T value) {
    int64_t i = index + cap_;
    tree_[i] = value;
    for (i >>= 1; i >= 1; i >>= 1) {
      tree_[i] = Op()(tree_[2 * i], tree_[2 * i + 1]);
    }
  }

  void BatchUpdate(const int64_t* indices, const T* values, int64_t n) {
    for (int64_t k = 0; k < n; ++k) {
      tree_[indices[k] + cap_] = values[k];
    }
    // recompute touched ancestors level by level (cheaper than per-leaf
    // upward walks when n is large; mirrors the reference's level kernels)
    std::vector<int64_t> level;
    level.reserve(n);
    for (int64_t k = 0; k < n; ++k) level.push_back((indices[k] + cap_) >> 1);
    while (!level.empty() && level[0] >= 1) {
      std::sort(level.begin(), level.end());
      level.erase(std::unique(level.begin(), level.end()), level.end());
      for (int64_t node : level) {
        tree_[node] = Op()(tree_[2 * node], tree_[2 * node + 1]);
      }
      if (level[0] == 1) break;
      for (auto& node : level) node >>= 1;
    }
  }

  T Get(int64_t index) const { return tree_[index + cap_]; }

  // reduce over [l, r)
  T Query(int64_t l, int64_t r) const {
    T res_l = identity_, res_r = identity_;
    for (l += cap_, r += cap_; l < r; l >>= 1, r >>= 1) {
      if (l & 1) res_l = Op()(res_l, tree_[l++]);
      if (r & 1) res_r = Op()(tree_[--r], res_r);
    }
    return Op()(res_l, res_r);
  }

  T Total() const { return tree_[1]; }

  // smallest index i such that prefix_sum(0..i] > value  (sum trees only)
  int64_t ScanLowerBound(T value) const {
    int64_t node = 1;
    T v = value;
    while (node < cap_) {
      node <<= 1;
      if (tree_[node] <= v) {
        v -= tree_[node];
        node |= 1;
      }
    }
    int64_t idx = node - cap_;
    return idx < size_ ? idx : size_ - 1;
  }

  int64_t size() const { return size_; }

 private:
  int64_t size_;
  int64_t cap_;
  T identity_;
  std::vector<T> tree_;
};

struct SumOp {
  template <typename T>
  T operator()(T a, T b) const { return a + b; }
};
struct MinOp {
  template <typename T>
  T operator()(T a, T b) const { return a < b ? a : b; }
};

using SumTreeF32 = SegmentTree<float, SumOp>;
using MinTreeF32 = SegmentTree<float, MinOp>;
using SumTreeF64 = SegmentTree<double, SumOp>;
using MinTreeF64 = SegmentTree<double, MinOp>;

}  // namespace

extern "C" {

#define DEFINE_TREE_API(NAME, TYPE, SCALAR, IDENTITY)                        \
  void* NAME##_create(int64_t size) { return new TYPE(size, IDENTITY); }     \
  void NAME##_destroy(void* t) { delete static_cast<TYPE*>(t); }             \
  void NAME##_update(void* t, int64_t i, SCALAR v) {                         \
    static_cast<TYPE*>(t)->Update(i, v);                                     \
  }                                                                          \
  void NAME##_batch_update(void* t, const int64_t* idx, const SCALAR* v,     \
                           int64_t n) {                                      \
    static_cast<TYPE*>(t)->BatchUpdate(idx, v, n);                           \
  }                                                                          \
  SCALAR NAME##_get(void* t, int64_t i) {                                    \
    return static_cast<TYPE*>(t)->Get(i);                                    \
  }                                                                          \
  SCALAR NAME##_query(void* t, int64_t l, int64_t r) {                       \
    return static_cast<TYPE*>(t)->Query(l, r);                               \
  }                                                                          \
  SCALAR NAME##_total(void* t) { return static_cast<TYPE*>(t)->Total(); }

DEFINE_TREE_API(sum_f32, SumTreeF32, float, 0.0f)
DEFINE_TREE_API(min_f32, MinTreeF32, float,
                std::numeric_limits<float>::infinity())
DEFINE_TREE_API(sum_f64, SumTreeF64, double, 0.0)
DEFINE_TREE_API(min_f64, MinTreeF64, double,
                std::numeric_limits<double>::infinity())

int64_t sum_f32_scan_lower_bound(void* t, float v) {
  return static_cast<SumTreeF32*>(t)->ScanLowerBound(v);
}
int64_t sum_f64_scan_lower_bound(void* t, double v) {
  return static_cast<SumTreeF64*>(t)->ScanLowerBound(v);
}
void sum_f32_batch_scan_lower_bound(void* t, const float* vs, int64_t n,
                                    int64_t* out) {
  auto* tree = static_cast<SumTreeF32*>(t);
  for (int64_t k = 0; k < n; ++k) out[k] = tree->ScanLowerBound(vs[k]);
}
void sum_f64_batch_scan_lower_bound(void* t, const double* vs, int64_t n,
                                    int64_t* out) {
  auto* tree = static_cast<SumTreeF64*>(t);
  for (int64_t k = 0; k < n; ++k) out[k] = tree->ScanLowerBound(vs[k]);
}

}  // extern "C"
