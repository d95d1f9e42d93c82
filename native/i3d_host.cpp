// i3d_host — native host-side runtime for intrinsic3d-tpu.
//
// The TPU owns the numerical pipeline (JAX/XLA); this library owns the
// host-side hot paths that sit between solver phases, where the reference
// used its C++ voxel hash map (libintrinsic3d/src/sparse_voxel_grid.cpp):
// packed-key construction, open-addressing hash lookup, and neighbor-table
// (gather-index) construction for stencil topologies. The Python layer binds
// via ctypes and falls back to vectorized numpy when the library is absent.
//
// Layout contract (matches intrinsic3d_tpu/grid/voxel_grid.py):
//   key = ((x + 2^20) << 42) | ((y + 2^20) << 21) | (z + 2^20)
//
// Build: see native/build.py (g++ -O3 -fopenmp -shared).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int64_t kBias = 1 << 20;
constexpr int kShift = 21;
constexpr uint64_t kEmpty = ~0ull;

inline int64_t pack(int64_t x, int64_t y, int64_t z) {
  return ((x + kBias) << (2 * kShift)) | ((y + kBias) << kShift) | (z + kBias);
}

// open-addressing hash table: key -> index; power-of-two capacity
struct HashTable {
  std::vector<uint64_t> keys;
  std::vector<int32_t> vals;
  uint64_t mask;

  explicit HashTable(int64_t n) {
    uint64_t cap = 64;
    while (cap < static_cast<uint64_t>(n) * 2) cap <<= 1;
    keys.assign(cap, kEmpty);
    vals.assign(cap, -1);
    mask = cap - 1;
  }

  static inline uint64_t hash(uint64_t k) {
    // splitmix64 finalizer
    k += 0x9e3779b97f4a7c15ull;
    k = (k ^ (k >> 30)) * 0xbf58476d1ce4e5b9ull;
    k = (k ^ (k >> 27)) * 0x94d049bb133111ebull;
    return k ^ (k >> 31);
  }

  inline void insert(uint64_t key, int32_t val) {
    uint64_t i = hash(key) & mask;
    while (keys[i] != kEmpty) i = (i + 1) & mask;
    keys[i] = key;
    vals[i] = val;
  }

  inline int32_t find(uint64_t key) const {
    uint64_t i = hash(key) & mask;
    while (true) {
      if (keys[i] == key) return vals[i];
      if (keys[i] == kEmpty) return -1;
      i = (i + 1) & mask;
    }
  }
};

}  // namespace

extern "C" {

// Pack int32 voxel coords [n,3] into int64 keys [n].
void i3d_pack_coords(const int32_t* coords, int64_t n, int64_t* keys_out) {
#pragma omp parallel for
  for (int64_t i = 0; i < n; ++i) {
    keys_out[i] =
        pack(coords[3 * i], coords[3 * i + 1], coords[3 * i + 2]);
  }
}

// Neighbor/gather table: for n voxels and s stencil offsets, write idx[n*s]
// with the table index of coord+offset, or -1. Table order = input order.
void i3d_neighbor_table(const int32_t* coords, int64_t n,
                        const int32_t* offsets, int64_t s,
                        int32_t* idx_out) {
  HashTable ht(n);
  for (int64_t i = 0; i < n; ++i) {
    ht.insert(static_cast<uint64_t>(
                  pack(coords[3 * i], coords[3 * i + 1], coords[3 * i + 2])),
              static_cast<int32_t>(i));
  }
#pragma omp parallel for
  for (int64_t i = 0; i < n; ++i) {
    const int32_t x = coords[3 * i], y = coords[3 * i + 1], z = coords[3 * i + 2];
    for (int64_t k = 0; k < s; ++k) {
      const uint64_t key = static_cast<uint64_t>(
          pack(x + offsets[3 * k], y + offsets[3 * k + 1], z + offsets[3 * k + 2]));
      idx_out[i * s + k] = ht.find(key);
    }
  }
}

// General lookup: indices of m query coords in the n-entry table (input order).
void i3d_find_indices(const int32_t* coords, int64_t n,
                      const int32_t* queries, int64_t m, int32_t* idx_out) {
  HashTable ht(n);
  for (int64_t i = 0; i < n; ++i) {
    ht.insert(static_cast<uint64_t>(
                  pack(coords[3 * i], coords[3 * i + 1], coords[3 * i + 2])),
              static_cast<int32_t>(i));
  }
#pragma omp parallel for
  for (int64_t j = 0; j < m; ++j) {
    const uint64_t key = static_cast<uint64_t>(pack(
        queries[3 * j], queries[3 * j + 1], queries[3 * j + 2]));
    idx_out[j] = ht.find(key);
  }
}

}  // extern "C"
