// meshkit: native mesh-topology runtime for admm_optim_tpu.
//
// The TPU-native equivalent of the grid-management layer the reference gets
// from UG4 core (C++): edge-table construction for refinement hierarchies /
// P2 spaces, and block-ELL sparsity-pattern + assembly-scatter-map building
// (reference parity: the setup work behind ApproximationSpace +
// AssembledLinearOperator, 2d_admm.lua:223-331).  These are the only
// host-side steps whose cost grows superlinearly with mesh size (sort/unique
// over E*nl^2 entries); the Python/numpy fallback implements the identical
// contract (admm_optim_tpu/core/mesh.py, ops/sparsity.py).
//
// C ABI (ctypes): two-phase handle API - build, query sizes, copy out, free.
//
// Build: make -C native   (produces libmeshkit.so)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct EdgeTable {
  std::vector<int32_t> edges;       // (Ne, 2) sorted pairs, lexicographic
  std::vector<int32_t> elem_edges;  // (E, n_loc_edges)
};

struct Pattern {
  int64_t n_rows = 0;
  int64_t K = 0;
  std::vector<int32_t> cols;    // (K, N)
  std::vector<int32_t> slots;   // (nl*nl*E,) k-major flat index k*N + n
  std::vector<int32_t> diag_k;  // (N,)
};

inline uint64_t pack_pair(uint32_t a, uint32_t b) {
  if (a > b) std::swap(a, b);
  return (static_cast<uint64_t>(a) << 32) | b;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// edge tables
// ---------------------------------------------------------------------------
void* mk_edge_table(const int32_t* elems, int64_t E, int32_t nl,
                    const int32_t* loc_pairs, int32_t n_loc) {
  auto* t = new EdgeTable();
  std::vector<uint64_t> keys;
  keys.reserve(static_cast<size_t>(E) * n_loc);
  for (int64_t e = 0; e < E; ++e) {
    const int32_t* el = elems + e * nl;
    for (int32_t k = 0; k < n_loc; ++k) {
      keys.push_back(pack_pair(el[loc_pairs[2 * k]], el[loc_pairs[2 * k + 1]]));
    }
  }
  std::vector<uint64_t> uniq(keys);
  std::sort(uniq.begin(), uniq.end());
  uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());

  t->edges.resize(uniq.size() * 2);
  for (size_t i = 0; i < uniq.size(); ++i) {
    t->edges[2 * i] = static_cast<int32_t>(uniq[i] >> 32);
    t->edges[2 * i + 1] = static_cast<int32_t>(uniq[i] & 0xffffffffu);
  }
  t->elem_edges.resize(keys.size());
  for (size_t i = 0; i < keys.size(); ++i) {
    auto it = std::lower_bound(uniq.begin(), uniq.end(), keys[i]);
    t->elem_edges[i] = static_cast<int32_t>(it - uniq.begin());
  }
  return t;
}

int64_t mk_edge_count(void* handle) {
  return static_cast<int64_t>(static_cast<EdgeTable*>(handle)->edges.size() / 2);
}

void mk_edge_get(void* handle, int32_t* edges_out, int32_t* elem_edges_out) {
  auto* t = static_cast<EdgeTable*>(handle);
  std::memcpy(edges_out, t->edges.data(), t->edges.size() * sizeof(int32_t));
  std::memcpy(elem_edges_out, t->elem_edges.data(),
              t->elem_edges.size() * sizeof(int32_t));
}

void mk_edge_free(void* handle) { delete static_cast<EdgeTable*>(handle); }

// ---------------------------------------------------------------------------
// block-ELL pattern + assembly scatter map (contract: ops/sparsity.py)
// entries ordered (i, j, e) with e minor; slots are k-major (k*N + n)
// ---------------------------------------------------------------------------
void* mk_pattern(const int32_t* elem_dofs, int64_t E, int32_t nl,
                 int64_t n_rows) {
  auto* p = new Pattern();
  p->n_rows = n_rows;
  const int64_t n_entries = E * nl * nl;
  std::vector<uint64_t> keys(static_cast<size_t>(n_entries));
  // order (i, j, e): index = (i*nl + j)*E + e
  for (int32_t i = 0; i < nl; ++i)
    for (int32_t j = 0; j < nl; ++j)
      for (int64_t e = 0; e < E; ++e) {
        const int32_t* dofs = elem_dofs + e * nl;
        keys[(static_cast<int64_t>(i) * nl + j) * E + e] =
            static_cast<uint64_t>(dofs[i]) * n_rows + dofs[j];
      }
  std::vector<uint64_t> uniq(keys);
  // ensure the diagonal exists in every row
  uniq.reserve(uniq.size() + n_rows);
  for (int64_t r = 0; r < n_rows; ++r)
    uniq.push_back(static_cast<uint64_t>(r) * n_rows + r);
  std::sort(uniq.begin(), uniq.end());
  uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());

  // per-row position
  std::vector<int32_t> pos(uniq.size());
  std::vector<int64_t> row_count(n_rows, 0);
  for (size_t i = 0; i < uniq.size(); ++i) {
    int64_t r = static_cast<int64_t>(uniq[i] / n_rows);
    pos[i] = static_cast<int32_t>(row_count[r]++);
  }
  int64_t K = 0;
  for (int64_t r = 0; r < n_rows; ++r) K = std::max(K, row_count[r]);
  p->K = K;

  p->cols.assign(static_cast<size_t>(K) * n_rows, 0);
  for (int64_t k = 0; k < K; ++k)
    for (int64_t r = 0; r < n_rows; ++r)
      p->cols[k * n_rows + r] = static_cast<int32_t>(r);  // self-padding
  for (size_t i = 0; i < uniq.size(); ++i) {
    int64_t r = static_cast<int64_t>(uniq[i] / n_rows);
    int64_t c = static_cast<int64_t>(uniq[i] % n_rows);
    p->cols[static_cast<int64_t>(pos[i]) * n_rows + r] = static_cast<int32_t>(c);
  }

  p->slots.resize(keys.size());
  for (size_t i = 0; i < keys.size(); ++i) {
    auto it = std::lower_bound(uniq.begin(), uniq.end(), keys[i]);
    size_t u = static_cast<size_t>(it - uniq.begin());
    int64_t r = static_cast<int64_t>(uniq[u] / n_rows);
    p->slots[i] = static_cast<int32_t>(static_cast<int64_t>(pos[u]) * n_rows + r);
  }

  p->diag_k.resize(n_rows);
  for (int64_t r = 0; r < n_rows; ++r) {
    uint64_t key = static_cast<uint64_t>(r) * n_rows + r;
    auto it = std::lower_bound(uniq.begin(), uniq.end(), key);
    p->diag_k[r] = pos[static_cast<size_t>(it - uniq.begin())];
  }
  return p;
}

int64_t mk_pattern_K(void* handle) { return static_cast<Pattern*>(handle)->K; }

void mk_pattern_get(void* handle, int32_t* cols_out, int32_t* slots_out,
                    int32_t* diag_out) {
  auto* p = static_cast<Pattern*>(handle);
  std::memcpy(cols_out, p->cols.data(), p->cols.size() * sizeof(int32_t));
  std::memcpy(slots_out, p->slots.data(), p->slots.size() * sizeof(int32_t));
  std::memcpy(diag_out, p->diag_k.data(), p->diag_k.size() * sizeof(int32_t));
}

void mk_pattern_free(void* handle) { delete static_cast<Pattern*>(handle); }

}  // extern "C"
