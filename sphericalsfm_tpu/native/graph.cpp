// Native host-side graph kernels for sphericalsfm_tpu.
//
// The TPU-native framework keeps its compute path in XLA; the runtime
// bookkeeping around it (track building, view-graph components) is
// pointer-chasing work the reference does with std::map/Boost.Graph
// (examples/spherical_sfm_tools.cpp:736-792, 886-950). Here it is a small
// C++ kernel exposed over a C ABI and loaded via ctypes — no Python-object
// overhead on multi-million-edge match graphs.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC graph.cpp -o libsfmgraph.so

#include <cstdint>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int64_t> parent;
  std::vector<int32_t> rank_;

  explicit UnionFind(int64_t n) : parent(n), rank_(n, 0) {
    for (int64_t i = 0; i < n; ++i) parent[i] = i;
  }

  int64_t find(int64_t x) {
    int64_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {
      int64_t next = parent[x];
      parent[x] = root;
      x = next;
    }
    return root;
  }

  void unite(int64_t a, int64_t b) {
    int64_t ra = find(a), rb = find(b);
    if (ra == rb) return;
    if (rank_[ra] < rank_[rb]) std::swap(ra, rb);
    parent[rb] = ra;
    if (rank_[ra] == rank_[rb]) ++rank_[ra];
  }
};

}  // namespace

extern "C" {

// Union the given edges over universe [0, n); write the root of every node.
void sfm_union_find(int64_t n, int64_t num_edges, const int64_t* a,
                    const int64_t* b, int64_t* roots_out) {
  UnionFind uf(n);
  for (int64_t e = 0; e < num_edges; ++e) uf.unite(a[e], b[e]);
  for (int64_t i = 0; i < n; ++i) roots_out[i] = uf.find(i);
}

// Connected components: label nodes by component id (0..k-1, by first
// appearance); returns the number of components.
int64_t sfm_connected_components(int64_t n, int64_t num_edges,
                                 const int64_t* a, const int64_t* b,
                                 int64_t* labels_out) {
  UnionFind uf(n);
  for (int64_t e = 0; e < num_edges; ++e) uf.unite(a[e], b[e]);
  std::vector<int64_t> label(n, -1);
  int64_t next = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t r = uf.find(i);
    if (label[r] < 0) label[r] = next++;
    labels_out[i] = label[r];
  }
  return next;
}

}  // extern "C"
