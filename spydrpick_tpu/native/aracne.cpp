// ARACNE DPI kernel — native implementation of the closed-form rule
// derived from reference include/ARACNE.hpp (see engine/aracne.py for
// the derivation): edge e=(a,b,w) is indirect iff
//     max over common neighbours c of min(w_ac, w_bc) >= w + max(thr, 0)
//
// Replaces the reference's TBB block-streamed, mutex-striped pipeline
// (ARACNE.hpp:90-368) with a two-pass CSR build + an embarrassingly
// parallel per-edge sorted-intersection scan (OpenMP).
//
// Build: g++ -O3 -std=c++17 -fopenmp -shared -fPIC aracne.cpp -o libaracne.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <utility>
#include <vector>

extern "C" {

// a, b: dense node ids in [0, n_nodes); w: edge weights; E edges.
// out_indirect[k] = 1 if edge k is indirect.
int spydrpick_aracne_mark(const int64_t* a, const int64_t* b, const double* w,
                          int64_t E, int64_t n_nodes, double threshold,
                          uint8_t* out_indirect) {
  if (E <= 0) return 0;
  // ---- CSR adjacency (neighbour, edge_id), sorted by neighbour ----
  std::vector<int64_t> deg(n_nodes + 1, 0);
  for (int64_t k = 0; k < E; ++k) {
    ++deg[a[k] + 1];
    ++deg[b[k] + 1];
  }
  for (int64_t v = 0; v < n_nodes; ++v) deg[v + 1] += deg[v];
  std::vector<int64_t> offs(deg);  // running fill cursor
  std::vector<std::pair<int64_t, int64_t>> adj(2 * (size_t)E);
  for (int64_t k = 0; k < E; ++k) {
    adj[offs[a[k]]++] = {b[k], k};
    adj[offs[b[k]]++] = {a[k], k};
  }
#pragma omp parallel for schedule(dynamic, 64)
  for (int64_t v = 0; v < n_nodes; ++v) {
    std::sort(adj.begin() + deg[v], adj.begin() + deg[v + 1]);
  }

  const double margin_add = threshold > 0 ? threshold : 0.0;

  // ---- per-edge intersection scan ----
#pragma omp parallel for schedule(dynamic, 256)
  for (int64_t k = 0; k < E; ++k) {
    int64_t na = a[k], nb = b[k];
    int64_t a0 = deg[na], a1 = deg[na + 1];
    int64_t b0 = deg[nb], b1 = deg[nb + 1];
    if (a1 - a0 > b1 - b0) {
      std::swap(a0, b0);
      std::swap(a1, b1);
      std::swap(na, nb);
    }
    const double need = w[k] + margin_add;
    uint8_t hit = 0;
    // merge-style scan: iterate smaller adjacency, binary-search larger
    int64_t lo = b0;
    for (int64_t p = a0; p < a1 && !hit; ++p) {
      const int64_t c = adj[p].first;
      if (c == nb) continue;  // the edge itself
      // galloping lower_bound within [lo, b1)
      auto it = std::lower_bound(adj.begin() + lo, adj.begin() + b1,
                                 std::make_pair(c, (int64_t)-1));
      lo = it - adj.begin();
      if (lo < b1 && adj[lo].first == c) {
        const double m = std::min(w[adj[p].second], w[adj[lo].second]);
        if (m >= need) hit = 1;
      }
    }
    out_indirect[k] = hit;
  }
  return 0;
}

}  // extern "C"
