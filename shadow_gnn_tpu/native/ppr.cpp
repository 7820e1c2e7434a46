// Native host engine: multi-threaded approximate-PPR precompute.
//
// The TPU framework runs sampling/induction on device; the one genuinely
// host-bound job left is the one-time per-target forward-push PPR
// precompute (reference: ParallelSampler.cpp:237-344, OpenMP `parallel
// for` over targets).  This library provides that with std::thread
// work-stealing, identical numerics:
//   * lazy push: pi[v] += a*res; spread (1-a)*res/(2*deg) to neighbors;
//     residue[v] <- res*(1-a)/2; settle when residue <= eps*deg
//   * the propagation frontier pops the smallest node id first
//     (std::set semantics in the reference) for determinism
//   * top-k selected by (-score, node id)
//
// Exposed via a C ABI consumed with ctypes (no pybind11 dependency).
#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <map>
#include <queue>
#include <set>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

using NodeT = int32_t;

struct Csr {
  const int64_t* indptr;
  const NodeT* indices;
  int64_t n;
};

// one target's push using dense state vectors (graphs <= dense_limit)
template <typename State>
void push_one(const Csr& g, const std::vector<NodeT>& deg, NodeT target,
              float alpha, float epsilon, State& pi, State& residue,
              std::vector<std::pair<float, NodeT>>& out_touched) {
  std::set<NodeT> prop{target};
  residue[target] = 1.0f;
  std::unordered_map<NodeT, float> touched;
  while (!prop.empty()) {
    NodeT v = *prop.begin();
    prop.erase(prop.begin());
    float res = residue[v];
    pi[v] += alpha * res;
    NodeT dv = deg[v];
    if (dv > 0) {
      float m = (1.0f - alpha) * res / (2.0f * dv);
      for (int64_t i = g.indptr[v]; i < g.indptr[v + 1]; ++i) {
        NodeT u = g.indices[i];
        residue[u] += m;
        if (residue[u] > epsilon * deg[u]) prop.insert(u);
      }
    }
    residue[v] = res * (1.0f - alpha) / 2.0f;
    if (residue[v] <= epsilon * dv || dv == 0) {
      touched[v] = pi[v];
    } else {
      prop.insert(v);
    }
  }
  out_touched.clear();
  out_touched.reserve(touched.size());
  for (auto& kv : touched) out_touched.push_back({-kv.second, kv.first});
}

// sparse-state variant for huge graphs (reference flips to maps >5M nodes)
struct MapState {
  std::unordered_map<NodeT, float> m;
  float& operator[](NodeT i) { return m[i]; }
};

void reset_dense(std::vector<float>& v, std::vector<NodeT>& dirty) {
  for (NodeT i : dirty) v[i] = 0.0f;
  dirty.clear();
}

}  // namespace

extern "C" {

// out_neighs/out_scores: [n_targets, k], pad = -1 / 0.
int shadow_ppr_push(const int64_t* indptr, int64_t n_nodes,
                    const int32_t* indices, int64_t n_edges,
                    const int64_t* targets, int64_t n_targets, int k,
                    float alpha_int, float epsilon, int n_threads,
                    int32_t* out_neighs, float* out_scores) {
  Csr g{indptr, indices, n_nodes};
  std::vector<NodeT> deg(n_nodes);
  for (int64_t i = 0; i < n_nodes; ++i)
    deg[i] = static_cast<NodeT>(indptr[i + 1] - indptr[i]);
  const bool dense = n_nodes <= 5'000'000;
  std::atomic<int64_t> next{0};
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();

  auto worker = [&]() {
    // per-thread reusable dense state (tracked-dirty reset keeps each
    // target O(touched) instead of O(n))
    std::vector<float> pi_d, res_d;
    std::vector<NodeT> dirty_pi, dirty_res;
    if (dense) {
      pi_d.assign(n_nodes, 0.0f);
      res_d.assign(n_nodes, 0.0f);
    }
    std::vector<std::pair<float, NodeT>> touched;
    while (true) {
      int64_t ti = next.fetch_add(1);
      if (ti >= n_targets) break;
      NodeT t = static_cast<NodeT>(targets[ti]);
      if (dense) {
        // dirty-tracking dense push
        std::set<NodeT> prop{t};
        res_d[t] = 1.0f;
        dirty_res.push_back(t);
        std::unordered_map<NodeT, float> touched_m;
        while (!prop.empty()) {
          NodeT v = *prop.begin();
          prop.erase(prop.begin());
          float res = res_d[v];
          if (pi_d[v] == 0.0f) dirty_pi.push_back(v);
          pi_d[v] += alpha_int * res;
          NodeT dv = deg[v];
          if (dv > 0) {
            float m = (1.0f - alpha_int) * res / (2.0f * dv);
            for (int64_t i = indptr[v]; i < indptr[v + 1]; ++i) {
              NodeT u = indices[i];
              if (res_d[u] == 0.0f) dirty_res.push_back(u);
              res_d[u] += m;
              if (res_d[u] > epsilon * deg[u]) prop.insert(u);
            }
          }
          res_d[v] = res * (1.0f - alpha_int) / 2.0f;
          if (res_d[v] <= epsilon * dv || dv == 0) {
            touched_m[v] = pi_d[v];
          } else {
            prop.insert(v);
          }
        }
        touched.clear();
        for (auto& kv : touched_m) touched.push_back({-kv.second, kv.first});
        reset_dense(pi_d, dirty_pi);
        reset_dense(res_d, dirty_res);
      } else {
        MapState pi_m, res_m;
        push_one(g, deg, t, alpha_int, epsilon, pi_m, res_m, touched);
      }
      // top-k by (-score, id)
      size_t kk = std::min<size_t>(k, touched.size());
      std::partial_sort(touched.begin(), touched.begin() + kk, touched.end());
      int32_t* on = out_neighs + ti * k;
      float* os = out_scores + ti * k;
      for (size_t i = 0; i < (size_t)k; ++i) {
        if (i < kk) {
          on[i] = touched[i].second;
          os[i] = -touched[i].first;
        } else {
          on[i] = -1;
          os[i] = 0.0f;
        }
      }
    }
  };

  std::vector<std::thread> pool;
  for (int i = 0; i < n_threads; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return 0;
}

}  // extern "C"
