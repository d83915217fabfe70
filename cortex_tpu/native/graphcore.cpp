// graphcore — native host graph kernels for cortex_tpu.
//
// The reference engine gets its host-side graph performance from
// compiled Rust (crates/cortex-core/src/graph/{traversal,paths}.rs:
// BFS frontier loops, BinaryHeap Dijkstra); the TPU rebuild keeps the
// *device* form for bulk proximity scoring (graph/csr.py) and uses
// this C++ library for the latency-sensitive host paths: exact BFS
// depths with budgets, max-product Dijkstra (paths.rs:113-200), and
// connected components (engine.rs:404-436). Python fallbacks exist for
// every entry point; this library is a pure accelerator.
//
// Build: g++ -O3 -shared -fPIC (see native/build.py). ABI: plain C,
// int32/float32 arrays — loaded via ctypes, no pybind/pyext needed.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <thread>
#include <utility>
#include <vector>

extern "C" {

// Multi-source BFS over CSR. depths[n] must be preallocated; unreached
// nodes get -1. Honors max_depth (<0 = unbounded) and max_visited
// (<=0 = unbounded; counts dequeued nodes). Returns number of nodes
// reached, or -1 when truncated by the visited budget.
int64_t gc_bfs(const int32_t* indptr, const int32_t* indices, int32_t n,
               const int32_t* sources, int32_t n_sources,
               int32_t max_depth, int64_t max_visited,
               int32_t* depths, int32_t* parents) {
  for (int32_t i = 0; i < n; ++i) depths[i] = -1;
  if (parents) for (int32_t i = 0; i < n; ++i) parents[i] = -1;
  std::vector<int32_t> frontier, next;
  frontier.reserve(256);
  for (int32_t s = 0; s < n_sources; ++s) {
    int32_t v = sources[s];
    if (v >= 0 && v < n && depths[v] < 0) {
      depths[v] = 0;
      frontier.push_back(v);
    }
  }
  int64_t reached = static_cast<int64_t>(frontier.size());
  int64_t visited = 0;
  bool truncated = false;
  int32_t depth = 0;
  while (!frontier.empty()) {
    if (max_depth >= 0 && depth >= max_depth) break;
    next.clear();
    for (int32_t u : frontier) {
      if (max_visited > 0 && ++visited > max_visited) {
        truncated = true;
        break;
      }
      for (int32_t e = indptr[u]; e < indptr[u + 1]; ++e) {
        int32_t v = indices[e];
        if (depths[v] < 0) {
          depths[v] = depth + 1;
          if (parents) parents[v] = u;
          next.push_back(v);
          ++reached;
        }
      }
    }
    if (truncated) break;
    frontier.swap(next);
    ++depth;
  }
  return truncated ? -1 : reached;
}

// Max-product shortest path (path weight = product of edge weights in
// (0,1]; maximize). Dijkstra over -log(w) equivalently expressed as
// max-heap on product. Writes the node sequence to out_path (size
// out_cap) and the product to *out_weight. Returns the path length in
// nodes, 0 if unreachable, -1 if out_cap too small.
int32_t gc_dijkstra_maxprod(const int32_t* indptr, const int32_t* indices,
                            const float* weights, int32_t n,
                            int32_t src, int32_t dst, int32_t max_len,
                            int32_t* out_path, int32_t out_cap,
                            double* out_weight) {
  if (src < 0 || src >= n || dst < 0 || dst >= n) return 0;
  std::vector<double> best(n, -1.0);
  std::vector<int32_t> prev(n, -1);
  std::vector<int32_t> hops(n, 0);
  using Item = std::pair<double, int32_t>;  // (product, node)
  std::priority_queue<Item> pq;
  best[src] = 1.0;
  pq.push({1.0, src});
  while (!pq.empty()) {
    auto [w, u] = pq.top();
    pq.pop();
    if (w < best[u]) continue;  // stale entry
    if (u == dst) break;
    if (max_len > 0 && hops[u] >= max_len) continue;
    for (int32_t e = indptr[u]; e < indptr[u + 1]; ++e) {
      int32_t v = indices[e];
      double nw = w * static_cast<double>(weights[e]);
      if (nw > best[v]) {
        best[v] = nw;
        prev[v] = u;
        hops[v] = hops[u] + 1;
        pq.push({nw, v});
      }
    }
  }
  if (best[dst] < 0.0) return 0;
  // reconstruct (dst -> src), then reverse
  std::vector<int32_t> rev;
  for (int32_t v = dst; v >= 0; v = prev[v]) {
    rev.push_back(v);
    if (v == src) break;
  }
  if (rev.back() != src) return 0;
  if (static_cast<int32_t>(rev.size()) > out_cap) return -1;
  int32_t len = static_cast<int32_t>(rev.size());
  for (int32_t i = 0; i < len; ++i) out_path[i] = rev[len - 1 - i];
  *out_weight = best[dst];
  return len;
}

// Connected components over an undirected CSR (callers must include
// both edge directions). Labels written to comp[n]; returns the
// component count.
int32_t gc_components(const int32_t* indptr, const int32_t* indices,
                      int32_t n, int32_t* comp) {
  for (int32_t i = 0; i < n; ++i) comp[i] = -1;
  std::vector<int32_t> stack;
  int32_t label = 0;
  for (int32_t s = 0; s < n; ++s) {
    if (comp[s] >= 0) continue;
    comp[s] = label;
    stack.push_back(s);
    while (!stack.empty()) {
      int32_t u = stack.back();
      stack.pop_back();
      for (int32_t e = indptr[u]; e < indptr[u + 1]; ++e) {
        int32_t v = indices[e];
        if (comp[v] < 0) {
          comp[v] = label;
          stack.push_back(v);
        }
      }
    }
    ++label;
  }
  return label;
}

// Vectorized edge-decay sweep (host fallback mirroring ops/decay.py):
// w *= exp(-rate_i * days_i); flags[i] = 2 delete, 1 prune, 0 keep.
// Returns count of flagged (non-zero) edges.
int64_t gc_decay_sweep(float* weights, const float* eff_rates,
                       const float* days, int64_t m,
                       float delete_below, float prune_below,
                       uint8_t* flags) {
  int64_t flagged = 0;
  for (int64_t i = 0; i < m; ++i) {
    float w = weights[i] * expf(-eff_rates[i] * days[i]);
    weights[i] = w;
    uint8_t f = 0;
    if (w < delete_below) f = 2;
    else if (w < prune_below) f = 1;
    flags[i] = f;
    flagged += (f != 0);
  }
  return flagged;
}

// Exact fp32 re-rank of device-scan candidates (the serving path's
// second stage). For each of b queries: gather its cand candidate rows
// from the fp32 corpus mirror [n, d], dot with the query, and emit the
// top-k (scores + corpus rows), ties broken by candidate order
// (matches numpy's stable argsort of -scores). Parallel across queries
// — the ctypes call releases the GIL, so this is the fix for the
// single-threaded numpy re-rank leg collapsing at large batches
// (gather blows the cache; measured 23.9 ms at batch 512).
// valid[b*cand]: nonzero = candidate is live. Slots beyond the valid
// count get score -1e30 and row 0.
int32_t gc_rerank_topk(const float* corpus, int64_t n, int32_t d,
                       const float* queries, int32_t b,
                       const int32_t* cand_rows, int32_t cand,
                       const uint8_t* valid, int32_t k,
                       float* out_scores, int32_t* out_rows) {
  int nth = static_cast<int>(std::thread::hardware_concurrency());
  if (nth <= 0) nth = 4;
  if (nth > b) nth = b;
  auto worker = [&](int32_t q0, int32_t q1) {
    std::vector<std::pair<float, int32_t>> sc(cand);
    for (int32_t qi = q0; qi < q1; ++qi) {
      const float* q = queries + static_cast<int64_t>(qi) * d;
      const int32_t* rows = cand_rows + static_cast<int64_t>(qi) * cand;
      const uint8_t* vd = valid + static_cast<int64_t>(qi) * cand;
      int32_t m = 0;
      for (int32_t c = 0; c < cand; ++c) {
        if (!vd[c]) continue;
        int64_t r = rows[c];
        if (r < 0 || r >= n) continue;
        const float* x = corpus + r * d;
        // 8 independent accumulator lanes: a single `s += x*q` chain
        // is a serial FMA dependency the compiler may not reassociate
        // without -ffast-math; unrolling by hand keeps fp32 semantics
        // deterministic AND lets it vectorize (~8x on the dot)
        float a0 = 0.f, a1 = 0.f, a2 = 0.f, a3 = 0.f;
        float a4 = 0.f, a5 = 0.f, a6 = 0.f, a7 = 0.f;
        int32_t j = 0;
        for (; j + 8 <= d; j += 8) {
          a0 += x[j] * q[j];         a1 += x[j + 1] * q[j + 1];
          a2 += x[j + 2] * q[j + 2]; a3 += x[j + 3] * q[j + 3];
          a4 += x[j + 4] * q[j + 4]; a5 += x[j + 5] * q[j + 5];
          a6 += x[j + 6] * q[j + 6]; a7 += x[j + 7] * q[j + 7];
        }
        float s = ((a0 + a1) + (a2 + a3)) + ((a4 + a5) + (a6 + a7));
        for (; j < d; ++j) s += x[j] * q[j];
        sc[m++] = {s, c};
      }
      std::stable_sort(
          sc.begin(), sc.begin() + m,
          [](const std::pair<float, int32_t>& a,
             const std::pair<float, int32_t>& b2) {
            return a.first > b2.first;
          });
      float* os = out_scores + static_cast<int64_t>(qi) * k;
      int32_t* orow = out_rows + static_cast<int64_t>(qi) * k;
      for (int32_t j = 0; j < k; ++j) {
        if (j < m) {
          os[j] = sc[j].first;
          orow[j] = rows[sc[j].second];
        } else {
          os[j] = -1e30f;
          orow[j] = 0;
        }
      }
    }
  };
  if (nth <= 1) {
    worker(0, b);
    return 0;
  }
  std::vector<std::thread> ts;
  ts.reserve(nth);
  int32_t per = (b + nth - 1) / nth;
  for (int t = 0; t < nth; ++t) {
    int32_t q0 = t * per, q1 = std::min(b, q0 + per);
    if (q0 >= q1) break;
    ts.emplace_back(worker, q0, q1);
  }
  for (auto& t : ts) t.join();
  return 0;
}

}  // extern "C"
