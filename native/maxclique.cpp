// Exact maximum-clique solver: branch-and-bound with greedy coloring bounds
// over 64-bit bitset adjacency rows.
//
// Role: PMC_EXACT parity for the TEASER-class solver. The TPU kernel
// (poseestimator_tpu/registration/maxclique.py) runs parallel greedy growth —
// exact in practice on registration consistency graphs but heuristic in the
// worst case. This solver is certified exact; it verifies the kernel in tests
// and serves as a host fallback for adversarial graphs. The algorithm is the
// classic Tomita-style MCS/BBMC scheme (public literature), implemented from
// scratch.
//
// C ABI (ctypes):
//   int pe_max_clique(const uint8_t* adj, int n, int* out_members);
//     adj: row-major n*n, nonzero = edge (diagonal ignored); out_members:
//     caller-allocated n ints, the clique vertex ids are written to the
//     front; returns clique size (or -1 on error, n > PE_MAX_N).
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kMaxN = 4096;
using Word = uint64_t;

struct Graph {
  int n = 0;
  int words = 0;
  std::vector<Word> rows;  // n * words bitset adjacency

  const Word* row(int v) const { return rows.data() + v * words; }
  Word* row(int v) { return rows.data() + v * words; }
  bool has(int u, int v) const { return (row(u)[v >> 6] >> (v & 63)) & 1; }
};

inline int popcount_set(const Word* s, int words) {
  int c = 0;
  for (int i = 0; i < words; ++i) c += __builtin_popcountll(s[i]);
  return c;
}

inline void set_and(Word* dst, const Word* a, const Word* b, int words) {
  for (int i = 0; i < words; ++i) dst[i] = a[i] & b[i];
}

inline int first_bit(const Word* s, int words) {
  for (int i = 0; i < words; ++i)
    if (s[i]) return (i << 6) + __builtin_ctzll(s[i]);
  return -1;
}

inline void clear_bit(Word* s, int v) { s[v >> 6] &= ~(Word(1) << (v & 63)); }

class Solver {
 public:
  explicit Solver(const Graph& g) : g_(g), best_size_(0) {
    best_.reserve(g.n);
    cur_.reserve(g.n);
    // scratch: one candidate set + one color buffer per depth level
    cand_stack_.resize(size_t(g.n + 1) * g.words);
    order_.resize(g.n);
    colors_.resize(g.n);
  }

  int solve(std::vector<int>* out) {
    std::vector<Word> all(g_.words, 0);
    for (int v = 0; v < g_.n; ++v) all[v >> 6] |= Word(1) << (v & 63);
    expand(all.data(), 0);
    *out = best_;
    return best_size_;
  }

 private:
  // greedy sequential coloring of the candidate set; vertices emitted in
  // reverse color order with their color as the bound
  int color_sort(const Word* cand) {
    int m = 0;
    std::vector<Word> uncolored(cand, cand + g_.words);
    int color = 0;
    while (true) {
      std::vector<Word> avail(uncolored);
      int v = first_bit(avail.data(), g_.words);
      if (v < 0) break;
      ++color;
      while (v >= 0) {
        clear_bit(uncolored.data(), v);
        clear_bit(avail.data(), v);
        // remove neighbors of v from this color class
        for (int i = 0; i < g_.words; ++i) avail[i] &= ~g_.row(v)[i];
        order_[m] = v;
        colors_[m] = color;
        ++m;
        v = first_bit(avail.data(), g_.words);
      }
    }
    return m;
  }

  void expand(const Word* cand, int depth) {
    int m = color_sort(cand);
    // iterate highest color last-emitted first
    std::vector<int> ord(order_.begin(), order_.begin() + m);
    std::vector<int> col(colors_.begin(), colors_.begin() + m);
    std::vector<Word> local(cand, cand + g_.words);
    for (int i = m - 1; i >= 0; --i) {
      if (int(cur_.size()) + col[i] <= best_size_) return;  // bound
      int v = ord[i];
      cur_.push_back(v);
      Word* next = cand_stack_.data() + size_t(depth + 1) * g_.words;
      set_and(next, local.data(), g_.row(v), g_.words);
      if (popcount_set(next, g_.words) == 0) {
        if (int(cur_.size()) > best_size_) {
          best_size_ = int(cur_.size());
          best_ = cur_;
        }
      } else {
        expand(next, depth + 1);
      }
      cur_.pop_back();
      clear_bit(local.data(), v);
    }
  }

  const Graph& g_;
  int best_size_;
  std::vector<int> best_, cur_;
  std::vector<Word> cand_stack_;
  std::vector<int> order_, colors_;
};

}  // namespace

extern "C" int pe_max_clique(const uint8_t* adj, int n, int* out_members) {
  if (n <= 0 || n > kMaxN || !adj || !out_members) return -1;
  Graph g;
  g.n = n;
  g.words = (n + 63) >> 6;
  g.rows.assign(size_t(n) * g.words, 0);
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j < n; ++j) {
      if (i != j && adj[size_t(i) * n + j]) g.row(i)[j >> 6] |= Word(1) << (j & 63);
    }
  }
  Solver s(g);
  std::vector<int> best;
  int size = s.solve(&best);
  for (int i = 0; i < size; ++i) out_members[i] = best[i];
  return size;
}
