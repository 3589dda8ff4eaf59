// Native CTC prefix beam-search decoder for rcnn_ocr_tpu.
//
// Standard CTC prefix beam search (Hannun et al. 2014) over per-frame
// log-probabilities.  The device produces log-probs [T, V]; this host-side
// kernel maintains the top `beam_width` label prefixes with separate
// blank-/non-blank-ending path probabilities.
//
// The reference only shipped a (dead) greedy CTC decoder
// (/root/reference/training/utils.py:122-162); beam search is a
// first-class capability here per the build contract.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <map>
#include <vector>

namespace {

constexpr double kNegInf = -std::numeric_limits<double>::infinity();

inline double LogAdd(double a, double b) {
  if (a == kNegInf) return b;
  if (b == kNegInf) return a;
  const double m = std::max(a, b);
  return m + std::log1p(std::exp(std::min(a, b) - m));
}

struct Probs {
  double pb = kNegInf;  // prob of paths ending in blank
  double pnb = kNegInf;  // prob of paths ending in non-blank
  double total() const { return LogAdd(pb, pnb); }
};

}  // namespace

extern "C" {

// Decode one sequence.
//   log_probs: [T, V] row-major float32 log-probabilities
//   T, V: time steps and vocab size
//   blank: blank class id
//   beam_width: number of prefixes kept per step
//   out_labels: buffer of capacity `max_out` receiving the best label
//               sequence; returns its length (or -1 on error)
//   out_log_prob: receives the total log-prob of the best prefix
int64_t rcnn_ctc_beam_search(const float* log_probs, int64_t T, int64_t V,
                             int64_t blank, int64_t beam_width,
                             int32_t* out_labels, int64_t max_out,
                             float* out_log_prob) {
  if (T < 0 || V <= 0 || blank < 0 || blank >= V || beam_width <= 0) return -1;

  using Prefix = std::vector<int32_t>;
  std::map<Prefix, Probs> beams;
  beams[{}] = Probs{0.0, kNegInf};  // empty prefix, ends-in-blank prob 1

  std::vector<int32_t> cand(V);
  for (int64_t t = 0; t < T; ++t) {
    const float* row = log_probs + t * V;

    // prune the per-frame classes: only consider classes within the beam's
    // reach — the top `beam_width + 1` classes plus blank cover every
    // extension that could survive the beam cut.
    int64_t k = std::min<int64_t>(V, beam_width + 1);
    for (int64_t v = 0; v < V; ++v) cand[v] = static_cast<int32_t>(v);
    std::partial_sort(cand.begin(), cand.begin() + k, cand.end(),
                      [row](int32_t a, int32_t b) { return row[a] > row[b]; });

    std::map<Prefix, Probs> next;
    for (const auto& [prefix, p] : beams) {
      const double p_total = p.total();

      // extend with blank: prefix unchanged
      {
        Probs& np = next[prefix];
        np.pb = LogAdd(np.pb, p_total + row[blank]);
      }
      // repeat last non-blank: prefix unchanged (only non-blank-ending paths)
      if (!prefix.empty()) {
        const int32_t last = prefix.back();
        Probs& np = next[prefix];
        np.pnb = LogAdd(np.pnb, p.pnb + row[last]);
      }
      // extend with a new class
      for (int64_t ci = 0; ci < k; ++ci) {
        const int32_t c = cand[ci];
        if (c == blank) continue;
        Prefix ext = prefix;
        ext.push_back(c);
        Probs& np = next[ext];
        if (!prefix.empty() && c == prefix.back()) {
          // repeated char needs an intervening blank
          np.pnb = LogAdd(np.pnb, p.pb + row[c]);
        } else {
          np.pnb = LogAdd(np.pnb, p_total + row[c]);
        }
      }
    }

    // keep top beam_width prefixes
    if (static_cast<int64_t>(next.size()) > beam_width) {
      std::vector<std::pair<double, const Prefix*>> scored;
      scored.reserve(next.size());
      for (const auto& [prefix, np] : next) scored.push_back({np.total(), &prefix});
      std::nth_element(scored.begin(), scored.begin() + beam_width, scored.end(),
                       [](const auto& a, const auto& b) { return a.first > b.first; });
      const double cutoff = scored[beam_width - 1].first;
      std::map<Prefix, Probs> pruned;
      int64_t kept = 0;
      for (const auto& [prefix, np] : next) {
        if (np.total() >= cutoff && kept < beam_width) {
          pruned.emplace(prefix, np);
          ++kept;
        }
      }
      beams = std::move(pruned);
    } else {
      beams = std::move(next);
    }
  }

  const Prefix* best = nullptr;
  double best_p = kNegInf;
  for (const auto& [prefix, p] : beams) {
    const double tp = p.total();
    if (best == nullptr || tp > best_p) {
      best = &prefix;
      best_p = tp;
    }
  }
  if (best == nullptr) return -1;
  const int64_t n = std::min<int64_t>(best->size(), max_out);
  std::copy(best->begin(), best->begin() + n, out_labels);
  if (out_log_prob != nullptr) *out_log_prob = static_cast<float>(best_p);
  return n;
}

// Batched variant: log_probs [B, T, V]; per-row valid frame counts in
// `lengths` (NULL means all T frames are valid).  Outputs are written to a
// [B, max_out] label buffer and length/log-prob arrays.
int64_t rcnn_ctc_beam_search_batch(const float* log_probs, int64_t B, int64_t T,
                                   int64_t V, const int64_t* lengths,
                                   int64_t blank, int64_t beam_width,
                                   int32_t* out_labels, int64_t max_out,
                                   int64_t* out_lens, float* out_log_probs) {
  for (int64_t b = 0; b < B; ++b) {
    const int64_t t = lengths ? lengths[b] : T;
    const int64_t n = rcnn_ctc_beam_search(
        log_probs + b * T * V, t, V, blank, beam_width, out_labels + b * max_out,
        max_out, out_log_probs ? out_log_probs + b : nullptr);
    if (n < 0) return -1;
    out_lens[b] = n;
  }
  return B;
}

}  // extern "C"
