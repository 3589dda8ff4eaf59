// Native helpers for rcnn_ocr_tpu: unicode-aware Levenshtein edit distance.
//
// The reference stack outsourced this to the python-Levenshtein C extension
// (/root/reference/training/metrics.py:1); here it is first-party native
// code, exposed over a plain C ABI for ctypes.

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

// Edit distance between two uint32 codepoint/id sequences.
int64_t rcnn_levenshtein_u32(const uint32_t* a, int64_t la, const uint32_t* b,
                             int64_t lb) {
  if (la < lb) {
    std::swap(a, b);
    std::swap(la, lb);
  }
  if (lb == 0) return la;
  std::vector<int64_t> prev(lb + 1), cur(lb + 1);
  for (int64_t j = 0; j <= lb; ++j) prev[j] = j;
  for (int64_t i = 1; i <= la; ++i) {
    cur[0] = i;
    const uint32_t ca = a[i - 1];
    for (int64_t j = 1; j <= lb; ++j) {
      const int64_t sub = prev[j - 1] + (ca != b[j - 1] ? 1 : 0);
      cur[j] = std::min(std::min(prev[j] + 1, cur[j - 1] + 1), sub);
    }
    std::swap(prev, cur);
  }
  return prev[lb];
}

// Batched edit distance: refs/hyps are concatenated id sequences with
// per-row lengths; out receives n distances — ONE FFI call for a whole
// dataset (bound as native.levenshtein_batch; the eval CLI's CER loop
// rides it via metrics.batch_character_error_rate).
void rcnn_levenshtein_batch_u32(const uint32_t* refs, const int64_t* ref_lens,
                                const uint32_t* hyps, const int64_t* hyp_lens,
                                int64_t n, int64_t* out) {
  int64_t ro = 0, ho = 0;
  for (int64_t i = 0; i < n; ++i) {
    out[i] = rcnn_levenshtein_u32(refs + ro, ref_lens[i], hyps + ho, hyp_lens[i]);
    ro += ref_lens[i];
    ho += hyp_lens[i];
  }
}

}  // extern "C"
