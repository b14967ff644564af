// Native METEOR alignment engine.
//
// The reference offloads METEOR scoring to a persistent Java VM
// (reference: evaluation/evaluate.py:19,61 — meteor-1.5.jar -stdio); this
// framework's pure-Python METEOR 1.5 (bmt_tpu/evaluation/meteor.py)
// spends nearly all of its scoring time in candidate generation plus the
// Aligner beam search. This library is the native equivalent of that Java
// hot loop: Python interns tokens to integer ids (it owns tokenization,
// the nltk stemmer and the optional synonym table) and makes ONE batched
// call per scoring request; C++ generates candidates, runs the beam
// search and accumulates per-pair sufficient statistics across an
// internal thread pool. Per-pair ctypes chatter — which made a
// call-per-segment design SLOWER than pure Python on realistic captions —
// is amortized to one marshalling pass per corpus.
//
// Contract — BIT-IDENTICAL statistics to the Python path
// (meteor.py:_align_py + _segment_stats):
//   * candidates per (i, j): exact id match first, else stem id match,
//     else synonym-set intersection — the Python elif ordering;
//   * beam states are generated in the exact order the Python loop
//     generates them and cut with a STABLE sort on (-matches, chunks,
//     distance), so ties keep generation order exactly like list.sort;
//   * chunk counting includes the Meteor quirk that one chunk covering
//     both sentences entirely counts as zero fragmentation.
// Verified differentially (exhaustive equality on randomized corpora) in
// tests/test_evaluation.py.
//
// The used-reference bitset is two 64-bit words, so references over 128
// tokens are reported per-pair (status -1) and the caller aligns those
// rare pairs in Python — behavior stays total without a dynamic-bitset
// slow path here.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <thread>
#include <vector>

namespace {

struct State {
  int32_t m;        // matched words (maximize)
  int32_t ch;       // chunks (minimize)
  int32_t d;        // summed |i - j| distance (minimize)
  int32_t li, lj;   // last matched (hyp, ref) positions, -2 if none
  uint64_t u0, u1;  // used reference-word bitset (n_ref <= 128)
  int32_t arena;    // index of this state's last match in the arena, -1
};

struct ArenaEntry {
  int32_t prev;  // previous match of the same state chain, -1 at root
  int32_t i, j, stage;
};

inline bool better(const State& a, const State& b) {
  // Python sort key (-m, ch, d), ascending == (m desc, ch asc, d asc).
  if (a.m != b.m) return a.m > b.m;
  if (a.ch != b.ch) return a.ch < b.ch;
  return a.d < b.d;
}

// Sorted-int-set intersection test (synonym synset ids).
inline bool intersects(const int32_t* a, int32_t na, const int32_t* b,
                       int32_t nb) {
  int32_t i = 0, j = 0;
  while (i < na && j < nb) {
    if (a[i] == b[j]) return true;
    if (a[i] < b[j]) ++i; else ++j;
  }
  return false;
}

constexpr int kStages = 3;
// Per-pair output layout (int32): tmc[3], tmf[3], rmc[3], rmf[3],
// matches, chunks — 14 values (lengths/function counts Python already
// knows from the token lists it packed).
constexpr int kOut = 4 * kStages + 2;

struct TokView {
  const int32_t* ex;   // exact ids
  const int32_t* st;   // stem ids
  const uint8_t* fn;   // function-word flags
  const int32_t* syn_off;  // n+1 offsets into syn_ids (may be null)
  int32_t n;
};

// Scratch buffers reused across one worker thread's pairs.
struct Scratch {
  std::vector<int32_t> cand_j, cand_stage, cand_off;
  std::vector<State> beam, nxt;
  std::vector<ArenaEntry> arena;
  std::vector<ArenaEntry> matches;
};

int align_pair(const TokView& hyp, const TokView& ref,
               const int32_t* syn_ids, int32_t beam_width, Scratch& s,
               int32_t* out) {
  if (ref.n > 128) return -1;
  for (int k = 0; k < kOut; ++k) out[k] = 0;
  if (hyp.n == 0) return 0;

  // ---- candidates, Python _candidates order (i asc, j asc) ----
  s.cand_j.clear();
  s.cand_stage.clear();
  s.cand_off.assign(1, 0);
  const bool syn = hyp.syn_off != nullptr && ref.syn_off != nullptr;
  for (int32_t i = 0; i < hyp.n; ++i) {
    for (int32_t j = 0; j < ref.n; ++j) {
      int32_t stage;
      if (hyp.ex[i] == ref.ex[j]) {
        stage = 0;
      } else if (hyp.st[i] == ref.st[j]) {
        stage = 1;
      } else if (syn && intersects(syn_ids + hyp.syn_off[i],
                                   hyp.syn_off[i + 1] - hyp.syn_off[i],
                                   syn_ids + ref.syn_off[j],
                                   ref.syn_off[j + 1] - ref.syn_off[j])) {
        stage = 2;
      } else {
        continue;
      }
      s.cand_j.push_back(j);
      s.cand_stage.push_back(stage);
    }
    s.cand_off.push_back(static_cast<int32_t>(s.cand_j.size()));
  }

  // ---- beam search, Python _align_py order ----
  s.arena.clear();
  s.beam.assign(1, State{0, 0, 0, -2, -2, 0u, 0u, -1});
  for (int32_t i = 0; i < hyp.n; ++i) {
    s.nxt.clear();
    const int32_t c0 = s.cand_off[i], c1 = s.cand_off[i + 1];
    for (const State& st : s.beam) {
      s.nxt.push_back(st);  // leave hyp[i] unmatched
      for (int32_t c = c0; c < c1; ++c) {
        const int32_t j = s.cand_j[c];
        const uint64_t bit = 1ull << (j & 63);
        if (((j < 64) ? st.u0 : st.u1) & bit) continue;
        State t = st;
        ((j < 64) ? t.u0 : t.u1) |= bit;
        t.m = st.m + 1;
        t.ch = st.ch + ((st.li == i - 1 && st.lj == j - 1) ? 0 : 1);
        t.d = st.d + std::abs(i - j);
        t.li = i;
        t.lj = j;
        t.arena = static_cast<int32_t>(s.arena.size());
        s.arena.push_back({st.arena, i, j, s.cand_stage[c]});
        s.nxt.push_back(t);
      }
    }
    std::stable_sort(s.nxt.begin(), s.nxt.end(), better);
    if (static_cast<int32_t>(s.nxt.size()) > beam_width)
      s.nxt.resize(beam_width);
    s.beam.swap(s.nxt);
  }

  // ---- statistics, Python _segment_stats ----
  s.matches.clear();
  for (int32_t a = s.beam.front().arena; a >= 0; a = s.arena[a].prev)
    s.matches.push_back(s.arena[a]);
  std::reverse(s.matches.begin(), s.matches.end());  // ascending hyp order

  const int32_t n = static_cast<int32_t>(s.matches.size());
  int32_t* tmc = out;
  int32_t* tmf = out + kStages;
  int32_t* rmc = out + 2 * kStages;
  int32_t* rmf = out + 3 * kStages;
  for (const ArenaEntry& m : s.matches) {
    (hyp.fn[m.i] ? tmf : tmc)[m.stage] += 1;
    (ref.fn[m.j] ? rmf : rmc)[m.stage] += 1;
  }
  out[4 * kStages] = n;  // matches (test side; ref side equal)
  int32_t chunks = 0;
  if (n > 0) {
    chunks = 1;
    for (int32_t k = 1; k < n; ++k) {
      if (!(s.matches[k].i == s.matches[k - 1].i + 1 &&
            s.matches[k].j == s.matches[k - 1].j + 1))
        ++chunks;
    }
    // Meteor quirk: a single chunk covering BOTH sentences entirely is
    // zero fragmentation.
    if (chunks == 1 && n == hyp.n && n == ref.n) chunks = 0;
  }
  out[4 * kStages + 1] = chunks;
  return 0;
}

}  // namespace

extern "C" {

// Batched METEOR alignment statistics.
//
// Token streams are packed flat; pair p aligns hypothesis tokens
// [hyp_off[p], hyp_off[p+1]) against reference tokens
// [ref_off[p], ref_off[p+1]). For each side: exact-intern ids, stem ids,
// function-word flags. Synonyms (optional, syn_active != 0): per-token
// sorted synset-id lists, packed as offsets (indexed like the token
// streams, length hyp_off[n_pairs]+1 / ref_off[n_pairs]+1) into syn_ids.
//
// Outputs: per pair, 14 int32 stats (tmc[3], tmf[3], rmc[3], rmf[3],
// matches, chunks) into out_stats, and status[p] = 0 ok / -1 pair needs
// the Python fallback (reference longer than the 128-token bitset).
// Pairs are independent; they are sharded across an internal thread pool
// (n_threads <= 0 picks hardware_concurrency, capped at 16).
// Returns 0.
int bmt_meteor_batch_stats(
    int64_t n_pairs, const int64_t* hyp_off, const int64_t* ref_off,
    const int32_t* hyp_ex, const int32_t* hyp_st, const uint8_t* hyp_fn,
    const int32_t* ref_ex, const int32_t* ref_st, const uint8_t* ref_fn,
    int32_t syn_active, const int32_t* hyp_syn_off,
    const int32_t* ref_syn_off, const int32_t* syn_ids,
    int32_t beam_width, int32_t n_threads, int32_t* out_stats,
    int32_t* status) {
  if (n_threads <= 0) {
    unsigned hc = std::thread::hardware_concurrency();
    n_threads = static_cast<int32_t>(hc ? hc : 1);
  }
  if (n_threads > 16) n_threads = 16;
  if (n_threads > n_pairs) n_threads = n_pairs > 0 ? (int32_t)n_pairs : 1;

  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    Scratch s;
    for (;;) {
      const int64_t p = next.fetch_add(1);
      if (p >= n_pairs) return;
      TokView hyp{hyp_ex + hyp_off[p], hyp_st + hyp_off[p],
                  hyp_fn + hyp_off[p],
                  syn_active ? hyp_syn_off + hyp_off[p] : nullptr,
                  static_cast<int32_t>(hyp_off[p + 1] - hyp_off[p])};
      TokView ref{ref_ex + ref_off[p], ref_st + ref_off[p],
                  ref_fn + ref_off[p],
                  syn_active ? ref_syn_off + ref_off[p] : nullptr,
                  static_cast<int32_t>(ref_off[p + 1] - ref_off[p])};
      status[p] = static_cast<int32_t>(
          align_pair(hyp, ref, syn_ids, beam_width, s, out_stats + p * kOut));
    }
  };
  if (n_threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    for (int32_t t = 0; t < n_threads; ++t) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
  }
  return 0;
}

}  // extern "C"
