// Suffix-array construction by induced sorting (SA-IS).
//
// Clean-room implementation of the SA-IS algorithm (Nong, Zhang & Chan,
// "Two Efficient Algorithms for Linear Time Suffix Array Construction",
// IEEE ToC 2011). Produces the same suffix array as the reference's vendored
// saisxx (reference: src/sais.h) for the same text: the suffix array of the
// plain string with end-of-string treated as a unique minimal sentinel.
//
// Exposed C ABI (used from Python via ctypes):
//   int sais_u8(const uint8_t* text, int64_t* sa, int64_t n)
//     text: n bytes, values 0..254 (DNA uses 0..3)
//     sa:   output, n entries
//   returns 0 on success.
//
// Templated on the index type: texts under 2^31 run entirely on int32
// indices (half the memory traffic — the dominant cost on bandwidth-bound
// build hosts) and widen to int64 only at the output copy.

// Threading (BWAMEME_BUILD_THREADS, default = hardware concurrency): the
// type scan, bucket histogram, LMS-substring naming compares, and the
// boundary copies are chunk-parallel with bit-identical results at any
// thread count; the two induced-sorting scans are inherently sequential
// (each placement depends on previously induced entries) and stay serial —
// the same split the reference makes (its saisxx is serial; its OpenMP
// lives in the surrounding key/ISA passes, src/Learnedindex.cpp:301).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline int build_threads() {
  const char* e = std::getenv("BWAMEME_BUILD_THREADS");
  if (e && *e) {
    int v = std::atoi(e);
    if (v >= 1) return v;
  }
  unsigned hc = std::thread::hardware_concurrency();
  return hc ? (int)hc : 1;
}

// Run fn(t, begin, end) over nt roughly equal chunks of [0, n).
template <typename F>
void parallel_chunks(int64_t n, F fn) {
  int nt = build_threads();
  if (nt <= 1 || n < (int64_t)nt * 8192) {
    fn(0, (int64_t)0, n);
    return;
  }
  std::vector<std::thread> ts;
  ts.reserve(nt);
  int64_t per = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t b = (int64_t)t * per;
    int64_t e = b + per < n ? b + per : n;
    if (b >= e) break;
    ts.emplace_back(fn, t, b, e);
  }
  for (auto& th : ts) th.join();
}

template <typename Char, typename Idx>
struct SaisProblem {
  const Char* T;   // text including trailing sentinel at index n-1 (unique min)
  Idx n;           // length including sentinel
  Idx K;           // alphabet size (values in [0, K))
};

// Compute suffix types; returns bitvector where bit=1 means S-type.
template <typename Idx>
inline bool is_lms(const std::vector<uint8_t>& stype, Idx i) {
  return i > 0 && stype[i] && !stype[i - 1];
}

template <typename Char, typename Idx>
void compute_types(const SaisProblem<Char, Idx>& p,
                   std::vector<uint8_t>& stype) {
  stype.assign(p.n, 0);
  stype[p.n - 1] = 1;  // sentinel is S
  // Chunk-parallel right-to-left scan: within a chunk, a position's type is
  // decided as soon as a character difference appears to its right; only
  // the trailing run of characters equal to the chunk's last character
  // chains past the boundary. Each chunk resolves its interior, records
  // the undecided trailing-run length, and a cheap right-to-left fixup
  // fills the runs once the boundary types are known.
  const Idx n = p.n;
  int nt = build_threads();
  if (nt <= 1 || n < (Idx)(nt * 8192) || n < 2) {
    for (Idx i = n - 2; i >= 0; --i) {
      stype[i] =
          (p.T[i] < p.T[i + 1]) || (p.T[i] == p.T[i + 1] && stype[i + 1]);
    }
    return;
  }
  std::vector<int64_t> pend_lo((size_t)nt, -1);  // first undecided index
  parallel_chunks((int64_t)n - 1, [&](int t, int64_t b, int64_t e) {
    // decide [b, e) assuming stype[e] unknown (e == n-1 is known: sentinel)
    int64_t i = e - 1;
    if (e == (int64_t)n - 1) {
      // last chunk: stype[n-1] is known, run fully
      for (; i >= b; --i) {
        stype[i] = (p.T[i] < p.T[i + 1]) ||
                   (p.T[i] == p.T[i + 1] && stype[i + 1]);
      }
      return;
    }
    // skip (record) the trailing equal-run that depends on stype[e]
    while (i >= b && p.T[i] == p.T[i + 1]) --i;
    pend_lo[t] = i + 1;  // [pend_lo, e) undecided (may be empty)
    for (; i >= b; --i) {
      stype[i] =
          (p.T[i] < p.T[i + 1]) || (p.T[i] == p.T[i + 1] && stype[i + 1]);
    }
  });
  // fixup: resolve pending runs right-to-left (each run copies the type at
  // its right edge after comparing the boundary characters)
  int64_t per = ((int64_t)n - 1 + nt - 1) / nt;
  for (int t = nt - 1; t >= 0; --t) {
    int64_t b = (int64_t)t * per;
    int64_t e = b + per < (int64_t)n - 1 ? b + per : (int64_t)n - 1;
    if (b >= e || pend_lo[t] < 0) continue;
    for (int64_t i = e - 1; i >= pend_lo[t]; --i) {
      stype[i] =
          (p.T[i] < p.T[i + 1]) || (p.T[i] == p.T[i + 1] && stype[i + 1]);
    }
  }
}

template <typename Char, typename Idx>
void bucket_counts(const SaisProblem<Char, Idx>& p, std::vector<Idx>& cnt) {
  cnt.assign(p.K, 0);
  int nt = build_threads();
  // per-thread histograms pay K*nt memory: only when K is small (the hot
  // top level is K=256; deep recursion levels with huge alphabets are tiny)
  if (nt <= 1 || p.K > 65536 || p.n < (Idx)(nt * 8192)) {
    for (Idx i = 0; i < p.n; ++i) cnt[p.T[i]]++;
    return;
  }
  std::vector<std::vector<Idx>> local((size_t)nt);
  parallel_chunks((int64_t)p.n, [&](int t, int64_t b, int64_t e) {
    auto& h = local[t];
    h.assign(p.K, 0);
    for (int64_t i = b; i < e; ++i) h[p.T[i]]++;
  });
  for (auto& h : local) {
    if (h.empty()) continue;
    for (size_t c = 0; c < (size_t)p.K; ++c) cnt[c] += h[c];
  }
}

template <typename Idx>
inline void bucket_heads(const std::vector<Idx>& cnt, std::vector<Idx>& head) {
  head.resize(cnt.size());
  Idx s = 0;
  for (size_t c = 0; c < cnt.size(); ++c) { head[c] = s; s += cnt[c]; }
}

template <typename Idx>
inline void bucket_tails(const std::vector<Idx>& cnt, std::vector<Idx>& tail) {
  tail.resize(cnt.size());
  Idx s = 0;
  for (size_t c = 0; c < cnt.size(); ++c) { s += cnt[c]; tail[c] = s; }
}

// Induce L- and S-type suffixes from the LMS placement already in sa.
template <typename Char, typename Idx>
void induce(const SaisProblem<Char, Idx>& p, const std::vector<uint8_t>& stype,
            const std::vector<Idx>& cnt, Idx* sa) {
  const Idx EMPTY = -1;
  std::vector<Idx> idx;
  // L: left-to-right from bucket heads
  bucket_heads(cnt, idx);
  // sentinel's predecessor seeds the scan: sa[0] holds the sentinel suffix
  for (Idx i = 0; i < p.n; ++i) {
    Idx j = sa[i];
    if (j > 0 && !stype[j - 1]) {
      sa[idx[p.T[j - 1]]++] = j - 1;
    }
  }
  // S: right-to-left from bucket tails
  bucket_tails(cnt, idx);
  for (Idx i = p.n - 1; i >= 0; --i) {
    Idx j = sa[i];
    if (j > 0 && stype[j - 1]) {
      sa[--idx[p.T[j - 1]]] = j - 1;
    }
  }
  (void)EMPTY;
}

template <typename Char, typename Idx>
void sais_core(const SaisProblem<Char, Idx>& p, Idx* sa) {
  const Idx EMPTY = -1;
  const Char* T = p.T;
  const Idx n = p.n;
  if (n == 1) { sa[0] = 0; return; }

  std::vector<uint8_t> stype;
  compute_types(p, stype);
  std::vector<Idx> cnt;
  bucket_counts(p, cnt);
  std::vector<Idx> idx;

  // ---- Pass 1: sort LMS substrings by induced sorting ----
  std::fill(sa, sa + n, EMPTY);
  bucket_tails(cnt, idx);
  for (Idx i = 0; i < n; ++i) {
    if (is_lms(stype, i)) sa[--idx[T[i]]] = i;
  }
  // (sentinel, an LMS, lands at sa[0] since it is the unique minimum)
  induce(p, stype, cnt, sa);

  // Collect sorted LMS positions.
  Idx n_lms = 0;
  for (Idx i = 0; i < n; ++i) if (is_lms(stype, i)) ++n_lms;
  std::vector<Idx> lms_sorted;
  lms_sorted.reserve(n_lms);
  for (Idx i = 0; i < n; ++i) {
    if (sa[i] != EMPTY && is_lms(stype, sa[i])) lms_sorted.push_back(sa[i]);
  }

  // ---- Name LMS substrings ----
  // names[i] = rank of the LMS substring starting at position i. The
  // neighbor-difference flags are independent compares (equal substrings
  // are transitively equal, so comparing each entry to its sorted
  // predecessor equals the serial last-distinct-prev tracking) — threaded;
  // the name assignment is a cheap serial prefix sum over the flags.
  std::vector<Idx> name_of(n, EMPTY);
  std::vector<uint8_t> diff_flag(n_lms, 0);
  if (n_lms > 0) diff_flag[0] = 1;
  parallel_chunks((int64_t)n_lms - 1, [&](int, int64_t kb, int64_t ke) {
    for (int64_t k1 = kb; k1 < ke; ++k1) {
      Idx prev = lms_sorted[k1];
      Idx cur = lms_sorted[k1 + 1];
      bool diff = false;
      // Compare the two LMS substrings (from start to the next LMS position,
      // inclusive). Sentinel substring is just the sentinel.
      for (Idx d = 0; ; ++d) {
        Idx a = prev + d, b = cur + d;
        if (a >= n || b >= n) { diff = true; break; }
        if (T[a] != T[b] || stype[a] != stype[b]) { diff = true; break; }
        if (d > 0 && (is_lms(stype, a) || is_lms(stype, b))) {
          diff = !(is_lms(stype, a) && is_lms(stype, b));
          break;
        }
      }
      diff_flag[k1 + 1] = diff ? 1 : 0;
    }
  });
  Idx name = 0;
  for (Idx k = 0; k < n_lms; ++k) {
    name += diff_flag[k];
    name_of[lms_sorted[k]] = name - 1;
  }

  // Positions of LMS in text order + their names form the reduced problem.
  std::vector<Idx> lms_pos;
  lms_pos.reserve(n_lms);
  for (Idx i = 0; i < n; ++i) if (is_lms(stype, i)) lms_pos.push_back(i);

  std::vector<Idx> lms_order(n_lms);
  if (name < n_lms) {
    // Recurse on the reduced string (its last symbol, the sentinel's name 0,
    // is the unique minimum).
    std::vector<Idx> reduced(n_lms);
    for (Idx k = 0; k < n_lms; ++k) reduced[k] = name_of[lms_pos[k]];
    std::vector<Idx> sub_sa(n_lms);
    SaisProblem<Idx, Idx> sub{reduced.data(), n_lms, name};
    sais_core(sub, sub_sa.data());
    for (Idx k = 0; k < n_lms; ++k) lms_order[k] = lms_pos[sub_sa[k]];
  } else {
    // Names are unique: order LMS positions by name directly.
    for (Idx k = 0; k < n_lms; ++k) lms_order[name_of[lms_pos[k]]] = lms_pos[k];
  }

  // ---- Pass 2: induce the full SA from the correctly ordered LMS set ----
  std::fill(sa, sa + n, EMPTY);
  bucket_tails(cnt, idx);
  for (Idx k = n_lms - 1; k >= 0; --k) {
    Idx i = lms_order[k];
    sa[--idx[T[i]]] = i;
  }
  induce(p, stype, cnt, sa);
}

}  // namespace

extern "C" {

// Suffix array of `text` (no sentinel in the input; end-of-string compares
// smallest, matching saisxx semantics). Returns 0 on success.
int sais_u8(const uint8_t* text, int64_t* sa, int64_t n) {
  if (n < 0) return -1;
  if (n == 0) return 0;
  // Append virtual sentinel: shift alphabet by +1 so 0 is the unique minimum.
  std::vector<uint8_t> T(n + 1);
  parallel_chunks(n, [&](int, int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) T[i] = static_cast<uint8_t>(text[i] + 1);
  });
  T[n] = 0;
  if (n + 1 < 0x7FFFFFFFll) {
    // int32 fast path: half the index-array traffic
    std::vector<int32_t> full_sa(n + 1);
    SaisProblem<uint8_t, int32_t> p{T.data(), (int32_t)(n + 1), 256};
    sais_core(p, full_sa.data());
    // full_sa[0] is the sentinel position n; drop it and widen.
    parallel_chunks(n, [&](int, int64_t b, int64_t e) {
      for (int64_t i = b; i < e; ++i) sa[i] = full_sa[i + 1];
    });
    return 0;
  }
  std::vector<int64_t> full_sa(n + 1);
  SaisProblem<uint8_t, int64_t> p{T.data(), n + 1, 256};
  sais_core(p, full_sa.data());
  // full_sa[0] is the sentinel position n; drop it.
  std::memcpy(sa, full_sa.data() + 1, sizeof(int64_t) * n);
  return 0;
}

}  // extern "C"
