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
// O(n) time, ~(text + 9n bytes at top level) memory with int64 indices.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

template <typename Char>
struct SaisProblem {
  const Char* T;   // text including trailing sentinel at index n-1 (unique min)
  int64_t n;       // length including sentinel
  int64_t K;       // alphabet size (values in [0, K))
};

// Compute suffix types; returns bitvector where bit=1 means S-type.
inline bool is_lms(const std::vector<uint8_t>& stype, int64_t i) {
  return i > 0 && stype[i] && !stype[i - 1];
}

template <typename Char>
void compute_types(const SaisProblem<Char>& p, std::vector<uint8_t>& stype) {
  stype.assign(p.n, 0);
  stype[p.n - 1] = 1;  // sentinel is S
  for (int64_t i = p.n - 2; i >= 0; --i) {
    stype[i] = (p.T[i] < p.T[i + 1]) || (p.T[i] == p.T[i + 1] && stype[i + 1]);
  }
}

template <typename Char>
void bucket_counts(const SaisProblem<Char>& p, std::vector<int64_t>& cnt) {
  cnt.assign(p.K, 0);
  for (int64_t i = 0; i < p.n; ++i) cnt[p.T[i]]++;
}

inline void bucket_heads(const std::vector<int64_t>& cnt, std::vector<int64_t>& head) {
  head.resize(cnt.size());
  int64_t s = 0;
  for (size_t c = 0; c < cnt.size(); ++c) { head[c] = s; s += cnt[c]; }
}

inline void bucket_tails(const std::vector<int64_t>& cnt, std::vector<int64_t>& tail) {
  tail.resize(cnt.size());
  int64_t s = 0;
  for (size_t c = 0; c < cnt.size(); ++c) { s += cnt[c]; tail[c] = s; }
}

static const int64_t EMPTY = -1;

// Induce L- and S-type suffixes from the LMS placement already in sa.
template <typename Char>
void induce(const SaisProblem<Char>& p, const std::vector<uint8_t>& stype,
            const std::vector<int64_t>& cnt, int64_t* sa) {
  std::vector<int64_t> idx;
  // L: left-to-right from bucket heads
  bucket_heads(cnt, idx);
  // sentinel's predecessor seeds the scan: sa[0] holds the sentinel suffix
  for (int64_t i = 0; i < p.n; ++i) {
    int64_t j = sa[i];
    if (j > 0 && !stype[j - 1]) {
      sa[idx[p.T[j - 1]]++] = j - 1;
    }
  }
  // S: right-to-left from bucket tails
  bucket_tails(cnt, idx);
  for (int64_t i = p.n - 1; i >= 0; --i) {
    int64_t j = sa[i];
    if (j > 0 && stype[j - 1]) {
      sa[--idx[p.T[j - 1]]] = j - 1;
    }
  }
}

template <typename Char>
void sais_core(const SaisProblem<Char>& p, int64_t* sa) {
  const Char* T = p.T;
  const int64_t n = p.n;
  if (n == 1) { sa[0] = 0; return; }

  std::vector<uint8_t> stype;
  compute_types(p, stype);
  std::vector<int64_t> cnt;
  bucket_counts(p, cnt);
  std::vector<int64_t> idx;

  // ---- Pass 1: sort LMS substrings by induced sorting ----
  std::fill(sa, sa + n, EMPTY);
  bucket_tails(cnt, idx);
  for (int64_t i = 0; i < n; ++i) {
    if (is_lms(stype, i)) sa[--idx[T[i]]] = i;
  }
  // (sentinel, an LMS, lands at sa[0] since it is the unique minimum)
  induce(p, stype, cnt, sa);

  // Collect sorted LMS positions.
  int64_t n_lms = 0;
  for (int64_t i = 0; i < n; ++i) if (is_lms(stype, i)) ++n_lms;
  std::vector<int64_t> lms_sorted;
  lms_sorted.reserve(n_lms);
  for (int64_t i = 0; i < n; ++i) {
    if (sa[i] != EMPTY && is_lms(stype, sa[i])) lms_sorted.push_back(sa[i]);
  }

  // ---- Name LMS substrings ----
  // names[i] = rank of the LMS substring starting at position i.
  std::vector<int64_t> name_of(n, EMPTY);
  int64_t name = 0;
  int64_t prev = EMPTY;
  for (int64_t k = 0; k < n_lms; ++k) {
    int64_t cur = lms_sorted[k];
    bool diff = false;
    if (prev == EMPTY) {
      diff = true;
    } else {
      // Compare the two LMS substrings (from start to the next LMS position,
      // inclusive). Sentinel substring is just the sentinel.
      for (int64_t d = 0; ; ++d) {
        int64_t a = prev + d, b = cur + d;
        if (a >= n || b >= n) { diff = true; break; }
        if (T[a] != T[b] || stype[a] != stype[b]) { diff = true; break; }
        if (d > 0 && (is_lms(stype, a) || is_lms(stype, b))) {
          diff = !(is_lms(stype, a) && is_lms(stype, b));
          break;
        }
      }
    }
    if (diff) { ++name; prev = cur; }
    name_of[cur] = name - 1;
  }

  // Positions of LMS in text order + their names form the reduced problem.
  std::vector<int64_t> lms_pos;
  lms_pos.reserve(n_lms);
  for (int64_t i = 0; i < n; ++i) if (is_lms(stype, i)) lms_pos.push_back(i);

  std::vector<int64_t> lms_order(n_lms);
  if (name < n_lms) {
    // Recurse on the reduced string (its last symbol, the sentinel's name 0,
    // is the unique minimum).
    std::vector<int64_t> reduced(n_lms);
    for (int64_t k = 0; k < n_lms; ++k) reduced[k] = name_of[lms_pos[k]];
    std::vector<int64_t> sub_sa(n_lms);
    SaisProblem<int64_t> sub{reduced.data(), n_lms, name};
    sais_core(sub, sub_sa.data());
    for (int64_t k = 0; k < n_lms; ++k) lms_order[k] = lms_pos[sub_sa[k]];
  } else {
    // Names are unique: order LMS positions by name directly.
    for (int64_t k = 0; k < n_lms; ++k) lms_order[name_of[lms_pos[k]]] = lms_pos[k];
  }

  // ---- Pass 2: induce the full SA from the correctly ordered LMS set ----
  std::fill(sa, sa + n, EMPTY);
  bucket_tails(cnt, idx);
  for (int64_t k = n_lms - 1; k >= 0; --k) {
    int64_t i = lms_order[k];
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
  for (int64_t i = 0; i < n; ++i) T[i] = static_cast<uint8_t>(text[i] + 1);
  T[n] = 0;
  std::vector<int64_t> full_sa(n + 1);
  SaisProblem<uint8_t> p{T.data(), n + 1, 256};
  sais_core(p, full_sa.data());
  // full_sa[0] is the sentinel position n; drop it.
  std::memcpy(sa, full_sa.data() + 1, sizeof(int64_t) * n);
  return 0;
}

}  // extern "C"
