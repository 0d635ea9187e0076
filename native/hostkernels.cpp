// Native host-side alignment kernels.
//
// The reference keeps its host runtime in C++ (ksw.cpp, bandedSWA.cpp); these
// are the equivalents for the host-side stages of this framework that are not
// worth a TPU round trip: final CIGAR generation (banded global DP with
// traceback) and the scalar extension oracle. Semantics are bit-identical to
// the Python reference implementations in align/sw_scalar.py, which remain
// the documented contracts (see their docstrings for the reference
// file:line provenance).
//
// C ABI, called from Python via ctypes.

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {
const int32_t NEG_INF = -0x40000000;
}

extern "C" {

// Banded global alignment with traceback (ksw_global2 semantics).
// cigar_out: caller-allocated buffer of cap entries, packed len<<4|op
// (op 0=M 1=I 2=D). Returns score; *n_cigar set; -0x40000000 on overflow.
int32_t sw_global_c(const uint8_t* query, int32_t qlen,
                    const uint8_t* target, int32_t tlen,
                    const int8_t* mat /*5x5*/,
                    int32_t o_del, int32_t e_del,
                    int32_t o_ins, int32_t e_ins, int32_t w,
                    uint32_t* cigar_out, int32_t cap, int32_t* n_cigar) {
  *n_cigar = 0;
  if (qlen <= 0 || tlen <= 0) return 0;
  const int32_t oe_del = o_del + e_del, oe_ins = o_ins + e_ins;
  int64_t n_col = qlen < 2 * w + 1 ? qlen : 2 * w + 1;
  std::vector<uint8_t> z((size_t)n_col * tlen);
  std::vector<int32_t> eh_h(qlen + 1, NEG_INF), eh_e(qlen + 1, NEG_INF);
  eh_h[0] = 0;
  for (int32_t j = 1; j <= qlen && j <= w; ++j) eh_h[j] = -(o_ins + e_ins * j);
  for (int32_t i = 0; i < tlen; ++i) {
    int32_t f = NEG_INF;
    int32_t beg = i > w ? i - w : 0;
    int32_t end = i + w + 1 < qlen ? i + w + 1 : qlen;
    int32_t h1 = beg == 0 ? -(o_del + e_del * (i + 1)) : NEG_INF;
    const int8_t* q = &mat[target[i] * 5];
    uint8_t* zi = &z[(size_t)i * n_col];
    for (int32_t j = beg; j < end; ++j) {
      int32_t m = eh_h[j], e = eh_e[j];
      eh_h[j] = h1;
      m += q[query[j]];
      uint8_t d = m >= e ? 0 : 1;
      int32_t h = m >= e ? m : e;
      if (h < f) { d = 2; h = f; }
      h1 = h;
      int32_t t = m - oe_del;
      e -= e_del;
      if (e > t) d |= 1 << 2; else e = t;
      eh_e[j] = e;
      t = m - oe_ins;
      f -= e_ins;
      if (f > t) d |= 2 << 4; else f = t;
      zi[j - beg] = d;
    }
    eh_h[end] = h1;
    eh_e[end] = NEG_INF;
  }
  int32_t score = eh_h[qlen];
  // backtrack
  int32_t n = 0, which = 0;
  int32_t i = tlen - 1;
  int32_t k = (i + w + 1 < qlen ? i + w + 1 : qlen) - 1;
  auto push = [&](int op, int ln) -> bool {
    if (n && (int)(cigar_out[n - 1] & 0xf) == op) {
      cigar_out[n - 1] += (uint32_t)ln << 4;
      return true;
    }
    if (n >= cap) return false;
    cigar_out[n++] = (uint32_t)ln << 4 | op;
    return true;
  };
  while (i >= 0 && k >= 0) {
    int32_t beg = i > w ? i - w : 0;
    which = (z[(size_t)i * n_col + (k - beg)] >> (which << 1)) & 3;
    bool ok;
    if (which == 0) { ok = push(0, 1); --i; --k; }
    else if (which == 1) { ok = push(2, 1); --i; }
    else { ok = push(1, 1); --k; }
    if (!ok) return NEG_INF;
  }
  if (i >= 0 && !push(2, i + 1)) return NEG_INF;
  if (k >= 0 && !push(1, k + 1)) return NEG_INF;
  // reverse
  for (int32_t a = 0, b = n - 1; a < b; ++a, --b) {
    uint32_t t = cigar_out[a];
    cigar_out[a] = cigar_out[b];
    cigar_out[b] = t;
  }
  *n_cigar = n;
  return score;
}

// Scalar banded extension (scalarBandedSWA / ksw_extend2 semantics).
// out: [score, qle, tle, gtle, gscore, max_off]
void sw_extend_c(const uint8_t* query, int32_t qlen,
                 const uint8_t* target, int32_t tlen,
                 const int8_t* mat, int32_t o_del, int32_t e_del,
                 int32_t o_ins, int32_t e_ins, int32_t w,
                 int32_t end_bonus, int32_t zdrop, int32_t h0,
                 int32_t* out) {
  const int32_t oe_del = o_del + e_del, oe_ins = o_ins + e_ins;
  std::vector<int64_t> eh_h(qlen + 2, 0), eh_e(qlen + 2, 0);
  std::vector<int8_t> qp((size_t)5 * qlen);
  for (int k = 0; k < 5; ++k)
    for (int32_t j = 0; j < qlen; ++j) qp[(size_t)k * qlen + j] = mat[k * 5 + query[j]];
  eh_h[0] = h0;
  if (qlen >= 1) {
    eh_h[1] = h0 > oe_ins ? h0 - oe_ins : 0;
    for (int32_t j = 2; j <= qlen && eh_h[j - 1] > e_ins; ++j)
      eh_h[j] = eh_h[j - 1] - e_ins;
  }
  int32_t mx = 0;
  for (int k = 0; k < 25; ++k) mx = mat[k] > mx ? mat[k] : mx;
  int32_t max_ins = (int32_t)((double)(qlen * mx + end_bonus - o_ins) / e_ins + 1.0);
  if (max_ins < 1) max_ins = 1;
  if (w > max_ins) w = max_ins;
  int32_t max_del = (int32_t)((double)(qlen * mx + end_bonus - o_del) / e_del + 1.0);
  if (max_del < 1) max_del = 1;
  if (w > max_del) w = max_del;

  int64_t max_sc = h0;
  int32_t max_i = -1, max_j = -1, max_ie = -1;
  int64_t gscore = -1;
  int32_t max_off = 0;
  int32_t beg = 0, end = qlen;
  for (int32_t i = 0; i < tlen; ++i) {
    int64_t f = 0, mrow = 0, h1;
    int32_t mj = -1;
    const int8_t* q = &qp[(size_t)target[i] * qlen];
    if (beg < i - w) beg = i - w;
    if (end > i + w + 1) end = i + w + 1;
    if (end > qlen) end = qlen;
    if (beg == 0) {
      h1 = h0 - (o_del + e_del * (i + 1));
      if (h1 < 0) h1 = 0;
    } else h1 = 0;
    for (int32_t j = beg; j < end; ++j) {
      int64_t M = eh_h[j], e = eh_e[j];
      eh_h[j] = h1;
      M = M ? M + q[j] : 0;
      int64_t h = M > e ? M : e;
      h = h > f ? h : f;
      h1 = h;
      if (mrow <= h) { mrow = h; mj = j; }
      int64_t t = M - oe_del;
      t = t > 0 ? t : 0;
      e -= e_del;
      e = e > t ? e : t;
      eh_e[j] = e;
      t = M - oe_ins;
      t = t > 0 ? t : 0;
      f -= e_ins;
      f = f > t ? f : t;
    }
    eh_h[end] = h1;
    eh_e[end] = 0;
    if (end == qlen) {
      if (gscore <= h1) { max_ie = i; gscore = h1; }
    }
    if (mrow == 0) break;
    if (mrow > max_sc) {
      max_sc = mrow; max_i = i; max_j = mj;
      int32_t off = mj > i ? mj - i : i - mj;
      if (off > max_off) max_off = off;
    } else if (zdrop > 0) {
      if (i - max_i > mj - max_j) {
        if (max_sc - mrow - ((i - max_i) - (mj - max_j)) * e_del > zdrop) break;
      } else {
        if (max_sc - mrow - ((mj - max_j) - (i - max_i)) * e_ins > zdrop) break;
      }
    }
    int32_t j = beg;
    while (j < end && eh_h[j] == 0 && eh_e[j] == 0) ++j;
    beg = j;
    j = end;
    while (j >= beg && eh_h[j] == 0 && eh_e[j] == 0) --j;
    end = j + 2 < qlen ? j + 2 : qlen;
  }
  out[0] = (int32_t)max_sc;
  out[1] = max_j + 1;
  out[2] = max_i + 1;
  out[3] = max_ie + 1;
  out[4] = (int32_t)gscore;
  out[5] = max_off;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Batched seed chaining + chain filtering (mem_chain_Learned + mem_chain_flt
// semantics; the documented contracts are the Python implementations in
// align/chain.py:chain_seeds/filter_chains, which cite the reference lines).
// One call chains and filters every read of a batch; outputs are flat arrays
// of kept chains (in filter output order: weight-descending survivors) and
// their seeds.
//
// Returns the total number of kept chains, or -1 when an output cap would
// overflow (caller falls back to the Python path).

namespace {

struct CSeed {
  int64_t rbeg;
  int32_t qbeg, len;
};

struct CChain {
  int64_t pos;
  int32_t rid;
  uint8_t is_alt;
  int32_t w, kept, first;
  std::vector<CSeed> seeds;
};

struct ChainOpts {
  int64_t l_pac;
  int32_t max_occ, band_w, max_chain_gap, min_seed_len;
  int32_t min_chain_weight, max_chain_extend;
  double mask_level, drop_ratio;
  int32_t a, o_del, e_del, o_ins, e_ins;
};

inline int32_t cal_max_gap_c(const ChainOpts& o, int64_t qlen) {
  int64_t l_del = (int64_t)((qlen * o.a - o.o_del) / (double)o.e_del + 1.0);
  int64_t l_ins = (int64_t)((qlen * o.a - o.o_ins) / (double)o.e_ins + 1.0);
  int64_t l = l_del > l_ins ? l_del : l_ins;
  if (l < 1) l = 1;
  int64_t cap = (int64_t)o.band_w << 1;
  return (int32_t)(l < cap ? l : cap);
}

inline int32_t pos2rid_c(const int64_t* off, int32_t n, int64_t l_pac,
                         int64_t pos_f) {
  if (pos_f >= l_pac) return -1;
  // upper_bound(off, pos_f) - 1
  int32_t lo = 0, hi = n;
  while (lo < hi) {
    int32_t mid = (lo + hi) >> 1;
    if (off[mid] <= pos_f) lo = mid + 1; else hi = mid;
  }
  return lo - 1;
}

inline int32_t intv2rid_c(const int64_t* off, int32_t n, int64_t l_pac,
                          int64_t rb, int64_t re) {
  if (rb < l_pac && re > l_pac) return -1;
  int64_t fb = rb < l_pac ? rb : (l_pac << 1) - 1 - rb;
  int64_t fe = (re - 1) < l_pac ? (re - 1) : (l_pac << 1) - 1 - (re - 1);
  if (fb > fe) { int64_t t = fb; fb = fe; fe = t; }
  int32_t rb_id = pos2rid_c(off, n, l_pac, fb);
  int32_t re_id = pos2rid_c(off, n, l_pac, fe);
  return rb_id == re_id ? rb_id : -1;
}

// reference: src/bwamem.cpp:450-492
inline bool test_and_merge_c(const ChainOpts& o, CChain& c, int64_t rbeg,
                             int32_t qbeg, int32_t len, int32_t rid) {
  const CSeed& last = c.seeds.back();
  int64_t qend = last.qbeg + last.len;
  int64_t rend = last.rbeg + last.len;
  if (rid != c.rid) return false;
  if (qbeg >= c.seeds[0].qbeg && qbeg + len <= qend &&
      rbeg >= c.seeds[0].rbeg && rbeg + len <= rend)
    return true;  // contained
  if ((last.rbeg < o.l_pac || c.seeds[0].rbeg < o.l_pac) && rbeg >= o.l_pac)
    return false;  // different strand
  int64_t x = qbeg - last.qbeg;
  int64_t y = rbeg - last.rbeg;
  if (y >= 0 && x - y <= o.band_w && y - x <= o.band_w &&
      x - last.len < o.max_chain_gap && y - last.len < o.max_chain_gap) {
    c.seeds.push_back(CSeed{rbeg, qbeg, len});
    return true;
  }
  return false;
}

// reference: src/bwamem.cpp:523-541
inline int32_t chain_weight_c(const CChain& c) {
  int64_t w = 0, end = 0;
  for (const CSeed& s : c.seeds) {
    if (s.qbeg >= end) w += s.len;
    else if (s.qbeg + s.len > end) w += s.qbeg + s.len - end;
    int64_t e2 = s.qbeg + s.len;
    if (e2 > end) end = e2;
  }
  int64_t tmp = w;
  w = 0; end = 0;
  for (const CSeed& s : c.seeds) {
    if (s.rbeg >= end) w += s.len;
    else if (s.rbeg + s.len > end) w += s.rbeg + s.len - end;
    int64_t e2 = s.rbeg + s.len;
    if (e2 > end) end = e2;
  }
  return (int32_t)(w < tmp ? w : tmp);
}

inline int64_t chn_beg_c(const CChain& c) { return c.seeds[0].qbeg; }
inline int64_t chn_end_c(const CChain& c) {
  const CSeed& s = c.seeds.back();
  return s.qbeg + s.len;
}

// Exact port of ks_introsort (reference: src/ksort.h:185-235) over an
// arbitrary element type: the reference's chain filter sorts by weight
// ALONE, so the (unstable) partition-swap order of equal-weight chains is
// part of the bit-exact SAM contract (it decides which shadowed chain the
// `first` mechanism resurrects). LT = strict ordering functor.
template <typename T, typename LT>
void ks_introsort_c(T* a, int64_t n, LT lt) {
  if (n < 1) return;
  if (n == 2) {
    if (lt(a[1], a[0])) std::swap(a[0], a[1]);
    return;
  }
  auto insertsort = [&](T* s, T* t) {
    for (T* i = s + 1; i < t; ++i)
      for (T* j = i; j > s && lt(*j, *(j - 1)); --j) std::swap(*j, *(j - 1));
  };
  auto combsort = [&](T* base, int64_t m) {
    const double shrink = 1.2473309501039786540366528676643;
    int64_t gap = m;
    bool do_swap;
    do {
      if (gap > 2) {
        gap = (int64_t)(gap / shrink);
        if (gap == 9 || gap == 10) gap = 11;
      }
      do_swap = false;
      for (T* i = base; i < base + m - gap; ++i) {
        T* j = i + gap;
        if (lt(*j, *i)) {
          std::swap(*i, *j);
          do_swap = true;
        }
      }
    } while (do_swap || gap > 2);
    if (gap != 1) insertsort(base, base + m);
  };
  int d = 2;
  while ((1ll << d) < n) ++d;
  struct Frame { T* left; T* right; int depth; };
  std::vector<Frame> stack;
  T* s = a;
  T* t = a + (n - 1);
  d <<= 1;
  while (true) {
    if (s < t) {
      if (--d == 0) {
        combsort(s, t - s + 1);
        t = s;
        continue;
      }
      T* i = s;
      T* j = t;
      T* k = i + ((j - i) >> 1) + 1;
      if (lt(*k, *i)) {
        if (lt(*k, *j)) k = j;
      } else {
        k = lt(*j, *i) ? i : j;
      }
      T rp = *k;
      if (k != t) std::swap(*k, *t);
      for (;;) {
        do ++i; while (lt(*i, rp));
        do --j; while (i <= j && lt(rp, *j));
        if (j <= i) break;
        std::swap(*i, *j);
      }
      std::swap(*i, *t);
      if (i - s > t - i) {
        if (i - s > 16) stack.push_back({s, i - 1, d});
        s = t - i > 16 ? i + 1 : t;
      } else {
        if (t - i > 16) stack.push_back({i + 1, t, d});
        t = i - s > 16 ? i - 1 : s;
      }
    } else {
      if (stack.empty()) {
        insertsort(a, a + n);
        return;
      }
      Frame f = stack.back();
      stack.pop_back();
      s = f.left;
      t = f.right;
      d = f.depth;
    }
  }
}

}  // namespace

extern "C" {

int64_t chain_and_filter_c(
    int32_t R, const int32_t* l_query,
    const int32_t* smem_off,  // R+1 prefix offsets into the smem arrays
    const int32_t* smem_start, const int32_t* smem_end,
    const int64_t* smem_salo, const int64_t* smem_cnt,
    const int64_t* sa,  // suffix-array positions
    int64_t l_pac, int32_t n_contigs, const int64_t* ctg_off,
    const uint8_t* ctg_alt,
    int32_t max_occ, int32_t band_w, int32_t max_chain_gap,
    int32_t min_seed_len, int32_t min_chain_weight, int32_t max_chain_extend,
    double mask_level, double drop_ratio,
    int32_t a, int32_t o_del, int32_t e_del, int32_t o_ins, int32_t e_ins,
    int64_t chain_cap, int64_t seed_cap,
    int64_t* chain_off,  // R+1 prefix chain counts
    int64_t* chain_pos, int32_t* chain_rid, uint8_t* chain_is_alt,
    int32_t* chain_w, int32_t* chain_kept, double* chain_frac_rep,
    int64_t* seed_off,  // chain_cap+1 prefix seed counts per chain
    int64_t* seed_rbeg, int32_t* seed_qbeg, int32_t* seed_len) {
  ChainOpts o{l_pac, max_occ, band_w, max_chain_gap, min_seed_len,
              min_chain_weight, max_chain_extend, mask_level, drop_ratio,
              a, o_del, e_del, o_ins, e_ins};
  int64_t nco = 0, nso = 0;
  chain_off[0] = 0;
  seed_off[0] = 0;
  std::vector<CChain> chains;
  std::vector<int64_t> keys;  // anchor positions, kept sorted
  std::vector<CChain*> flt;
  for (int32_t r = 0; r < R; ++r) {
    chains.clear();
    keys.clear();
    int32_t s0 = smem_off[r], s1 = smem_off[r + 1];
    int32_t lq = l_query[r];
    if (lq >= min_seed_len) {
      // frac_rep (reference: src/bwamem.cpp:1143-1151)
      int64_t l_rep = 0, b = 0, e = 0;
      for (int32_t i = s0; i < s1; ++i) {
        if (smem_cnt[i] <= max_occ) continue;
        int64_t sb = smem_start[i], se = smem_end[i];
        if (sb > e) { l_rep += e - b; b = sb; e = se; }
        else if (se > e) e = se;
      }
      l_rep += e - b;
      double frac_rep = (double)l_rep / lq;

      for (int32_t i = s0; i < s1; ++i) {
        int32_t slen = smem_end[i] - smem_start[i];
        int64_t hc = smem_cnt[i];
        int64_t step = hc > max_occ ? hc / max_occ : 1;
        int64_t count = 0;
        for (int64_t k = 0; k < hc && count < max_occ; k += step, ++count) {
          int64_t rbeg = sa[smem_salo[i] + k];
          int32_t rid = intv2rid_c(ctg_off, n_contigs, l_pac, rbeg,
                                   rbeg + slen);
          if (rid < 0) continue;
          bool to_add = true;
          if (!chains.empty()) {
            // last chain with anchor pos <= rbeg
            int64_t lo = 0, hi = (int64_t)keys.size();
            while (lo < hi) {
              int64_t mid = (lo + hi) >> 1;
              if (keys[mid] <= rbeg) lo = mid + 1; else hi = mid;
            }
            if (lo - 1 >= 0 &&
                test_and_merge_c(o, chains[lo - 1], rbeg, smem_start[i],
                                 slen, rid))
              to_add = false;
          }
          if (to_add) {
            int64_t lo = 0, hi = (int64_t)keys.size();
            while (lo < hi) {
              int64_t mid = (lo + hi) >> 1;
              if (keys[mid] <= rbeg) lo = mid + 1; else hi = mid;
            }
            CChain c;
            c.pos = rbeg;
            c.rid = rid;
            c.is_alt = ctg_alt ? ctg_alt[rid] : 0;
            c.w = 0; c.kept = 0; c.first = -1;
            c.seeds.push_back(CSeed{rbeg, smem_start[i], slen});
            chains.insert(chains.begin() + lo, std::move(c));
            keys.insert(keys.begin() + lo, rbeg);
          }
        }
      }

      // ---- mem_chain_flt (reference: src/bwamem.cpp:599-718) ----
      flt.clear();
      for (CChain& c : chains) {
        c.first = -1;
        c.kept = 0;
        c.w = chain_weight_c(c);
        if (c.w >= min_chain_weight) flt.push_back(&c);
      }
      if (!flt.empty()) {
        ks_introsort_c(flt.data(), (int64_t)flt.size(),
                       [](const CChain* x, const CChain* y) {
                         return x->w > y->w;
                       });
        std::vector<int64_t> kept_idx{0};
        flt[0]->kept = 3;
        for (size_t i2 = 1; i2 < flt.size(); ++i2) {
          bool large_ovlp = false, stop = false;
          for (int64_t j : kept_idx) {
            int64_t b_max = chn_beg_c(*flt[j]) > chn_beg_c(*flt[i2])
                                ? chn_beg_c(*flt[j]) : chn_beg_c(*flt[i2]);
            int64_t e_min = chn_end_c(*flt[j]) < chn_end_c(*flt[i2])
                                ? chn_end_c(*flt[j]) : chn_end_c(*flt[i2]);
            if (e_min > b_max && (!flt[j]->is_alt || flt[i2]->is_alt)) {
              int64_t li = chn_end_c(*flt[i2]) - chn_beg_c(*flt[i2]);
              int64_t lj = chn_end_c(*flt[j]) - chn_beg_c(*flt[j]);
              int64_t min_l = li < lj ? li : lj;
              if (e_min - b_max >= min_l * mask_level &&
                  min_l < max_chain_gap) {
                large_ovlp = true;
                if (flt[j]->first < 0) flt[j]->first = (int32_t)i2;
                if (flt[i2]->w < flt[j]->w * drop_ratio &&
                    flt[j]->w - flt[i2]->w >= min_seed_len << 1) {
                  stop = true;
                  break;
                }
              }
            }
          }
          if (!stop) {
            kept_idx.push_back((int64_t)i2);
            flt[i2]->kept = large_ovlp ? 2 : 3;
          }
        }
        for (int64_t j : kept_idx)
          if (flt[j]->first >= 0) flt[flt[j]->first]->kept = 1;
        // cap on extended shadowed chains
        int64_t kcnt = 0, cut = (int64_t)flt.size();
        for (size_t i2 = 0; i2 < flt.size(); ++i2) {
          if (flt[i2]->kept == 0 || flt[i2]->kept == 3) continue;
          if (++kcnt >= max_chain_extend) { cut = (int64_t)i2; break; }
        }
        for (size_t i2 = cut; i2 < flt.size(); ++i2)
          if (flt[i2]->kept < 3) flt[i2]->kept = 0;

        // ---- emit survivors in filter order ----
        for (CChain* cp : flt) {
          if (cp->kept == 0) continue;
          if (nco >= chain_cap) return -1;
          if (nso + (int64_t)cp->seeds.size() > seed_cap) return -1;
          chain_pos[nco] = cp->pos;
          chain_rid[nco] = cp->rid;
          chain_is_alt[nco] = cp->is_alt;
          chain_w[nco] = cp->w;
          chain_kept[nco] = cp->kept;
          chain_frac_rep[nco] = frac_rep;
          for (const CSeed& s : cp->seeds) {
            seed_rbeg[nso] = s.rbeg;
            seed_qbeg[nso] = s.qbeg;
            seed_len[nso] = s.len;
            ++nso;
          }
          ++nco;
          seed_off[nco] = nso;
        }
      }
    }
    chain_off[r + 1] = nco;
  }
  return nco;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Native extension orchestration: the host-side halves of the fused
// coordinate-based extension (mem_chain2aln_across_reads_V2 semantics; the
// documented contracts are align/extend.py:extend_chains_batch_fused /
// fused_extend_finish, which cite the reference lines).
//
// extend_prepare_c consumes the flat chain arrays emitted by
// chain_and_filter_c and builds the alnreg table plus the left/right
// coordinate job arrays for the device program. extend_finalize_c folds the
// device results back (band-retry already selected on device), computes
// seed coverage, and runs the contained-seed purge. Between the two calls
// the caller runs the single device dispatch.

namespace {

inline int32_t pos2rid_x(const int64_t* off, int32_t n, int64_t l_pac,
                         int64_t pos_f) {
  if (pos_f >= l_pac) return -1;
  int32_t lo = 0, hi = n;
  while (lo < hi) {
    int32_t mid = (lo + hi) >> 1;
    if (off[mid] <= pos_f) lo = mid + 1; else hi = mid;
  }
  return lo - 1;
}

struct ExtOpts {
  int32_t a, o_del, e_del, o_ins, e_ins, band_w;
};

inline int32_t cal_max_gap_x(const ExtOpts& o, int64_t qlen) {
  int64_t l_del = (int64_t)((qlen * o.a - o.o_del) / (double)o.e_del + 1.0);
  int64_t l_ins = (int64_t)((qlen * o.a - o.o_ins) / (double)o.e_ins + 1.0);
  int64_t l = l_del > l_ins ? l_del : l_ins;
  if (l < 1) l = 1;
  int64_t cap = (int64_t)o.band_w << 1;
  return (int32_t)(l < cap ? l : cap);
}

// stable argsort of seed indexes by (len, idx) ascending — the processing
// order key of mem_chain2aln (seeds walked descending from the back)
inline void seed_srt(const int32_t* len, int64_t n, std::vector<int64_t>& srt) {
  srt.resize(n);
  for (int64_t i = 0; i < n; ++i) srt[i] = i;
  std::stable_sort(srt.begin(), srt.end(),
                   [&](int64_t x, int64_t y) { return len[x] < len[y]; });
}

}  // namespace

extern "C" {

// Returns the number of alnregs (== total seeds over kept chains).
int64_t extend_prepare_c(
    int32_t R, const int32_t* l_query,
    const int64_t* chain_off, const int32_t* chain_rid,
    const double* chain_frac_rep,
    const int64_t* seed_off, const int64_t* seed_rbeg,
    const int32_t* seed_qbeg, const int32_t* seed_len,
    int64_t l_pac, int32_t n_contigs, const int64_t* ctg_off,
    int32_t a, int32_t o_del, int32_t e_del, int32_t o_ins, int32_t e_ins,
    int32_t band_w,
    // per-reg outputs (cap = total seeds)
    int32_t* reg_read, int32_t* reg_qb, int64_t* reg_rb, int32_t* reg_qe,
    int64_t* reg_re, int32_t* reg_score, int32_t* reg_truesc, int32_t* reg_w,
    int32_t* reg_seedlen0, int32_t* reg_rid, double* reg_frac_rep,
    int32_t* reg_h0seed, int32_t* reg_seedcov, int32_t* reg_chain,
    // job outputs (cap = total seeds)
    int32_t* l_reg, int32_t* l_row, int32_t* l_qlen, int64_t* l_tstart,
    int32_t* l_tlen, int64_t* n_left_out,
    int32_t* r_reg, int32_t* r_row, int32_t* r_qstart, int32_t* r_qlen,
    int64_t* r_tstart, int32_t* r_tlen, int64_t* n_right_out) {
  ExtOpts o{a, o_del, e_del, o_ins, e_ins, band_w};
  int64_t g = 0, nl = 0, nr = 0;
  std::vector<int64_t> srt;
  for (int32_t r = 0; r < R; ++r) {
    int32_t lq = l_query[r];
    for (int64_t c = chain_off[r]; c < chain_off[r + 1]; ++c) {
      int64_t s0 = seed_off[c], s1 = seed_off[c + 1];
      int64_t ns = s1 - s0;
      if (ns <= 0) continue;
      // reference window (reference: src/bwamem.cpp:2649-2680)
      int64_t rmax0 = l_pac << 1, rmax1 = 0;
      for (int64_t s = s0; s < s1; ++s) {
        int64_t b = seed_rbeg[s] -
                    (seed_qbeg[s] + cal_max_gap_x(o, seed_qbeg[s]));
        int64_t tail = lq - seed_qbeg[s] - seed_len[s];
        int64_t e = seed_rbeg[s] + seed_len[s] + tail +
                    cal_max_gap_x(o, tail);
        if (b < rmax0) rmax0 = b;
        if (e > rmax1) rmax1 = e;
      }
      if (rmax0 < 0) rmax0 = 0;
      if (rmax1 > (l_pac << 1)) rmax1 = l_pac << 1;
      if (rmax0 < l_pac && l_pac < rmax1) {
        if (seed_rbeg[s0] < l_pac) rmax1 = l_pac;
        else rmax0 = l_pac;
      }
      // clamp to the contig holding the first seed, on its strand
      {
        int64_t mid = seed_rbeg[s0];
        int64_t pos_f = mid;
        bool is_rev = pos_f >= l_pac;
        if (is_rev) pos_f = (l_pac << 1) - 1 - pos_f;
        int32_t rid = pos2rid_x(ctg_off, n_contigs, l_pac, pos_f);
        int64_t far_beg = ctg_off[rid];
        int64_t far_end = rid + 1 < n_contigs ? ctg_off[rid + 1] : l_pac;
        if (is_rev) {
          int64_t t0 = (l_pac << 1) - far_end;
          int64_t t1 = (l_pac << 1) - far_beg;
          far_beg = t0;
          far_end = t1;
        }
        if (rmax0 < far_beg) rmax0 = far_beg;
        if (rmax1 > far_end) rmax1 = far_end;
      }
      seed_srt(seed_len + s0, ns, srt);
      for (int64_t k = ns - 1; k >= 0; --k) {
        int64_t s = s0 + srt[k];
        reg_read[g] = r;
        reg_chain[g] = (int32_t)c;
        reg_score[g] = -1;
        reg_truesc[g] = -1;
        reg_w[g] = band_w;
        reg_rid[g] = chain_rid[c];
        reg_frac_rep[g] = chain_frac_rep[c];
        reg_seedlen0[g] = seed_len[s];
        reg_seedcov[g] = 0;
        reg_h0seed[g] = seed_len[s] * a;
        if (seed_qbeg[s]) {
          l_reg[nl] = (int32_t)g;
          l_row[nl] = r;
          l_qlen[nl] = seed_qbeg[s];
          l_tstart[nl] = rmax0;
          l_tlen[nl] = (int32_t)(seed_rbeg[s] - rmax0);
          ++nl;
          reg_qb[g] = seed_qbeg[s];
          reg_rb[g] = seed_rbeg[s];
        } else {
          reg_score[g] = reg_truesc[g] = seed_len[s] * a;
          reg_qb[g] = 0;
          reg_rb[g] = seed_rbeg[s];
        }
        if (seed_qbeg[s] + seed_len[s] != lq) {
          int32_t qe = seed_qbeg[s] + seed_len[s];
          r_reg[nr] = (int32_t)g;
          r_row[nr] = r;
          r_qstart[nr] = qe;
          r_qlen[nr] = lq - qe;
          r_tstart[nr] = seed_rbeg[s] + seed_len[s];
          r_tlen[nr] = (int32_t)(rmax1 - (seed_rbeg[s] + seed_len[s]));
          ++nr;
          reg_qe[g] = qe;
          reg_re[g] = seed_rbeg[s] + seed_len[s];
        } else {
          reg_qe[g] = lq;
          reg_re[g] = seed_rbeg[s] + seed_len[s];
          // seedcov for both-ends-anchored regs (left pending if any)
          if (!seed_qbeg[s]) {
            int64_t cov = 0;
            for (int64_t t = s0; t < s1; ++t) {
              if (seed_qbeg[t] >= reg_qb[g] &&
                  seed_qbeg[t] + seed_len[t] <= reg_qe[g] &&
                  seed_rbeg[t] >= reg_rb[g] &&
                  seed_rbeg[t] + seed_len[t] <= reg_re[g])
                cov += seed_len[t];
            }
            reg_seedcov[g] = (int32_t)cov;
          }
        }
        ++g;
      }
    }
  }
  *n_left_out = nl;
  *n_right_out = nr;
  return g;
}

void extend_finalize_c(
    int32_t R, const int32_t* l_query, const int32_t* read_reg_off,
    const int32_t* reg_read,
    const int64_t* chain_off, const int64_t* seed_off,
    const int64_t* seed_rbeg, const int32_t* seed_qbeg,
    const int32_t* seed_len,
    int32_t a, int32_t o_del, int32_t e_del, int32_t o_ins, int32_t e_ins,
    int32_t band_w, int32_t pen_clip5, int32_t pen_clip3,
    int64_t n_regs, int32_t* reg_qb, int64_t* reg_rb, int32_t* reg_qe,
    int64_t* reg_re, int32_t* reg_score, int32_t* reg_truesc, int32_t* reg_w,
    const int32_t* reg_seedlen0, int32_t* reg_seedcov,
    const int32_t* reg_chain, const int32_t* reg_h0seed,
    int64_t n_left, const int32_t* l_reg, const int32_t* l_score,
    const int32_t* l_qle, const int32_t* l_tle, const int32_t* l_gtle,
    const int32_t* l_gscore, const int32_t* l_wused,
    int64_t n_right, const int32_t* r_reg, const int32_t* r_score,
    const int32_t* r_qle, const int32_t* r_tle, const int32_t* r_gtle,
    const int32_t* r_gscore, const int32_t* r_wused) {
  ExtOpts o{a, o_del, e_del, o_ins, e_ins, band_w};

  auto seedcov = [&](int64_t g) {
    int64_t c = reg_chain[g];
    int64_t s0 = seed_off[c], s1 = seed_off[c + 1];
    int64_t cov = 0;
    for (int64_t t = s0; t < s1; ++t) {
      if (seed_qbeg[t] >= reg_qb[g] &&
          seed_qbeg[t] + seed_len[t] <= reg_qe[g] &&
          seed_rbeg[t] >= reg_rb[g] &&
          seed_rbeg[t] + seed_len[t] <= reg_re[g])
        cov += seed_len[t];
    }
    reg_seedcov[g] = (int32_t)cov;
  };

  // ---- fold left results (reference: src/bwamem.cpp:3040-3160) ----
  for (int64_t i = 0; i < n_left; ++i) {
    int64_t g = l_reg[i];
    reg_score[g] = l_score[i];
    int32_t gsc = l_gscore[i];
    if (gsc <= 0 || gsc <= reg_score[g] - pen_clip5) {
      reg_qb[g] -= l_qle[i];
      reg_rb[g] -= l_tle[i];
      reg_truesc[g] = reg_score[g];
    } else {
      reg_qb[g] = 0;
      reg_rb[g] -= l_gtle[i];
      reg_truesc[g] = gsc;
    }
    if (l_wused[i] > reg_w[g]) reg_w[g] = l_wused[i];
    seedcov(g);  // complete only when this reg had no right job; harmless
                 // otherwise (recomputed after the right fold)
  }
  // drop the premature seedcov of regs that still extend right: match the
  // python contract exactly by recomputing below; the extra compute is tiny
  for (int64_t i = 0; i < n_right; ++i) {
    int64_t g = r_reg[i];
    int32_t h0r = reg_score[g] != -1 ? reg_score[g] : reg_h0seed[g];
    reg_score[g] = r_score[i];
    int32_t gsc = r_gscore[i];
    if (gsc <= 0 || gsc <= reg_score[g] - pen_clip3) {
      reg_qe[g] += r_qle[i];
      reg_re[g] += r_tle[i];
      reg_truesc[g] += reg_score[g] - h0r;
    } else {
      reg_qe[g] = l_query[reg_read[g]];
      reg_re[g] += r_gtle[i];
      reg_truesc[g] += gsc - h0r;
    }
    if (r_wused[i] > reg_w[g]) reg_w[g] = r_wused[i];
    seedcov(g);
  }

  // ---- contained-seed purge (reference: src/bwamem.cpp:3390-3489) ----
  std::vector<int64_t> srt;
  std::vector<char> purged;
  for (int32_t r = 0; r < R; ++r) {
    int64_t av0 = read_reg_off[r], av1 = read_reg_off[r + 1];
    int32_t lq = l_query[r];
    int64_t lim = 0;
    int64_t base = av0;
    for (int64_t c = chain_off[r]; c < chain_off[r + 1]; ++c) {
      int64_t s0 = seed_off[c], s1 = seed_off[c + 1];
      int64_t ns = s1 - s0;
      if (ns <= 0) continue;
      seed_srt(seed_len + s0, ns, srt);
      purged.assign(ns, 0);
      for (int64_t k = ns - 1; k >= 0; --k) {
        int64_t s = s0 + srt[k];
        int64_t aln = base + (ns - 1 - k);
        int64_t v = 0;
        bool found = false;
        for (int64_t p = av0; p < av1; ++p) {
          if (v >= lim) break;
          if (reg_qb[p] == -1 && reg_qe[p] == -1) continue;
          if (seed_rbeg[s] < reg_rb[p] ||
              seed_rbeg[s] + seed_len[s] > reg_re[p] ||
              seed_qbeg[s] < reg_qb[p] ||
              seed_qbeg[s] + seed_len[s] > reg_qe[p]) {
            ++v;
            continue;
          }
          if (seed_len[s] - reg_seedlen0[p] > 0.1 * lq) {
            ++v;
            continue;
          }
          {
            int64_t qd = seed_qbeg[s] - reg_qb[p];
            int64_t rd = seed_rbeg[s] - reg_rb[p];
            int32_t mg = cal_max_gap_x(o, qd < rd ? qd : rd);
            int32_t ww = mg < reg_w[p] ? mg : reg_w[p];
            if (qd - rd < ww && rd - qd < ww) { found = true; break; }
          }
          {
            int64_t qd = reg_qe[p] - (seed_qbeg[s] + seed_len[s]);
            int64_t rd = reg_re[p] - (seed_rbeg[s] + seed_len[s]);
            int32_t mg = cal_max_gap_x(o, qd < rd ? qd : rd);
            int32_t ww = mg < reg_w[p] ? mg : reg_w[p];
            if (qd - rd < ww && rd - qd < ww) { found = true; break; }
          }
          ++v;
        }
        if (found) {
          bool ok = true;
          for (int64_t v2 = k + 1; v2 < ns; ++v2) {
            if (purged[v2]) continue;
            int64_t t = s0 + srt[v2];
            if (seed_len[t] < seed_len[s] * 0.95) continue;
            if (seed_qbeg[s] <= seed_qbeg[t] &&
                seed_qbeg[s] + seed_len[s] - seed_qbeg[t] >=
                    seed_len[s] >> 2 &&
                seed_qbeg[t] - seed_qbeg[s] != seed_rbeg[t] - seed_rbeg[s]) {
              ok = false;
              break;
            }
            if (seed_qbeg[t] <= seed_qbeg[s] &&
                seed_qbeg[t] + seed_len[t] - seed_qbeg[s] >=
                    seed_len[s] >> 2 &&
                seed_qbeg[s] - seed_qbeg[t] != seed_rbeg[s] - seed_rbeg[t]) {
              ok = false;
              break;
            }
          }
          if (ok) {
            reg_qb[aln] = -1;
            reg_qe[aln] = -1;
            purged[k] = 1;
            continue;
          }
        }
        ++lim;
      }
      base += ns;
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Index-build helpers: linear passes that numpy runs 10-100x slower on the
// throttled build hosts (the analog of the reference's OpenMP key
// regeneration in get_key_of_ref, src/fastmap.cpp:537-612).

extern "C" {

// 32-base 2-bit keys (MSB-first uint64) of the suffixes at pos[i], read from
// the packed text words (16 bases/uint32, MSB-first). `words` must carry >=2
// guard words past the last text word (all-T fill), matching
// packing.extract_key64's layout.
void extract_key64_c(const uint32_t* words, const int64_t* pos, int64_t n,
                     uint64_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    int64_t p = pos[i];
    int64_t wi = p >> 4;
    uint32_t sh = (uint32_t)((p & 15) << 1);
    uint64_t hi64 = ((uint64_t)words[wi] << 32) | words[wi + 1];
    if (sh == 0) {
      out[i] = hi64;
    } else {
      out[i] = (hi64 << sh) | (words[wi + 2] >> (32 - sh));
    }
  }
}

// out[sa[i]] = i for every entry (inverse suffix array).
void invert_sa_c(const int64_t* sa, int64_t n, int64_t* out) {
  for (int64_t i = 0; i < n; ++i) out[sa[i]] = i;
}

// Copy the entries of `sa` that are < limit into `out` (stable order);
// returns the count. One pass instead of numpy's mask+fancy-index pair.
int64_t filter_lt_c(const int64_t* sa, int64_t n, int64_t limit,
                    int64_t* out) {
  int64_t k = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (sa[i] < limit) out[k++] = sa[i];
  }
  return k;
}

}  // extern "C"

extern "C" {

// Longest run lengths of code 0 (A) and code 3 (T) in one pass.
void longest_runs_c(const uint8_t* x, int64_t n, int64_t* out_a,
                    int64_t* out_t) {
  int64_t best_a = 0, best_t = 0, run_a = 0, run_t = 0;
  for (int64_t i = 0; i < n; ++i) {
    uint8_t v = x[i];
    run_a = (v == 0) ? run_a + 1 : 0;
    run_t = (v == 3) ? run_t + 1 : 0;
    if (run_a > best_a) best_a = run_a;
    if (run_t > best_t) best_t = run_t;
  }
  *out_a = best_a;
  *out_t = best_t;
}

}  // extern "C"

extern "C" {

// P-RMI training (models/prmi.py's exact semantics) in two passes over the
// sorted keys: pass 1 accumulates per-leaf least-squares moments (keys are
// sorted, so leaves are contiguous segments); pass 2 re-evaluates the f32
// leaf models the way the device does and takes per-leaf residual maxima.
// Compile with -ffp-contract=off so the f32 predict matches numpy's
// two-rounding (mul then add) — the margin only has to absorb the DEVICE's
// fma drift, not the trainer's.
void train_prmi_c(const uint32_t* key_hi, const uint32_t* key_lo, int64_t n,
                  int32_t bits, int32_t margin,
                  int64_t* leaf_start,   // [L+1]
                  float* alpha, float* beta,  // [L]
                  int32_t* err_lo, int32_t* err_hi) {  // [L]
  const int64_t L = (int64_t)1 << bits;
  const uint32_t shift = (uint32_t)(32 - bits);
  const uint32_t mask =
      bits < 32 ? (uint32_t)(((uint64_t)1 << (32 - bits)) - 1) : 0u;

  // pass 1: leaf boundaries + per-leaf moments
  std::vector<double> s1(L, 0.0), sx(L, 0.0), sy(L, 0.0), sxx(L, 0.0),
      sxy(L, 0.0);
  {
    int64_t prev = -1;
    int64_t seg_start = 0;
    for (int64_t i = 0; i < n; ++i) {
      int64_t leaf = (int64_t)(key_hi[i] >> shift);
      if (leaf != prev) {
        for (int64_t l = prev + 1; l <= leaf; ++l) leaf_start[l] = i;
        prev = leaf;
        seg_start = i;
      }
      double rel =
          (double)(key_hi[i] & mask) * 4294967296.0 + (double)key_lo[i];
      double y = (double)(i - seg_start);
      s1[leaf] += 1.0;
      sx[leaf] += rel;
      sy[leaf] += y;
      sxx[leaf] += rel * rel;
      sxy[leaf] += rel * y;
    }
    for (int64_t l = prev + 1; l <= L; ++l) leaf_start[l] = n;
  }
  for (int64_t l = 0; l < L; ++l) {
    double c = s1[l] > 1.0 ? s1[l] : 1.0;
    double var = sxx[l] - sx[l] * sx[l] / c;
    double cov = sxy[l] - sx[l] * sy[l] / c;
    double b = var > 0.0 ? cov / (var > 1e-300 ? var : 1e-300) : 0.0;
    if (b < 0.0 || b != b || b > 1e300) b = 0.0;  // monotone + finite
    double a = s1[l] > 0.0 ? (sy[l] - b * sx[l]) / c : 0.0;
    if (a != a || a > 1e300 || a < -1e300) a = 0.0;
    alpha[l] = (float)a;
    beta[l] = (float)b;
    err_lo[l] = 0;
    err_hi[l] = 0;
  }

  // pass 2: guaranteed error windows under the device's f32 arithmetic
  std::vector<int64_t> over(L, 0), under(L, 0);
  for (int64_t i = 0; i < n; ++i) {
    int64_t leaf = (int64_t)(key_hi[i] >> shift);
    float rel32 =
        (float)(key_hi[i] & mask) * 4294967296.0f + (float)key_lo[i];
    float predf = alpha[leaf] + beta[leaf] * rel32;
    float cnt = (float)(leaf_start[leaf + 1] - leaf_start[leaf]);
    if (!(predf > 0.0f)) predf = 0.0f;  // NaN -> 0, matching np.clip
    if (predf > cnt) predf = cnt;
    int64_t pred_i = leaf_start[leaf] + (int64_t)predf;
    int64_t o = pred_i - i, u = i - pred_i;
    if (o > over[leaf]) over[leaf] = o;
    if (u > under[leaf]) under[leaf] = u;
  }
  for (int64_t l = 0; l < L; ++l) {
    int64_t elo = (over[l] > 0 ? over[l] : 0) + margin;
    int64_t ehi = (under[l] > 0 ? under[l] : 0) + 1 + margin;
    err_lo[l] = (int32_t)(elo > 0x7FFFFFFF ? 0x7FFFFFFF : elo);
    err_hi[l] = (int32_t)(ehi > 0x7FFFFFFF ? 0x7FFFFFFF : ehi);
  }
}

}  // extern "C"
