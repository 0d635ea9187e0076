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
// regeneration in get_key_of_ref, src/fastmap.cpp:537-612). All passes are
// threaded (BWAMEME_BUILD_THREADS, default = hardware concurrency) the way
// the reference threads its build (src/Learnedindex.cpp:301 `#pragma omp`,
// README.md:69-71 "~1 h with >=8 threads"); every parallel decomposition
// preserves the serial pass's exact arithmetic order within each output
// element, so results are bit-identical at any thread count.

#include <cstdlib>
#include <thread>

namespace bld {

inline int nthreads() {
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
  int nt = nthreads();
  if (nt <= 1 || n < (int64_t)nt * 4096) {
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

}  // namespace bld

extern "C" {

// 32-base 2-bit keys (MSB-first uint64) of the suffixes at pos[i], read from
// the packed text words (16 bases/uint32, MSB-first). `words` must carry >=2
// guard words past the last text word (all-T fill), matching
// packing.extract_key64's layout.
void extract_key64_c(const uint32_t* words, const int64_t* pos, int64_t n,
                     uint64_t* out) {
  bld::parallel_chunks(n, [&](int, int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
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
  });
}

// out[sa[i]] = i for every entry (inverse suffix array). sa is a
// permutation, so parallel scatter writes touch disjoint slots.
void invert_sa_c(const int64_t* sa, int64_t n, int64_t* out) {
  bld::parallel_chunks(n, [&](int, int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) out[sa[i]] = i;
  });
}

// Copy the entries of `sa` that are < limit into `out` (stable order);
// returns the count. Count-scan-write: per-chunk counts, exclusive scan,
// then each chunk writes its own output range (stable by construction).
int64_t filter_lt_c(const int64_t* sa, int64_t n, int64_t limit,
                    int64_t* out) {
  int nt = bld::nthreads();
  if (nt <= 1 || n < (int64_t)nt * 4096) {
    int64_t k = 0;
    for (int64_t i = 0; i < n; ++i) {
      if (sa[i] < limit) out[k++] = sa[i];
    }
    return k;
  }
  std::vector<int64_t> cnt(nt + 1, 0);
  bld::parallel_chunks(n, [&](int t, int64_t b, int64_t e) {
    int64_t k = 0;
    for (int64_t i = b; i < e; ++i) k += (sa[i] < limit);
    cnt[t + 1] = k;
  });
  for (int t = 0; t < nt; ++t) cnt[t + 1] += cnt[t];
  bld::parallel_chunks(n, [&](int t, int64_t b, int64_t e) {
    int64_t k = cnt[t];
    for (int64_t i = b; i < e; ++i) {
      if (sa[i] < limit) out[k++] = sa[i];
    }
  });
  return cnt[nt];
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

  // leaf boundaries: keys are sorted, so leaf_start[l] = lower_bound of l
  // over key_hi >> shift — independent binary searches, threaded over
  // leaves (identical to the serial scan's boundary fills).
  leaf_start[L] = n;
  bld::parallel_chunks(L, [&](int, int64_t lb, int64_t le) {
    for (int64_t l = lb; l < le; ++l) {
      int64_t lo = 0, hi = n;
      while (lo < hi) {
        int64_t mid = (lo + hi) >> 1;
        if ((int64_t)(key_hi[mid] >> shift) < l) {
          lo = mid + 1;
        } else {
          hi = mid;
        }
      }
      leaf_start[l] = lo;
    }
  });

  // pass 1 + fit + pass 2, threaded over leaves: each leaf is a contiguous
  // key segment, and within a leaf the accumulation order is the serial
  // pass's order — bit-identical results at any thread count.
  bld::parallel_chunks(L, [&](int, int64_t lb, int64_t le) {
    for (int64_t l = lb; l < le; ++l) {
      const int64_t s = leaf_start[l], e = leaf_start[l + 1];
      double s1 = 0.0, sx = 0.0, sy = 0.0, sxx = 0.0, sxy = 0.0;
      for (int64_t i = s; i < e; ++i) {
        double rel =
            (double)(key_hi[i] & mask) * 4294967296.0 + (double)key_lo[i];
        double y = (double)(i - s);
        s1 += 1.0;
        sx += rel;
        sy += y;
        sxx += rel * rel;
        sxy += rel * y;
      }
      double c = s1 > 1.0 ? s1 : 1.0;
      double var = sxx - sx * sx / c;
      double cov = sxy - sx * sy / c;
      double b = var > 0.0 ? cov / (var > 1e-300 ? var : 1e-300) : 0.0;
      if (b < 0.0 || b != b || b > 1e300) b = 0.0;  // monotone + finite
      double a = s1 > 0.0 ? (sy - b * sx) / c : 0.0;
      if (a != a || a > 1e300 || a < -1e300) a = 0.0;
      alpha[l] = (float)a;
      beta[l] = (float)b;

      // error window under the device's f32 arithmetic
      int64_t over = 0, under = 0;
      const float cnt = (float)(e - s);
      for (int64_t i = s; i < e; ++i) {
        float rel32 =
            (float)(key_hi[i] & mask) * 4294967296.0f + (float)key_lo[i];
        float predf = alpha[l] + beta[l] * rel32;
        if (!(predf > 0.0f)) predf = 0.0f;  // NaN -> 0, matching np.clip
        if (predf > cnt) predf = cnt;
        int64_t pred_i = s + (int64_t)predf;
        int64_t o = pred_i - i, u = i - pred_i;
        if (o > over) over = o;
        if (u > under) under = u;
      }
      int64_t elo = over + margin;
      int64_t ehi = under + 1 + margin;
      err_lo[l] = (int32_t)(elo > 0x7FFFFFFF ? 0x7FFFFFFF : elo);
      err_hi[l] = (int32_t)(ehi > 0x7FFFFFFF ? 0x7FFFFFFF : ehi);
    }
  });
}

}  // extern "C"

// ===========================================================================
// Native single-end finalization: the whole per-read kernel-3 loop —
// mem_sort_dedup_patch + mem_mark_primary_se + mem_approx_mapq_se +
// mem_reorder_primary5 + mem_gen_alt (XA) + mem_reg2aln (CIGAR/NM/MD) +
// mem_aln2sam — as one batch call emitting finished SAM text.
//
// Bit/byte-identical port of align/finalize.py + align/alt.py (which remain
// the documented contracts; reference provenance src/bwamem.cpp:194-2313,
// src/bwamem_extra.cpp:122-183, src/bwa.cpp bwa_gen_cigar2). Every float
// expression replicates the Python operation order in double precision and
// int(x) truncation.

#include <cmath>
#include <string>

namespace fin {

struct Reg {
  int64_t rb, re;
  int32_t qb, qe, rid, score, truesc, sub, csub, sub_n, alt_sc, w, seedcov;
  int32_t secondary, secondary_all, n_comp;
  uint64_t hash;
  double frac_rep;
  bool is_alt;
};

struct Opts {
  const int8_t* mat;
  int64_t o_del, e_del, o_ins, e_ins, a, b, T, w, max_chain_gap,
      min_seed_len, flag, max_XA_hits, max_XA_hits_alt, mapQ_coef_fac,
      extra_flag;
  double mask_level, mask_level_redun, drop_ratio, XA_drop_ratio,
      mapQ_coef_len;
};

struct Ref {
  const uint8_t* text;
  int64_t l_pac;
  int32_t n_ctg;
  const int64_t* ctg_off;            // n_ctg contig start offsets
  const char* ctg_names;
  const int64_t* ctg_name_off;       // n_ctg+1
  const uint8_t* ctg_is_alt;
};

constexpr int32_t kIntMax = 0x7FFFFFFF;
constexpr double kPatchMaxRBw = 0.05;
constexpr double kPatchMinScRatio = 0.90;

inline uint64_t hash_64(uint64_t key) {
  key = key + ~(key << 32);
  key ^= key >> 22;
  key = key + ~(key << 13);
  key ^= key >> 8;
  key = key + (key << 3);
  key ^= key >> 15;
  key = key + ~(key << 27);
  key ^= key >> 31;
  return key;
}

inline int32_t infer_bw(int64_t l1, int64_t l2, int64_t score, int64_t a,
                        int64_t q, int64_t r) {
  if (l1 == l2 && l1 * a - score < ((q + r - a) << 1)) return 0;
  int64_t w = (int64_t)((double)((l1 < l2 ? l1 : l2) * a - score - q) /
                            (double)r + 2.0);
  int64_t d = l1 > l2 ? l1 - l2 : l2 - l1;
  return (int32_t)(w > d ? w : d);
}

struct CigRes {
  int32_t score = 0;
  bool has = false;            // cigar computed (None in Python otherwise)
  std::vector<uint32_t> cig;   // len<<4 | op (0=M 1=I 2=D 3=S)
  int32_t NM = -1;
  std::string md;
};

// bwa_gen_cigar2 (finalize.py:gen_cigar). need_md=false skips the NM/MD walk
// (mem_patch_reg only needs the score).
static CigRes gen_cigar(const Opts& o, const Ref& ref, int32_t w,
                        const uint8_t* query, int32_t l_query, int64_t rb,
                        int64_t re, bool need_md) {
  CigRes out;
  if (l_query <= 0 || rb >= re || (rb < ref.l_pac && re > ref.l_pac))
    return out;
  int32_t rlen = (int32_t)(re - rb);
  std::vector<uint8_t> rseq(ref.text + rb, ref.text + re);
  std::vector<uint8_t> q(query, query + l_query);
  if (rb >= ref.l_pac) {
    std::reverse(q.begin(), q.end());
    std::reverse(rseq.begin(), rseq.end());
  }
  out.has = true;
  if (l_query == rlen && w == 0) {
    out.cig.push_back(((uint32_t)l_query << 4) | 0);
    int64_t sc = 0;
    for (int32_t j = 0; j < l_query; ++j)
      sc += o.mat[(rseq[j] > 4 ? 4 : rseq[j]) * 5 + (q[j] > 4 ? 4 : q[j])];
    out.score = (int32_t)sc;
  } else {
    int64_t a = o.mat[0];
    int32_t max_ins = (int32_t)((double)(((l_query + 1) >> 1) * a - o.o_ins) /
                                    (double)o.e_ins + 1.0);
    int32_t max_del = (int32_t)((double)(((l_query + 1) >> 1) * a - o.o_del) /
                                    (double)o.e_del + 1.0);
    int32_t max_gap = max_ins > max_del ? max_ins : max_del;
    if (max_gap < 1) max_gap = 1;
    int32_t ww = (max_gap + (rlen > l_query ? rlen - l_query
                                            : l_query - rlen) + 1) >> 1;
    if (ww > w) ww = w;
    int32_t min_w = (rlen > l_query ? rlen - l_query : l_query - rlen) + 3;
    if (ww < min_w) ww = min_w;
    // clamp query/ref codes to 0..4 for the DP (matches the python wrapper)
    for (auto& c : q) if (c > 4) c = 4;
    std::vector<uint8_t> rc(rseq);
    for (auto& c : rc) if (c > 4) c = 4;
    int32_t cap = l_query + rlen + 4;
    for (;;) {
      out.cig.resize(cap);
      int32_t n = 0;
      int32_t sc = sw_global_c(q.data(), l_query, rc.data(), rlen, o.mat,
                               (int32_t)o.o_del, (int32_t)o.e_del,
                               (int32_t)o.o_ins, (int32_t)o.e_ins, ww,
                               out.cig.data(), cap, &n);
      if (sc == NEG_INF) { cap *= 2; continue; }
      out.score = sc;
      out.cig.resize(n);
      break;
    }
  }
  if (!need_md) return out;
  // NM / MD over the (possibly reversed) q/rseq, raw codes
  const char* int2base = rb < ref.l_pac ? "ACGTN" : "TGCAN";
  std::string md;
  int32_t x = 0, y = 0, u = 0;
  int64_t n_mm = 0, n_gap = 0;
  const size_t nc = out.cig.size();
  char tmp[24];
  for (size_t k = 0; k < nc; ++k) {
    int32_t op = out.cig[k] & 0xF;
    int32_t ln = (int32_t)(out.cig[k] >> 4);
    if (op == 0) {
      int32_t prev = -1;
      for (int32_t i = 0; i < ln; ++i) {
        if (q[x + i] != rseq[y + i]) {
          md.append(tmp, snprintf(tmp, sizeof tmp, "%d", u + i - prev - 1));
          uint8_t rc = rseq[y + i];
          md.push_back(int2base[rc > 4 ? 4 : rc]);
          u = 0;
          prev = i;
          ++n_mm;
        }
      }
      u += ln - 1 - prev;
      x += ln;
      y += ln;
    } else if (op == 2) {
      if (k > 0 && k + 1 < nc) {
        md.append(tmp, snprintf(tmp, sizeof tmp, "%d", u));
        md.push_back('^');
        for (int32_t i = 0; i < ln; ++i) {
          uint8_t rc = rseq[y + i];
          md.push_back(int2base[rc > 4 ? 4 : rc]);
        }
        u = 0;
        n_gap += ln;
      }
      y += ln;
    } else if (op == 1) {
      x += ln;
      n_gap += ln;
    }
  }
  md.append(tmp, snprintf(tmp, sizeof tmp, "%d", u));
  out.NM = (int32_t)(n_mm + n_gap);
  out.md = std::move(md);
  return out;
}

// mem_patch_reg (finalize.py:127). Returns patched score (0 = no patch) and
// the patch band width.
static void patch_reg(const Opts& o, const Ref& ref, const uint8_t* query,
                      const Reg& a, const Reg& b, int32_t* score_out,
                      int32_t* w_out) {
  *score_out = 0;
  *w_out = 0;
  if (a.rb < ref.l_pac && ref.l_pac <= b.rb) return;
  if (a.qb >= b.qb || a.qe >= b.qe || a.re >= b.re) return;
  int64_t w64 = (a.re - b.rb) - (int64_t)(a.qe - b.qb);
  if (w64 < 0) w64 = -w64;
  double r = (double)(a.re - b.rb) / (double)(b.re - a.rb) -
             (double)(a.qe - b.qb) / (double)(b.qe - a.qb);
  if (r < 0) r = -r;
  if (a.re < b.rb || a.qe < b.qb) {
    if (w64 > (o.w << 1) || r >= kPatchMaxRBw) return;
  } else if (w64 > (o.w << 2) || r >= kPatchMaxRBw * 2) {
    return;
  }
  w64 += a.w + b.w;
  if (w64 > (o.w << 2)) w64 = o.w << 2;
  CigRes g = gen_cigar(o, ref, (int32_t)w64, query + a.qb,
                       (int32_t)(b.qe - a.qb), a.rb, b.re, false);
  if (!g.has) return;
  int32_t q_s = (int32_t)((double)(b.qe - a.qb) /
                              ((double)(b.qe - b.qb) + (double)(a.qe - a.qb)) *
                              (double)(b.score + a.score) + 0.499);
  int32_t r_s = (int32_t)((double)(b.re - a.rb) /
                              ((double)(b.re - b.rb) + (double)(a.re - a.rb)) *
                              (double)(b.score + a.score) + 0.499);
  int32_t m = q_s > r_s ? q_s : r_s;
  if ((double)g.score / (double)m < kPatchMinScRatio) return;
  *score_out = g.score;
  *w_out = (int32_t)w64;
}

// mem_sort_dedup_patch (finalize.py:155).
static void sort_dedup_patch(const Opts& o, const Ref& ref,
                             const uint8_t* query, std::vector<Reg>& regs) {
  if (regs.size() <= 1) return;
  std::stable_sort(regs.begin(), regs.end(),
                   [](const Reg& x, const Reg& y) { return x.re < y.re; });
  for (auto& r : regs) r.n_comp = 1;
  const int64_t n = (int64_t)regs.size();
  for (int64_t i = 1; i < n; ++i) {
    Reg& p = regs[i];
    if (p.rid != regs[i - 1].rid ||
        p.rb >= regs[i - 1].re + o.max_chain_gap)
      continue;
    int64_t j = i - 1;
    while (j >= 0 && p.rid == regs[j].rid &&
           p.rb < regs[j].re + o.max_chain_gap) {
      Reg& q = regs[j];
      --j;
      if (q.qe == q.qb) continue;
      int64_t or_ = q.re - p.rb;
      int64_t oq = q.qb < p.qb ? q.qe - p.qb : p.qe - q.qb;
      int64_t mr = std::min(q.re - q.rb, p.re - p.rb);
      int64_t mq = std::min((int64_t)(q.qe - q.qb), (int64_t)(p.qe - p.qb));
      if ((double)or_ > o.mask_level_redun * (double)mr &&
          (double)oq > o.mask_level_redun * (double)mq) {
        if (p.score < q.score) {
          p.qe = p.qb;
          break;
        } else {
          q.qe = q.qb;
        }
      } else if (q.rb < p.rb) {
        int32_t sc, w;
        patch_reg(o, ref, query, q, p, &sc, &w);
        if (sc > 0) {
          p.n_comp += q.n_comp + 1;
          p.seedcov = std::max(p.seedcov, q.seedcov);
          p.sub = std::max(p.sub, q.sub);
          p.csub = std::max(p.csub, q.csub);
          p.qb = q.qb;
          p.rb = q.rb;
          p.truesc = p.score = sc;
          p.w = w;
          q.qb = q.qe;
        }
      }
    }
  }
  std::vector<Reg> kept;
  kept.reserve(regs.size());
  for (auto& r : regs)
    if (r.qe > r.qb) kept.push_back(r);
  std::stable_sort(kept.begin(), kept.end(),
                   [](const Reg& x, const Reg& y) {
                     if (x.score != y.score) return x.score > y.score;
                     if (x.rb != y.rb) return x.rb < y.rb;
                     return x.qb < y.qb;
                   });
  for (size_t i = 1; i < kept.size(); ++i)
    if (kept[i].score == kept[i - 1].score && kept[i].rb == kept[i - 1].rb &&
        kept[i].qb == kept[i - 1].qb)
      kept[i].qe = kept[i].qb;
  regs.clear();
  for (size_t i = 0; i < kept.size(); ++i)
    if (i == 0 || kept[i].qe > kept[i].qb) regs.push_back(kept[i]);
}

// mem_mark_primary_se_core (finalize.py:207).
static void mark_primary_core(const Opts& o, std::vector<Reg>& a, size_t n) {
  int64_t tmp = std::max({o.a + o.b, o.o_del + o.e_del, o.o_ins + o.e_ins});
  std::vector<size_t> z;
  z.push_back(0);
  for (size_t i = 1; i < n; ++i) {
    int64_t hit = -1;
    for (size_t ki = 0; ki < z.size(); ++ki) {
      size_t k = z[ki];
      int32_t b_max = std::max(a[k].qb, a[i].qb);
      int32_t e_min = std::min(a[k].qe, a[i].qe);
      if (e_min > b_max) {
        int32_t min_l = std::min(a[i].qe - a[i].qb, a[k].qe - a[k].qb);
        if ((double)(e_min - b_max) >= (double)min_l * o.mask_level) {
          if (a[k].sub == 0) a[k].sub = a[i].score;
          if (a[k].score - a[i].score <= tmp &&
              (a[k].is_alt || !a[i].is_alt))
            a[k].sub_n += 1;
          hit = (int64_t)k;
          break;
        }
      }
    }
    if (hit < 0)
      z.push_back(i);
    else
      a[i].secondary = (int32_t)hit;
  }
}

// mem_mark_primary_se (finalize.py:230); reorders regs in place.
static void mark_primary(const Opts& o, std::vector<Reg>& regs,
                         int64_t rid_counter) {
  size_t n = regs.size();
  if (n == 0) return;
  size_t n_pri = 0;
  for (size_t i = 0; i < n; ++i) {
    Reg& r = regs[i];
    r.sub = 0;
    r.alt_sc = 0;
    r.secondary = -1;
    r.secondary_all = -1;
    r.hash = hash_64((uint64_t)(rid_counter + (int64_t)i));
    if (!r.is_alt) ++n_pri;
  }
  std::stable_sort(regs.begin(), regs.end(),
                   [](const Reg& x, const Reg& y) {
                     if (x.score != y.score) return x.score > y.score;
                     if (x.is_alt != y.is_alt) return !x.is_alt;
                     return x.hash < y.hash;
                   });
  mark_primary_core(o, regs, n);
  for (size_t i = 0; i < n; ++i) {
    Reg& p = regs[i];
    p.secondary_all = (int32_t)i;
    if (!p.is_alt && p.secondary >= 0 && regs[p.secondary].is_alt)
      p.alt_sc = regs[p.secondary].score;
  }
  if (n_pri < n) {
    if (n_pri > 0)
      std::stable_sort(regs.begin(), regs.end(),
                       [](const Reg& x, const Reg& y) {
                         if (x.is_alt != y.is_alt) return !x.is_alt;
                         if (x.score != y.score) return x.score > y.score;
                         return x.hash < y.hash;
                       });
    std::vector<int32_t> z(n);
    for (size_t i = 0; i < n; ++i) z[regs[i].secondary_all] = (int32_t)i;
    for (size_t i = 0; i < n; ++i) {
      if (regs[i].secondary >= 0) {
        regs[i].secondary_all = z[regs[i].secondary];
        if (regs[i].is_alt) regs[i].secondary = kIntMax;
      } else {
        regs[i].secondary_all = -1;
      }
    }
    if (n_pri > 0) {
      for (size_t i = 0; i < n_pri; ++i) {
        regs[i].sub = 0;
        regs[i].secondary = -1;
      }
      mark_primary_core(o, regs, n_pri);
    }
  } else {
    for (auto& r : regs) r.secondary_all = r.secondary;
  }
}

// mem_approx_mapq_se (finalize.py:275).
static int32_t approx_mapq(const Opts& o, const Reg& a) {
  int64_t sub = a.sub ? a.sub : o.min_seed_len * o.a;
  if (a.csub > sub) sub = a.csub;
  if (sub >= a.score) return 0;
  int64_t l = std::max((int64_t)(a.qe - a.qb), a.re - a.rb);
  double identity =
      1.0 - (double)(l * o.a - a.score) / (double)(o.a + o.b) / (double)l;
  int64_t mapq;
  if (a.score == 0) {
    mapq = 0;
  } else if (o.mapQ_coef_len > 0) {
    double tmp = (double)l < o.mapQ_coef_len
                     ? 1.0
                     : (double)o.mapQ_coef_fac / std::log((double)l);
    tmp *= identity * identity;
    mapq = (int64_t)(6.02 * (double)(a.score - sub) / (double)o.a * tmp *
                         tmp + 0.499);
  } else {
    mapq = (int64_t)(30.0 * (1.0 - (double)sub / (double)a.score) *
                         std::log((double)a.seedcov) + 0.499);
    if (identity < 0.95)
      mapq = (int64_t)((double)mapq * identity * identity + 0.499);
  }
  if (a.sub_n > 0)
    mapq -= (int64_t)(4.343 * std::log((double)a.sub_n + 1.0) + 0.499);
  if (mapq > 60) mapq = 60;
  if (mapq < 0) mapq = 0;
  mapq = (int64_t)((double)mapq * (1.0 - a.frac_rep) + 0.499);
  return (int32_t)mapq;
}

// mem_reorder_primary5 (finalize.py:301).
static void reorder_primary5(const Opts& o, std::vector<Reg>& a) {
  int64_t n_pri = 0;
  for (auto& p : a)
    if (p.secondary < 0 && !p.is_alt && p.score >= o.T) ++n_pri;
  if (n_pri <= 1) return;
  int32_t left_st = kIntMax;
  int64_t left_k = -1;
  for (size_t k = 0; k < a.size(); ++k) {
    const Reg& p = a[k];
    if (p.secondary >= 0 || p.is_alt || p.score < o.T) continue;
    if (p.qb < left_st) {
      left_st = p.qb;
      left_k = (int64_t)k;
    }
  }
  if (left_k == 0) return;
  std::swap(a[0], a[left_k]);
  for (size_t k = 1; k < a.size(); ++k) {
    Reg& p = a[k];
    if (p.secondary == 0)
      p.secondary = (int32_t)left_k;
    else if (p.secondary == (int32_t)left_k)
      p.secondary = 0;
    if (p.secondary_all == 0)
      p.secondary_all = (int32_t)left_k;
    else if (p.secondary_all == (int32_t)left_k)
      p.secondary_all = 0;
  }
}

struct Aln {
  int64_t pos = -1;
  int32_t rid = -1, flag = 0, mapq = 0, NM = -1, n_cigar = 0, score = -1,
          sub = -1, alt_sc = 0;
  bool is_rev = false, is_alt = false;
  std::vector<uint32_t> cigar;  // len<<4|op, op 0=M 1=I 2=D 3=S
  std::string md;
  std::string XA;
  bool has_XA = false;
};

inline int32_t pos2rid(const Ref& ref, int64_t pos) {
  if (pos >= ref.l_pac) return -1;
  // searchsorted(offsets, pos, 'right') - 1
  int32_t lo = 0, hi = ref.n_ctg;
  while (lo < hi) {
    int32_t mid = (lo + hi) >> 1;
    if (ref.ctg_off[mid] <= pos)
      lo = mid + 1;
    else
      hi = mid;
  }
  return lo - 1;
}

// mem_reg2aln (finalize.py:347).
static Aln reg2aln(const Opts& o, const Ref& ref, int32_t l_query,
                   const uint8_t* query, const Reg* ar) {
  Aln a;
  if (ar == nullptr || ar->rb < 0 || ar->re < 0) {
    a.rid = -1;
    a.pos = -1;
    a.flag |= 0x4;
    return a;
  }
  int32_t qb = ar->qb, qe = ar->qe;
  int64_t rb = ar->rb, re = ar->re;
  a.mapq = ar->secondary < 0 ? approx_mapq(o, *ar) : 0;
  if (ar->secondary >= 0) a.flag |= 0x100;
  int32_t w2 = std::max(
      infer_bw(qe - qb, re - rb, ar->truesc, o.a, o.o_del, o.e_del),
      infer_bw(qe - qb, re - rb, ar->truesc, o.a, o.o_ins, o.e_ins));
  if (w2 > o.w) w2 = std::min((int64_t)w2, (int64_t)ar->w);
  int32_t last_sc = -(1 << 30);
  int32_t i = 0;
  CigRes g;
  for (;;) {
    if (w2 > (o.w << 2)) w2 = (int32_t)(o.w << 2);
    g = gen_cigar(o, ref, w2, query + qb, qe - qb, rb, re, true);
    if (g.score == last_sc || w2 == (o.w << 2)) break;
    last_sc = g.score;
    w2 <<= 1;
    ++i;
    if (!(i < 3 && g.score < ar->truesc - o.a)) break;
  }
  a.NM = g.NM;
  a.md = std::move(g.md);
  int64_t dp = rb < ref.l_pac ? rb : re - 1;
  bool is_rev = dp >= ref.l_pac;
  int64_t pos = is_rev ? (ref.l_pac << 1) - 1 - dp : dp;
  a.is_rev = is_rev;
  std::vector<uint32_t> cig;
  if (g.has) cig = std::move(g.cig);
  if (!cig.empty()) {
    if ((cig.front() & 0xF) == 2) {
      pos += cig.front() >> 4;
      cig.erase(cig.begin());
    } else if ((cig.back() & 0xF) == 2) {
      cig.pop_back();
    }
  }
  if (qb != 0 || qe != l_query) {
    int32_t clip5 = a.is_rev ? l_query - qe : qb;
    int32_t clip3 = a.is_rev ? qb : l_query - qe;
    if (clip5) cig.insert(cig.begin(), ((uint32_t)clip5 << 4) | 3);
    if (clip3) cig.push_back(((uint32_t)clip3 << 4) | 3);
  }
  a.cigar = std::move(cig);
  a.n_cigar = (int32_t)a.cigar.size();
  a.rid = pos2rid(ref, pos);
  a.pos = pos - ref.ctg_off[a.rid];
  a.score = ar->score;
  a.sub = std::max(ar->sub, ar->csub);
  a.is_alt = ar->is_alt;
  a.alt_sc = ar->alt_sc;
  return a;
}

const char kOpChr[] = "MIDSH";
const char kOpChrXA[] = "MIDSHN";

static void cigar_str(const Opts& o, const Aln& p, int32_t which,
                      std::string& out) {
  if (!p.n_cigar) {
    out.push_back('*');
    return;
  }
  char tmp[24];
  for (uint32_t c : p.cigar) {
    int32_t op = c & 0xF;
    if (!(o.flag & 0x200 /*MEM_F_SOFTCLIP*/) && !p.is_alt &&
        (op == 3 || op == 4))
      op = which ? 4 : 3;
    out.append(tmp, snprintf(tmp, sizeof tmp, "%u", c >> 4));
    out.push_back(kOpChr[op]);
  }
}

inline int64_t get_rlen(const std::vector<uint32_t>& cig) {
  int64_t l = 0;
  for (uint32_t c : cig) {
    int32_t op = c & 0xF;
    if (op == 0 || op == 2) l += c >> 4;
  }
  return l;
}

// mem_aln2sam, SE specialization (finalize.py:426, m == None).
static void aln2sam_se(const Opts& o, const Ref& ref, const char* name,
                       int64_t name_len, const uint8_t* codes, int64_t l_seq,
                       const char* qual, int64_t qual_len, const char* comment,
                       int64_t comment_len, const char* rg_id, int32_t rg_len,
                       size_t n, const std::vector<Aln>& alns, size_t which,
                       std::string& out) {
  const Aln& p0 = alns[which];
  Aln p = p0;  // copy (python dataclasses.replace)
  if (p.rid < 0) p.flag |= 0x4;
  if (p.is_rev) p.flag |= 0x10;
  char tmp[48];
  out.append(name, name_len);
  out.push_back('\t');
  out.append(tmp, snprintf(tmp, sizeof tmp, "%d",
                           (p.flag & 0xFFFF) | ((p.flag & 0x10000) ? 0x100
                                                                  : 0)));
  out.push_back('\t');
  if (p.rid >= 0) {
    out.append(ref.ctg_names + ref.ctg_name_off[p.rid],
               ref.ctg_name_off[p.rid + 1] - ref.ctg_name_off[p.rid]);
    out.push_back('\t');
    out.append(tmp, snprintf(tmp, sizeof tmp, "%lld",
                             (long long)(p.pos + 1)));
    out.push_back('\t');
    out.append(tmp, snprintf(tmp, sizeof tmp, "%d", p.mapq));
    out.push_back('\t');
    cigar_str(o, p, (int32_t)which, out);
  } else {
    out.append("*\t0\t0\t*");
  }
  out.append("\t*\t0\t0\t");

  // SEQ / QUAL
  static const char kFwd[] = "ACGTN";
  static const char kRev[] = "TGCAN";
  if (p.flag & 0x100) {
    out.append("*\t*");
  } else {
    int64_t qb = 0, qe = l_seq;
    if (p.n_cigar && which && !(o.flag & 0x200) && !p.is_alt) {
      int32_t op0 = p.cigar.front() & 0xF;
      int32_t opn = p.cigar.back() & 0xF;
      if (op0 == 3 || op0 == 4) {
        if (p.is_rev)
          qe -= p.cigar.front() >> 4;
        else
          qb += p.cigar.front() >> 4;
      }
      if (opn == 3 || opn == 4) {
        if (p.is_rev)
          qb += p.cigar.back() >> 4;
        else
          qe -= p.cigar.back() >> 4;
      }
    }
    if (qe > qb) {
      if (!p.is_rev) {
        for (int64_t i = qb; i < qe; ++i)
          out.push_back(kFwd[codes[i] > 4 ? 4 : codes[i]]);
        out.push_back('\t');
        if (qual_len)
          out.append(qual + qb, qe - qb);
        else
          out.push_back('*');
      } else {
        for (int64_t i = qe - 1; i >= qb; --i)
          out.push_back(kRev[codes[i] > 4 ? 4 : codes[i]]);
        out.push_back('\t');
        if (qual_len) {
          for (int64_t i = qe - 1; i >= qb; --i) out.push_back(qual[i]);
        } else {
          out.push_back('*');
        }
      }
    } else {
      out.append("*\t*");
    }
  }

  if (p.n_cigar) {
    out.append(tmp, snprintf(tmp, sizeof tmp, "\tNM:i:%d", p.NM));
    out.append("\tMD:Z:");
    out.append(p.md);
  }
  if (p.score >= 0)
    out.append(tmp, snprintf(tmp, sizeof tmp, "\tAS:i:%d", p.score));
  if (p.sub >= 0)
    out.append(tmp, snprintf(tmp, sizeof tmp, "\tXS:i:%d", p.sub));
  if (rg_len) {
    out.append("\tRG:Z:");
    out.append(rg_id, rg_len);
  }
  if (!(p.flag & 0x100)) {
    bool any = false;
    for (size_t i = 0; i < n; ++i)
      if (i != which && !(alns[i].flag & 0x100)) { any = true; break; }
    if (any) {
      out.append("\tSA:Z:");
      for (size_t i = 0; i < n; ++i) {
        const Aln& r = alns[i];
        if (i == which || (r.flag & 0x100)) continue;
        out.append(ref.ctg_names + ref.ctg_name_off[r.rid],
                   ref.ctg_name_off[r.rid + 1] - ref.ctg_name_off[r.rid]);
        out.append(tmp, snprintf(tmp, sizeof tmp, ",%lld,",
                                 (long long)(r.pos + 1)));
        out.push_back(r.is_rev ? '-' : '+');
        out.push_back(',');
        for (uint32_t c : r.cigar) {
          out.append(tmp, snprintf(tmp, sizeof tmp, "%u", c >> 4));
          out.push_back(kOpChr[c & 0xF]);
        }
        out.append(tmp, snprintf(tmp, sizeof tmp, ",%d,%d;", r.mapq, r.NM));
      }
    }
    if (p.alt_sc > 0)
      out.append(tmp, snprintf(tmp, sizeof tmp, "\tpa:f:%.3f",
                               (double)p.score / (double)p.alt_sc));
  }
  if (p.has_XA) {
    out.append("\tXA:Z:");
    out.append(p.XA);
  }
  if (comment_len) {
    out.push_back('\t');
    out.append(comment, comment_len);
  }
}

// mem_gen_alt (alt.py:23): XA string per reg index (after mark_primary).
static void gen_alt(const Opts& o, const Ref& ref,
                    const std::vector<Reg>& regs, int32_t l_query,
                    const uint8_t* query, std::vector<std::string>& XA,
                    std::vector<bool>& has) {
  size_t n = regs.size();
  XA.assign(n, std::string());
  has.assign(n, false);
  auto pri_idx = [&](size_t i) -> int64_t {
    int32_t k = regs[i].secondary_all;
    if (k >= 0 &&
        (double)regs[i].score >= (double)regs[k].score * o.XA_drop_ratio)
      return k;
    return -1;
  };
  std::vector<int64_t> cnt(n, 0);
  std::vector<bool> has_alt(n, false);
  int64_t tot = 0;
  for (size_t i = 0; i < n; ++i) {
    int64_t r = pri_idx(i);
    if (r >= 0) {
      cnt[r] += 1;
      ++tot;
      if (regs[i].is_alt) has_alt[r] = true;
    }
  }
  if (tot == 0) return;
  char tmp[48];
  for (size_t i = 0; i < n; ++i) {
    int64_t r = pri_idx(i);
    if (r < 0) continue;
    if (cnt[r] > o.max_XA_hits_alt ||
        (!has_alt[r] && cnt[r] > o.max_XA_hits))
      continue;
    Aln t = reg2aln(o, ref, l_query, query, &regs[i]);
    std::string& s = XA[r];
    s.append(ref.ctg_names + ref.ctg_name_off[t.rid],
             ref.ctg_name_off[t.rid + 1] - ref.ctg_name_off[t.rid]);
    s.push_back(',');
    s.push_back(t.is_rev ? '-' : '+');
    s.append(tmp, snprintf(tmp, sizeof tmp, "%lld,", (long long)(t.pos + 1)));
    for (uint32_t c : t.cigar) {
      s.append(tmp, snprintf(tmp, sizeof tmp, "%u", c >> 4));
      s.push_back(kOpChrXA[c & 0xF]);
    }
    s.append(tmp, snprintf(tmp, sizeof tmp, ",%d;", t.NM));
    has[r] = true;
  }
}

// mem_reg2sam, SE (finalize.py:527): appends this read's SAM block
// (newline-terminated lines).
static void reg2sam_se(const Opts& o, const Ref& ref, const char* name,
                       int64_t name_len, const uint8_t* codes, int64_t l_seq,
                       const char* qual, int64_t qual_len, const char* comment,
                       int64_t comment_len, const char* rg_id, int32_t rg_len,
                       std::vector<Reg>& regs, std::string& out) {
  int32_t l_query = (int32_t)l_seq;
  std::vector<std::string> XA;
  std::vector<bool> has_XA;
  bool use_xa = !(o.flag & 0x8 /*MEM_F_ALL*/);
  if (use_xa) gen_alt(o, ref, regs, l_query, codes, XA, has_XA);
  std::vector<Aln> aa;
  for (size_t k = 0; k < regs.size(); ++k) {
    Reg& p = regs[k];
    if (p.score < o.T) continue;
    if (p.secondary >= 0 && (p.is_alt || !(o.flag & 0x8))) continue;
    if (p.secondary >= 0 && p.secondary < kIntMax &&
        (double)p.score < (double)regs[p.secondary].score * o.drop_ratio)
      continue;
    Aln q = reg2aln(o, ref, l_query, codes, &p);
    if (use_xa && has_XA[k]) {
      q.XA = XA[k];
      q.has_XA = true;
    }
    q.flag |= (int32_t)o.extra_flag;
    if (p.secondary >= 0) q.sub = -1;
    if (!aa.empty() && p.secondary < 0)
      q.flag |= (o.flag & 0x10 /*MEM_F_NO_MULTI*/) ? 0x10000 : 0x800;
    if (!(o.flag & 0x1000 /*MEM_F_KEEP_SUPP_MAPQ*/) && !aa.empty() &&
        !p.is_alt && q.mapq > aa[0].mapq)
      q.mapq = aa[0].mapq;
    aa.push_back(std::move(q));
  }
  if (aa.empty()) {
    Aln t = reg2aln(o, ref, l_query, codes, nullptr);
    t.flag |= (int32_t)o.extra_flag;
    std::vector<Aln> one;
    one.push_back(std::move(t));
    aln2sam_se(o, ref, name, name_len, codes, l_seq, qual, qual_len, comment,
               comment_len, rg_id, rg_len, 1, one, 0, out);
    out.push_back('\n');
    return;
  }
  for (size_t k = 0; k < aa.size(); ++k) {
    aln2sam_se(o, ref, name, name_len, codes, l_seq, qual, qual_len, comment,
               comment_len, rg_id, rg_len, aa.size(), aa, k, out);
    out.push_back('\n');
  }
}

}  // namespace fin

extern "C" {

// Whole-batch single-end finalization; see the Python wrapper
// (align/native.py:finalize_se_native) for the argument layout. Returns the
// total SAM byte count, or -(needed) when out_cap is too small (caller
// retries with a bigger buffer).
int64_t finalize_se_c(
    int32_t R, const int32_t* reg_off, const int64_t* rb, const int64_t* re,
    const int32_t* qb, const int32_t* qe, const int32_t* rid,
    const int32_t* score, const int32_t* truesc, const int32_t* sub,
    const int32_t* csub, const int32_t* w_arr, const int32_t* seedcov,
    const double* frac_rep, const uint8_t* reg_is_alt, const uint8_t* qcodes,
    const int64_t* qoff, const char* names, const int64_t* name_off,
    const char* quals, const int64_t* qual_off, const char* comments,
    const int64_t* comm_off, const uint8_t* text, int64_t l_pac,
    int32_t n_ctg, const int64_t* ctg_off, const char* ctg_names,
    const int64_t* ctg_name_off, const uint8_t* ctg_is_alt,
    const int8_t* mat, const int64_t* iopt, const double* dopt,
    const char* rg_id, int32_t rg_len, char* out_buf, int64_t out_cap,
    int64_t* out_off) {
  fin::Opts o;
  o.mat = mat;
  o.o_del = iopt[0];
  o.e_del = iopt[1];
  o.o_ins = iopt[2];
  o.e_ins = iopt[3];
  o.a = iopt[4];
  o.b = iopt[5];
  o.T = iopt[6];
  o.w = iopt[7];
  o.max_chain_gap = iopt[8];
  o.min_seed_len = iopt[9];
  o.flag = iopt[10];
  o.max_XA_hits = iopt[11];
  o.max_XA_hits_alt = iopt[12];
  o.mapQ_coef_fac = iopt[13];
  o.extra_flag = iopt[14];
  int64_t n_processed = iopt[15];
  o.mask_level = dopt[0];
  o.mask_level_redun = dopt[1];
  o.drop_ratio = dopt[2];
  o.XA_drop_ratio = dopt[3];
  o.mapQ_coef_len = dopt[4];

  fin::Ref ref;
  ref.text = text;
  ref.l_pac = l_pac;
  ref.n_ctg = n_ctg;
  ref.ctg_off = ctg_off;
  ref.ctg_names = ctg_names;
  ref.ctg_name_off = ctg_name_off;
  ref.ctg_is_alt = ctg_is_alt;

  std::string out;
  out.reserve((size_t)(out_cap > 0 ? out_cap : 1024));
  std::vector<int64_t> offs(R + 1, 0);
  std::vector<fin::Reg> regs;
  for (int32_t li = 0; li < R; ++li) {
    regs.clear();
    for (int32_t g = reg_off[li]; g < reg_off[li + 1]; ++g) {
      if (qe[g] <= qb[g]) continue;
      fin::Reg r;
      r.rb = rb[g];
      r.re = re[g];
      r.qb = qb[g];
      r.qe = qe[g];
      r.rid = rid[g];
      r.score = score[g];
      r.truesc = truesc[g];
      r.sub = sub[g];
      r.csub = csub[g];
      r.sub_n = 0;
      r.alt_sc = 0;
      r.w = w_arr[g];
      r.seedcov = seedcov[g];
      r.secondary = -1;
      r.secondary_all = -1;
      r.n_comp = 1;
      r.hash = 0;
      r.frac_rep = frac_rep[g];
      r.is_alt = reg_is_alt[g] != 0;
      regs.push_back(r);
    }
    const uint8_t* codes = qcodes + qoff[li];
    int64_t l_seq = qoff[li + 1] - qoff[li];
    fin::sort_dedup_patch(o, ref, codes, regs);
    for (auto& r : regs)
      if (r.rid >= 0 && ctg_is_alt[r.rid]) r.is_alt = true;
    fin::mark_primary(o, regs, n_processed + li);
    if (o.flag & 0x800 /*MEM_F_PRIMARY5*/) fin::reorder_primary5(o, regs);
    fin::reg2sam_se(o, ref, names + name_off[li],
                    name_off[li + 1] - name_off[li], codes, l_seq,
                    quals + qual_off[li], qual_off[li + 1] - qual_off[li],
                    comments + comm_off[li], comm_off[li + 1] - comm_off[li],
                    rg_id, rg_len, regs, out);
    offs[li + 1] = (int64_t)out.size();
  }
  for (int32_t i = 0; i <= R; ++i) out_off[i] = offs[i];
  if ((int64_t)out.size() > out_cap) return -(int64_t)out.size();
  std::memcpy(out_buf, out.data(), out.size());
  return (int64_t)out.size();
}

}  // extern "C"

// ===========================================================================
// Native paired-end finalization: mem_pair + mem_sam_pe (batched-rescue
// path) + the mate-aware mem_aln2sam — port of align/pairing.py (reference
// src/bwamem_pair.cpp:372-658) sharing the fin:: machinery above. The
// Python implementation remains the documented contract
// (tests/test_native_finalize.py::test_native_pe_matches_python).

namespace fin {

struct PeStat {
  int64_t low = 0, high = 0, failed = 0;
  double avg = 0.0, std_ = 0.0;
};

inline int64_t raw_mapq(int64_t diff, int64_t a) {
  return (int64_t)(6.02 * (double)diff / (double)a + 0.499);
}

// mem_infer_dir (pairing.py:50).
inline void infer_dir(int64_t l_pac, int64_t b1, int64_t b2, int32_t* d,
                      int64_t* dist) {
  bool r1 = b1 >= l_pac, r2 = b2 >= l_pac;
  int64_t p2 = (r1 == r2) ? b2 : (l_pac << 1) - 1 - b2;
  *dist = p2 > b1 ? p2 - b1 : b1 - p2;
  *d = ((r1 == r2) ? 0 : 1) ^ ((p2 > b1) ? 0 : 3);
}

// mem_pair (pairing.py:298). Returns score o (0 = no pair), sub, n_sub, z.
static void mem_pair(const Opts& o, const Ref& ref, const PeStat* pes,
                     std::vector<Reg>* a, int64_t pair_id,
                     const int64_t* n_pri, int64_t* out_o, int64_t* out_sub,
                     int64_t* out_nsub, int64_t* z) {
  z[0] = z[1] = -1;
  *out_o = *out_sub = *out_nsub = 0;
  std::vector<std::pair<uint64_t, uint64_t>> v;
  for (int r = 0; r < 2; ++r) {
    for (int64_t i = 0; i < n_pri[r]; ++i) {
      const Reg& e = a[r][i];
      int64_t x_pos = e.rb < ref.l_pac ? e.rb : (ref.l_pac << 1) - 1 - e.rb;
      uint64_t key_x = ((uint64_t)e.rid << 32) |
                       (uint64_t)(x_pos - ref.ctg_off[e.rid]);
      uint64_t key_y = ((uint64_t)(uint32_t)e.score << 32) |
                       ((uint64_t)i << 2) |
                       ((uint64_t)(e.rb >= ref.l_pac) << 1) | (uint64_t)r;
      v.emplace_back(key_x, key_y);
    }
  }
  std::sort(v.begin(), v.end());
  int64_t y[4] = {-1, -1, -1, -1};
  std::vector<std::pair<uint64_t, uint64_t>> u;
  for (size_t i = 0; i < v.size(); ++i) {
    for (int r = 0; r < 2; ++r) {
      int dirn = (r << 1) | ((v[i].second >> 1) & 1);
      if (pes[dirn].failed) continue;
      int which = (r << 1) | ((v[i].second & 1) ^ 1);
      if (y[which] < 0) continue;
      for (int64_t k = y[which]; k >= 0; --k) {
        if ((int)(v[k].second & 3) != which) continue;
        int64_t dist = (int64_t)(v[i].first - v[k].first);
        if (dist > pes[dirn].high) break;
        if (dist < pes[dirn].low) continue;
        double ns = ((double)dist - pes[dirn].avg) / pes[dirn].std_;
        int64_t q = (int64_t)(
            (double)((v[i].second >> 32) + (v[k].second >> 32)) +
            0.721 * std::log(2.0 * std::erfc(std::fabs(ns) *
                                             (1.0 / std::sqrt(2.0)))) *
                (double)o.a + 0.499);
        if (q < 0) q = 0;
        uint64_t yv = ((uint64_t)k << 32) | (uint64_t)i;
        uint64_t h = hash_64(yv ^ ((uint64_t)pair_id << 8)) & 0xFFFFFFFFull;
        u.emplace_back(((uint64_t)q << 32) | h, yv);
      }
    }
    y[v[i].second & 3] = (int64_t)i;
  }
  if (u.empty()) return;
  int64_t tmp = std::max({o.a + o.b, o.o_del + o.e_del, o.o_ins + o.e_ins});
  std::sort(u.begin(), u.end());
  uint64_t i_ = u.back().second >> 32;
  uint64_t k_ = u.back().second & 0xFFFFFFFFull;
  z[v[i_].second & 1] = (int64_t)((v[i_].second & 0xFFFFFFFFull) >> 2);
  z[v[k_].second & 1] = (int64_t)((v[k_].second & 0xFFFFFFFFull) >> 2);
  *out_o = (int64_t)(u.back().first >> 32);
  int64_t sub = u.size() > 1 ? (int64_t)(u[u.size() - 2].first >> 32) : 0;
  *out_sub = sub;
  int64_t nsub = 0;
  for (size_t e = 0; e + 1 < u.size(); ++e)
    if (sub - (int64_t)(u[e].first >> 32) <= tmp) ++nsub;
  *out_nsub = nsub;
}

struct ReadIn {
  const char* name;
  int64_t name_len;
  const uint8_t* codes;
  int64_t l_seq;
  const char* qual;
  int64_t qual_len;
  const char* comment;
  int64_t comment_len;
};

// mem_aln2sam with a mate (finalize.py:426) — generalizes aln2sam_se.
static void aln2sam(const Opts& o, const Ref& ref, const ReadIn& rd,
                    const char* rg_id, int32_t rg_len, size_t n,
                    const std::vector<Aln>& alns, size_t which,
                    const Aln* m_in, std::string& out) {
  Aln p = alns[which];
  Aln m_local;
  const Aln* m = nullptr;
  if (m_in) {
    m_local = *m_in;
    m = &m_local;
  }
  if (m) p.flag |= 0x1;
  if (p.rid < 0) p.flag |= 0x4;
  if (m && m->rid < 0) p.flag |= 0x8;
  if (p.rid < 0 && m && m->rid >= 0) {
    p.rid = m->rid;
    p.pos = m->pos;
    p.is_rev = m->is_rev;
    p.n_cigar = 0;
  }
  if (m && m->rid < 0 && p.rid >= 0) {
    m_local.rid = p.rid;
    m_local.pos = p.pos;
    m_local.is_rev = p.is_rev;
    m_local.n_cigar = 0;
  }
  if (p.is_rev) p.flag |= 0x10;
  if (m && m->is_rev) p.flag |= 0x20;
  char tmp[48];
  out.append(rd.name, rd.name_len);
  out.push_back('\t');
  out.append(tmp, snprintf(tmp, sizeof tmp, "%d",
                           (p.flag & 0xFFFF) | ((p.flag & 0x10000) ? 0x100
                                                                  : 0)));
  out.push_back('\t');
  if (p.rid >= 0) {
    out.append(ref.ctg_names + ref.ctg_name_off[p.rid],
               ref.ctg_name_off[p.rid + 1] - ref.ctg_name_off[p.rid]);
    out.push_back('\t');
    out.append(tmp, snprintf(tmp, sizeof tmp, "%lld",
                             (long long)(p.pos + 1)));
    out.push_back('\t');
    out.append(tmp, snprintf(tmp, sizeof tmp, "%d", p.mapq));
    out.push_back('\t');
    if (p.n_cigar)
      cigar_str(o, p, (int32_t)which, out);
    else
      out.push_back('*');
  } else {
    out.append("*\t0\t0\t*");
  }
  out.push_back('\t');
  if (m && m->rid >= 0) {
    if (p.rid == m->rid)
      out.push_back('=');
    else
      out.append(ref.ctg_names + ref.ctg_name_off[m->rid],
                 ref.ctg_name_off[m->rid + 1] - ref.ctg_name_off[m->rid]);
    out.append(tmp, snprintf(tmp, sizeof tmp, "\t%lld\t",
                             (long long)(m->pos + 1)));
    if (p.rid == m->rid && p.n_cigar && m->n_cigar) {
      int64_t p0 = p.pos + (p.is_rev ? get_rlen(p.cigar) - 1 : 0);
      int64_t p1 = m->pos + (m->is_rev ? get_rlen(m->cigar) - 1 : 0);
      int64_t sgn = p0 > p1 ? 1 : (p0 < p1 ? -1 : 0);
      out.append(tmp, snprintf(tmp, sizeof tmp, "%lld",
                               (long long)(-(p0 - p1 + sgn))));
    } else {
      out.push_back('0');
    }
  } else {
    out.append("*\t0\t0");
  }
  out.push_back('\t');

  static const char kFwd[] = "ACGTN";
  static const char kRev[] = "TGCAN";
  if (p.flag & 0x100) {
    out.append("*\t*");
  } else {
    int64_t qb = 0, qe = rd.l_seq;
    if (p.n_cigar && which && !(o.flag & 0x200) && !p.is_alt) {
      int32_t op0 = p.cigar.front() & 0xF;
      int32_t opn = p.cigar.back() & 0xF;
      if (op0 == 3 || op0 == 4) {
        if (p.is_rev)
          qe -= p.cigar.front() >> 4;
        else
          qb += p.cigar.front() >> 4;
      }
      if (opn == 3 || opn == 4) {
        if (p.is_rev)
          qb += p.cigar.back() >> 4;
        else
          qe -= p.cigar.back() >> 4;
      }
    }
    if (qe > qb) {
      if (!p.is_rev) {
        for (int64_t i = qb; i < qe; ++i)
          out.push_back(kFwd[rd.codes[i] > 4 ? 4 : rd.codes[i]]);
        out.push_back('\t');
        if (rd.qual_len)
          out.append(rd.qual + qb, qe - qb);
        else
          out.push_back('*');
      } else {
        for (int64_t i = qe - 1; i >= qb; --i)
          out.push_back(kRev[rd.codes[i] > 4 ? 4 : rd.codes[i]]);
        out.push_back('\t');
        if (rd.qual_len) {
          for (int64_t i = qe - 1; i >= qb; --i) out.push_back(rd.qual[i]);
        } else {
          out.push_back('*');
        }
      }
    } else {
      out.append("*\t*");
    }
  }

  if (p.n_cigar) {
    out.append(tmp, snprintf(tmp, sizeof tmp, "\tNM:i:%d", p.NM));
    out.append("\tMD:Z:");
    out.append(p.md);
  }
  if (m && m->n_cigar) {
    out.append("\tMC:Z:");
    cigar_str(o, *m, (int32_t)which, out);
  }
  if (p.score >= 0)
    out.append(tmp, snprintf(tmp, sizeof tmp, "\tAS:i:%d", p.score));
  if (p.sub >= 0)
    out.append(tmp, snprintf(tmp, sizeof tmp, "\tXS:i:%d", p.sub));
  if (rg_len) {
    out.append("\tRG:Z:");
    out.append(rg_id, rg_len);
  }
  if (!(p.flag & 0x100)) {
    bool any = false;
    for (size_t i = 0; i < n; ++i)
      if (i != which && !(alns[i].flag & 0x100)) { any = true; break; }
    if (any) {
      out.append("\tSA:Z:");
      for (size_t i = 0; i < n; ++i) {
        const Aln& r = alns[i];
        if (i == which || (r.flag & 0x100)) continue;
        out.append(ref.ctg_names + ref.ctg_name_off[r.rid],
                   ref.ctg_name_off[r.rid + 1] - ref.ctg_name_off[r.rid]);
        out.append(tmp, snprintf(tmp, sizeof tmp, ",%lld,",
                                 (long long)(r.pos + 1)));
        out.push_back(r.is_rev ? '-' : '+');
        out.push_back(',');
        for (uint32_t c : r.cigar) {
          out.append(tmp, snprintf(tmp, sizeof tmp, "%u", c >> 4));
          out.push_back(kOpChr[c & 0xF]);
        }
        out.append(tmp, snprintf(tmp, sizeof tmp, ",%d,%d;", r.mapq, r.NM));
      }
    }
    if (p.alt_sc > 0)
      out.append(tmp, snprintf(tmp, sizeof tmp, "\tpa:f:%.3f",
                               (double)p.score / (double)p.alt_sc));
  }
  if (p.has_XA) {
    out.append("\tXA:Z:");
    out.append(p.XA);
  }
  if (rd.comment_len) {
    out.push_back('\t');
    out.append(rd.comment, rd.comment_len);
  }
}

// mem_reg2sam with a mate + extra_flag (finalize.py:527).
static void reg2sam(const Opts& o, const Ref& ref, const ReadIn& rd,
                    const char* rg_id, int32_t rg_len, std::vector<Reg>& regs,
                    int32_t extra_flag, const Aln* m, std::string& out) {
  int32_t l_query = (int32_t)rd.l_seq;
  std::vector<std::string> XA;
  std::vector<bool> has_XA;
  bool use_xa = !(o.flag & 0x8);
  if (use_xa) gen_alt(o, ref, regs, l_query, rd.codes, XA, has_XA);
  std::vector<Aln> aa;
  for (size_t k = 0; k < regs.size(); ++k) {
    Reg& p = regs[k];
    if (p.score < o.T) continue;
    if (p.secondary >= 0 && (p.is_alt || !(o.flag & 0x8))) continue;
    if (p.secondary >= 0 && p.secondary < kIntMax &&
        (double)p.score < (double)regs[p.secondary].score * o.drop_ratio)
      continue;
    Aln q = reg2aln(o, ref, l_query, rd.codes, &p);
    if (use_xa && has_XA[k]) {
      q.XA = XA[k];
      q.has_XA = true;
    }
    q.flag |= extra_flag;
    if (p.secondary >= 0) q.sub = -1;
    if (!aa.empty() && p.secondary < 0)
      q.flag |= (o.flag & 0x10) ? 0x10000 : 0x800;
    if (!(o.flag & 0x1000) && !aa.empty() && !p.is_alt &&
        q.mapq > aa[0].mapq)
      q.mapq = aa[0].mapq;
    aa.push_back(std::move(q));
  }
  if (aa.empty()) {
    Aln t = reg2aln(o, ref, l_query, rd.codes, nullptr);
    t.flag |= extra_flag;
    std::vector<Aln> one;
    one.push_back(std::move(t));
    aln2sam(o, ref, rd, rg_id, rg_len, 1, one, 0, m, out);
    out.push_back('\n');
    return;
  }
  for (size_t k = 0; k < aa.size(); ++k) {
    aln2sam(o, ref, rd, rg_id, rg_len, aa.size(), aa, k, m, out);
    out.push_back('\n');
  }
}

// mem_sam_pe, batched-rescue path (pairing.py:353 with skip_rescue=True).
static void sam_pe(const Opts& o, const Ref& ref, const PeStat* pes,
                   int64_t pair_id, const ReadIn* rd, const char* rg_id,
                   int32_t rg_len, std::vector<Reg>* a, std::string& out,
                   int64_t* off0) {
  int64_t n_pri[2] = {0, 0};
  for (int i = 0; i < 2; ++i) {
    mark_primary(o, a[i], (pair_id << 1) | i);
    for (auto& r : a[i])
      if (!r.is_alt) ++n_pri[i];
    if (o.flag & 0x800) reorder_primary5(o, a[i]);
  }
  int32_t extra_flag = 1;
  if (!(o.flag & 0x4 /*MEM_F_NOPAIRING*/) && n_pri[0] && n_pri[1]) {
    int64_t o_, subo, n_sub, z[2];
    mem_pair(o, ref, pes, a, pair_id, n_pri, &o_, &subo, &n_sub, z);
    if (o_ > 0) {
      bool is_multi[2] = {false, false};
      for (int i = 0; i < 2; ++i)
        for (int64_t j = 1; j < n_pri[i]; ++j)
          if (a[i][j].secondary < 0 && a[i][j].score >= o.T) {
            is_multi[i] = true;
            break;
          }
      if (!is_multi[0] && !is_multi[1]) {
        int64_t score_un = a[0][0].score + a[1][0].score - /*pen_unpaired*/
                           o.extra_flag;  // (extra_flag slot reused — see
                                          // caller: iopt[14] = pen_unpaired)
        if (subo < score_un) subo = score_un;
        int64_t q_pe = raw_mapq(o_ - subo, o.a);
        if (n_sub > 0)
          q_pe -= (int64_t)(4.343 * std::log((double)n_sub + 1.0) + 0.499);
        if (q_pe < 0) q_pe = 0;
        if (q_pe > 60) q_pe = 60;
        q_pe = (int64_t)((double)q_pe *
                             (1.0 - 0.5 * (a[0][0].frac_rep +
                                           a[1][0].frac_rep)) + 0.499);
        int64_t q_se[2] = {0, 0};
        if (o_ > score_un) {
          Reg* c[2] = {&a[0][z[0]], &a[1][z[1]]};
          for (int i = 0; i < 2; ++i) {
            if (c[i]->secondary >= 0) {
              c[i]->sub = a[i][c[i]->secondary].score;
              c[i]->secondary = -2;
            }
            q_se[i] = approx_mapq(o, *c[i]);
          }
          for (int i = 0; i < 2; ++i) {
            q_se[i] = q_se[i] > q_pe ? q_se[i]
                                     : std::min(q_pe, q_se[i] + 40);
            q_se[i] = std::min(
                q_se[i], raw_mapq(c[i]->score - c[i]->csub, o.a));
          }
          extra_flag |= 2;
        } else {
          z[0] = z[1] = 0;
          q_se[0] = approx_mapq(o, a[0][0]);
          q_se[1] = approx_mapq(o, a[1][0]);
        }
        for (int i = 0; i < 2; ++i) {
          int32_t k = a[i][z[i]].secondary_all;
          if (0 <= k && k < n_pri[i]) {
            for (size_t j = 0; j < a[i].size(); ++j)
              if (a[i][j].secondary_all == k || (int32_t)j == k)
                a[i][j].secondary_all = (int32_t)z[i];
            a[i][z[i]].secondary_all = -1;
          }
        }
        std::vector<std::string> XA[2];
        std::vector<bool> has_XA[2];
        if (!(o.flag & 0x8))
          for (int i = 0; i < 2; ++i)
            gen_alt(o, ref, a[i], (int32_t)rd[i].l_seq, rd[i].codes, XA[i],
                    has_XA[i]);
        Aln h[2];
        std::vector<Aln> aa[2];
        for (int i = 0; i < 2; ++i) {
          h[i] = reg2aln(o, ref, (int32_t)rd[i].l_seq, rd[i].codes,
                         &a[i][z[i]]);
          h[i].mapq = (int32_t)q_se[i];
          h[i].flag |= (0x40 << i) | extra_flag;
          if (!XA[i].empty() && has_XA[i][z[i]]) {
            h[i].XA = XA[i][z[i]];
            h[i].has_XA = true;
          }
          aa[i].push_back(h[i]);
          if (n_pri[i] < (int64_t)a[i].size()) {
            Reg& p = a[i][n_pri[i]];
            if (p.score >= o.T && p.secondary < 0 && p.is_alt) {
              Aln g = reg2aln(o, ref, (int32_t)rd[i].l_seq, rd[i].codes,
                              &p);
              g.flag |= 0x800 | (0x40 << i) | extra_flag;
              if (!XA[i].empty() && has_XA[i][n_pri[i]]) {
                g.XA = XA[i][n_pri[i]];
                g.has_XA = true;
              }
              aa[i].push_back(std::move(g));
            }
          }
        }
        for (size_t k = 0; k < aa[0].size(); ++k) {
          aln2sam(o, ref, rd[0], rg_id, rg_len, aa[0].size(), aa[0], k,
                  &h[1], out);
          out.push_back('\n');
        }
        *off0 = (int64_t)out.size();
        for (size_t k = 0; k < aa[1].size(); ++k) {
          aln2sam(o, ref, rd[1], rg_id, rg_len, aa[1].size(), aa[1], k,
                  &h[0], out);
          out.push_back('\n');
        }
        return;
      }
    }
  }
  // no_pairing path
  Aln h[2];
  for (int i = 0; i < 2; ++i) {
    int64_t which = -1;
    if (!a[i].empty()) {
      if (a[i][0].score >= o.T)
        which = 0;
      else if (n_pri[i] < (int64_t)a[i].size() &&
               a[i][n_pri[i]].score >= o.T)
        which = n_pri[i];
    }
    h[i] = reg2aln(o, ref, (int32_t)rd[i].l_seq, rd[i].codes,
                   which >= 0 ? &a[i][which] : nullptr);
  }
  if (!(o.flag & 0x4) && h[0].rid == h[1].rid && h[0].rid >= 0 &&
      !a[0].empty() && !a[1].empty()) {
    int32_t d;
    int64_t dist;
    infer_dir(ref.l_pac, a[0][0].rb, a[1][0].rb, &d, &dist);
    if (!pes[d].failed && pes[d].low <= dist && dist <= pes[d].high)
      extra_flag |= 2;
  }
  reg2sam(o, ref, rd[0], rg_id, rg_len, a[0], 0x41 | extra_flag, &h[1],
          out);
  *off0 = (int64_t)out.size();
  reg2sam(o, ref, rd[1], rg_id, rg_len, a[1], 0x81 | extra_flag, &h[0],
          out);
}

}  // namespace fin

extern "C" {

// Whole-chunk paired-end finalization (pairs already deduped and
// batch-rescued). iopt[14] carries pen_unpaired; iopt[15] the pair_id base.
// pe_stats: 4 orientations x (low, high, failed, avg, std) doubles.
// out_off has 2R+1 entries (per-READ SAM block offsets). Returns total
// bytes or -(needed).
int64_t finalize_pe_c(
    int32_t R_pairs, const int32_t* reg_off, const int64_t* rb,
    const int64_t* re, const int32_t* qb, const int32_t* qe,
    const int32_t* rid, const int32_t* score, const int32_t* truesc,
    const int32_t* sub, const int32_t* csub, const int32_t* w_arr,
    const int32_t* seedcov, const double* frac_rep,
    const uint8_t* reg_is_alt, const uint8_t* qcodes, const int64_t* qoff,
    const char* names, const int64_t* name_off, const char* quals,
    const int64_t* qual_off, const char* comments, const int64_t* comm_off,
    const uint8_t* text, int64_t l_pac, int32_t n_ctg,
    const int64_t* ctg_off, const char* ctg_names,
    const int64_t* ctg_name_off, const uint8_t* ctg_is_alt,
    const int8_t* mat, const int64_t* iopt, const double* dopt,
    const double* pe_stats, const char* rg_id, int32_t rg_len,
    char* out_buf, int64_t out_cap, int64_t* out_off) {
  fin::Opts o;
  o.mat = mat;
  o.o_del = iopt[0];
  o.e_del = iopt[1];
  o.o_ins = iopt[2];
  o.e_ins = iopt[3];
  o.a = iopt[4];
  o.b = iopt[5];
  o.T = iopt[6];
  o.w = iopt[7];
  o.max_chain_gap = iopt[8];
  o.min_seed_len = iopt[9];
  o.flag = iopt[10];
  o.max_XA_hits = iopt[11];
  o.max_XA_hits_alt = iopt[12];
  o.mapQ_coef_fac = iopt[13];
  o.extra_flag = iopt[14];  // pen_unpaired (see fin::sam_pe)
  int64_t pair_id0 = iopt[15];
  o.mask_level = dopt[0];
  o.mask_level_redun = dopt[1];
  o.drop_ratio = dopt[2];
  o.XA_drop_ratio = dopt[3];
  o.mapQ_coef_len = dopt[4];

  fin::Ref ref;
  ref.text = text;
  ref.l_pac = l_pac;
  ref.n_ctg = n_ctg;
  ref.ctg_off = ctg_off;
  ref.ctg_names = ctg_names;
  ref.ctg_name_off = ctg_name_off;
  ref.ctg_is_alt = ctg_is_alt;

  fin::PeStat pes[4];
  for (int d = 0; d < 4; ++d) {
    pes[d].low = (int64_t)pe_stats[d * 5 + 0];
    pes[d].high = (int64_t)pe_stats[d * 5 + 1];
    pes[d].failed = (int64_t)pe_stats[d * 5 + 2];
    pes[d].avg = pe_stats[d * 5 + 3];
    pes[d].std_ = pe_stats[d * 5 + 4];
  }

  std::string out;
  out.reserve((size_t)(out_cap > 0 ? out_cap : 1024));
  std::vector<int64_t> offs(2 * R_pairs + 1, 0);
  for (int32_t pi = 0; pi < R_pairs; ++pi) {
    std::vector<fin::Reg> a[2];
    fin::ReadIn rd[2];
    for (int i = 0; i < 2; ++i) {
      int32_t li = 2 * pi + i;
      for (int32_t g = reg_off[li]; g < reg_off[li + 1]; ++g) {
        fin::Reg r;
        r.rb = rb[g];
        r.re = re[g];
        r.qb = qb[g];
        r.qe = qe[g];
        r.rid = rid[g];
        r.score = score[g];
        r.truesc = truesc[g];
        r.sub = sub[g];
        r.csub = csub[g];
        r.sub_n = 0;
        r.alt_sc = 0;
        r.w = w_arr[g];
        r.seedcov = seedcov[g];
        r.secondary = -1;
        r.secondary_all = -1;
        r.n_comp = 1;
        r.hash = 0;
        r.frac_rep = frac_rep[g];
        r.is_alt = reg_is_alt[g] != 0;
        a[i].push_back(r);
      }
      rd[i].name = names + name_off[li];
      rd[i].name_len = name_off[li + 1] - name_off[li];
      rd[i].codes = qcodes + qoff[li];
      rd[i].l_seq = qoff[li + 1] - qoff[li];
      rd[i].qual = quals + qual_off[li];
      rd[i].qual_len = qual_off[li + 1] - qual_off[li];
      rd[i].comment = comments + comm_off[li];
      rd[i].comment_len = comm_off[li + 1] - comm_off[li];
    }
    int64_t off0 = 0;
    fin::sam_pe(o, ref, pes, pair_id0 + pi, rd, rg_id, rg_len, a, out,
                &off0);
    offs[2 * pi + 1] = off0;
    offs[2 * pi + 2] = (int64_t)out.size();
  }
  for (int32_t i = 0; i <= 2 * R_pairs; ++i) out_off[i] = offs[i];
  if ((int64_t)out.size() > out_cap) return -(int64_t)out.size();
  std::memcpy(out_buf, out.data(), out.size());
  return (int64_t)out.size();
}

}  // extern "C"

// ===========================================================================
// Whole-batch mem_sort_dedup_patch (reference: src/bwamem.cpp:312-384) for
// the paired-end path's kernel-3 prologue — the SE path gets dedup inside
// finalize_se_c, but PE must dedup BEFORE insert-size estimation and the
// batched mate rescue, so it needs the regs back. Mutates the flat field
// arrays in place with the patched values and returns the kept regs'
// ORIGINAL global indices in final order (out_idx) with per-read offsets
// (out_off, R+1 int32). Fields mem_sort_dedup_patch never touches
// (frac_rep, is_alt, chain pointers, ...) stay with the caller's objects.

extern "C" {

int32_t dedup_patch_batch_c(
    int32_t R, const int32_t* reg_off, int64_t* rb, int64_t* re, int32_t* qb,
    int32_t* qe, const int32_t* rid, int32_t* score, int32_t* truesc,
    int32_t* sub, int32_t* csub, int32_t* w_arr, int32_t* seedcov,
    int32_t* n_comp, const uint8_t* qcodes, const int64_t* qoff,
    const uint8_t* text, int64_t l_pac, const int8_t* mat,
    const int64_t* iopt, const double* dopt, int32_t* out_idx,
    int32_t* out_off) {
  fin::Opts o;  // same iopt/dopt layout as finalize_se_c
  o.mat = mat;
  o.o_del = iopt[0];
  o.e_del = iopt[1];
  o.o_ins = iopt[2];
  o.e_ins = iopt[3];
  o.a = iopt[4];
  o.b = iopt[5];
  o.T = iopt[6];
  o.w = iopt[7];
  o.max_chain_gap = iopt[8];
  o.min_seed_len = iopt[9];
  o.flag = iopt[10];
  o.max_XA_hits = iopt[11];
  o.max_XA_hits_alt = iopt[12];
  o.mapQ_coef_fac = iopt[13];
  o.extra_flag = 0;
  o.mask_level = dopt[0];
  o.mask_level_redun = dopt[1];
  o.drop_ratio = dopt[2];
  o.XA_drop_ratio = dopt[3];
  o.mapQ_coef_len = dopt[4];

  fin::Ref ref;  // dedup/patch only touch text + l_pac (fin::gen_cigar)
  ref.text = text;
  ref.l_pac = l_pac;
  ref.n_ctg = 0;
  ref.ctg_off = nullptr;
  ref.ctg_names = nullptr;
  ref.ctg_name_off = nullptr;
  ref.ctg_is_alt = nullptr;

  int32_t total = 0;
  out_off[0] = 0;
  std::vector<fin::Reg> regs;
  for (int32_t li = 0; li < R; ++li) {
    regs.clear();
    for (int32_t g = reg_off[li]; g < reg_off[li + 1]; ++g) {
      if (qe[g] <= qb[g]) continue;
      fin::Reg r;
      r.rb = rb[g];
      r.re = re[g];
      r.qb = qb[g];
      r.qe = qe[g];
      r.rid = rid[g];
      r.score = score[g];
      r.truesc = truesc[g];
      r.sub = sub[g];
      r.csub = csub[g];
      r.sub_n = 0;
      r.alt_sc = 0;
      r.w = w_arr[g];
      r.seedcov = seedcov[g];
      r.secondary = -1;
      r.secondary_all = -1;
      r.n_comp = 1;
      r.hash = (uint64_t)g;  // carry the original index through the sorts
      r.frac_rep = 0.0;
      r.is_alt = false;
      regs.push_back(r);
    }
    fin::sort_dedup_patch(o, ref, qcodes + qoff[li], regs);
    for (const auto& r : regs) {
      int32_t g = (int32_t)r.hash;
      rb[g] = r.rb;
      re[g] = r.re;
      qb[g] = r.qb;
      qe[g] = r.qe;
      score[g] = r.score;
      truesc[g] = r.truesc;
      sub[g] = r.sub;
      csub[g] = r.csub;
      w_arr[g] = r.w;
      seedcov[g] = r.seedcov;
      n_comp[g] = r.n_comp;
      out_idx[total++] = g;
    }
    out_off[li + 1] = total;
  }
  return total;
}

}  // extern "C"

// ===========================================================================
// MODE-4 device-row assembly (ops/sa_search.py:from_host): one
// cache-friendly pass builds the fused rank rows rkm[r] = (sa[r], key[r],
// bases 32..48) — replaces numpy column writes + 200M-element fancy-index
// gathers (~115 s -> seconds at 100 Mbp). Deep compares past 48 bases read
// the packed text on device (text64_at), so no text-position plane is
// assembled here anymore.

extern "C" {

void build_mode4_rows_c(int64_t n, const int64_t* sa, const uint32_t* khi,
                        const uint32_t* klo, const int64_t* isa,
                        uint32_t* rkm, int32_t wide) {
  // wide (>2^31-suffix texts): 5-word rows (pos_lo, pos_hi, khi, klo, b48)
  const int64_t rw = wide ? 5 : 4;
  const int64_t kw = wide ? 2 : 1;
  for (int64_t r = 0; r < n; ++r) {
    uint32_t* row = rkm + rw * r;
    int64_t pos = sa[r];
    row[0] = (uint32_t)pos;
    if (wide) row[1] = (uint32_t)(pos >> 32);
    row[kw] = khi[r];
    row[kw + 1] = klo[r];
    int64_t nxt = pos + 32;
    row[kw + 2] = nxt < n ? khi[isa[nxt]] : 0xFFFFFFFFu;
  }
}

}  // extern "C"
