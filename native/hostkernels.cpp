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
