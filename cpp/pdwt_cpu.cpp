/* pdwt_cpu — native CPU reference engine.  See pdwt_cpu.h.
 *
 * Independent implementation of the transform spec (periodic boundary,
 * analysis center c = hlen/2 (odd) or hlen/2 - 1 (even), synthesis shift
 * s in the zero-stuffed domain, odd-size virtual extension), written as
 * plain strided loops with double accumulation.  Not a translation of the
 * reference CUDA kernels; semantics cross-checked against the JAX engines
 * in tests/test_native.py.
 */
#include "pdwt_cpu.h"

#include <cmath>
#include <cstring>
#include <vector>

namespace {

inline int fwd_center(int hlen) {
  return (hlen % 2) ? hlen / 2 : hlen / 2 - 1;
}

inline int inv_shift(int hlen) {
  int h2 = hlen / 2, c2 = h2 / 2;
  return (h2 % 2) ? 2 * c2 + 1 : 2 * c2;
}

inline long imod(long i, long n) {
  long r = i % n;
  return r < 0 ? r + n : r;
}

/* Generic strided single-axis decimated analysis.
 * in: n_other lines of length n_along (stride_along between elements,
 * stride_other between lines); out lines of length (n_along+1)/2. */
void analysis_axis(const pdwt_real *in, int n_along, int n_other,
                   long in_sa, long in_so,
                   const double *lo, const double *hi, int hlen,
                   pdwt_real *out_lo, pdwt_real *out_hi, long out_sa, long out_so) {
  const int ne = n_along + (n_along % 2); /* virtual even extension */
  const int m = ne / 2;
  const int c = fwd_center(hlen);
  for (int r = 0; r < n_other; ++r) {
    const pdwt_real *row = in + (long)r * in_so;
    pdwt_real *olo = out_lo + (long)r * out_so;
    pdwt_real *ohi = out_hi + (long)r * out_so;
    for (int t = 0; t < m; ++t) {
      double acc_l = 0.0, acc_h = 0.0;
      for (int j = 0; j < hlen; ++j) {
        long idx = imod(2L * t - c + j, ne);
        if (idx >= n_along) idx = n_along - 1; /* repeat last element */
        double v = row[idx * in_sa];
        acc_l += lo[hlen - 1 - j] * v;
        acc_h += hi[hlen - 1 - j] * v;
      }
      olo[t * out_sa] = (pdwt_real)acc_l;
      ohi[t * out_sa] = (pdwt_real)acc_h;
    }
  }
}

/* Generic strided single-axis decimated synthesis: combine lo/hi lines of
 * length m into out lines of length out_len (2m-1 or 2m). */
void synthesis_axis(const pdwt_real *lo_in, const pdwt_real *hi_in, int m,
                    int n_other, long in_sa, long in_so,
                    const double *rec_lo, const double *rec_hi, int hlen,
                    int out_len, pdwt_real *out, long out_sa, long out_so) {
  const int s = inv_shift(hlen);
  const long two_m = 2L * m;
  for (int r = 0; r < n_other; ++r) {
    const pdwt_real *rl = lo_in + (long)r * in_so;
    const pdwt_real *rh = hi_in + (long)r * in_so;
    pdwt_real *orow = out + (long)r * out_so;
    for (int g = 0; g < out_len; ++g) {
      double acc = 0.0;
      for (int j = 0; j < hlen; ++j) {
        long u = imod((long)g - s + j, two_m);
        if (u % 2 == 0) { /* zero-stuffed: odd positions are zero */
          long t = u / 2;
          acc += rec_lo[hlen - 1 - j] * rl[t * in_sa] +
                 rec_hi[hlen - 1 - j] * rh[t * in_sa];
        }
      }
      orow[g * out_sa] = (pdwt_real)acc;
    }
  }
}

/* A-trous analysis along one axis at dilation f (full size, periodic). */
void swt_analysis_axis(const pdwt_real *in, int n_along, int n_other,
                       long in_sa, long in_so,
                       const double *lo, const double *hi, int hlen, int f,
                       pdwt_real *out_lo, pdwt_real *out_hi, long out_sa,
                       long out_so) {
  const long c = (long)fwd_center(hlen) * f;
  for (int r = 0; r < n_other; ++r) {
    const pdwt_real *row = in + (long)r * in_so;
    pdwt_real *olo = out_lo + (long)r * out_so;
    pdwt_real *ohi = out_hi + (long)r * out_so;
    for (int t = 0; t < n_along; ++t) {
      double acc_l = 0.0, acc_h = 0.0;
      for (int j = 0; j < hlen; ++j) {
        long idx = imod((long)t - c + (long)f * j, n_along);
        double v = row[idx * in_sa];
        acc_l += lo[hlen - 1 - j] * v;
        acc_h += hi[hlen - 1 - j] * v;
      }
      olo[t * out_sa] = (pdwt_real)acc_l;
      ohi[t * out_sa] = (pdwt_real)acc_h;
    }
  }
}

/* A-trous synthesis along one axis (1/2 factor folded in). */
void swt_synthesis_axis(const pdwt_real *lo_in, const pdwt_real *hi_in, int n_along,
                        int n_other, long in_sa, long in_so,
                        const double *rec_lo, const double *rec_hi, int hlen,
                        int f, pdwt_real *out, long out_sa, long out_so) {
  const long c = (long)(hlen / 2) * f;
  for (int r = 0; r < n_other; ++r) {
    const pdwt_real *rl = lo_in + (long)r * in_so;
    const pdwt_real *rh = hi_in + (long)r * in_so;
    pdwt_real *orow = out + (long)r * out_so;
    for (int t = 0; t < n_along; ++t) {
      double acc = 0.0;
      for (int j = 0; j < hlen; ++j) {
        long idx = imod((long)t - c + (long)f * j, n_along);
        acc += rec_lo[hlen - 1 - j] * rl[idx * in_sa] +
               rec_hi[hlen - 1 - j] * rh[idx * in_sa];
      }
      orow[t * out_sa] = (pdwt_real)(0.5 * acc);
    }
  }
}

} // namespace

extern "C" {

int pdwt_div2(int n) { return (n + 1) / 2; }

int pdwt_max_level(int min_dim, int hlen) {
  int v = (hlen > 1) ? min_dim / (hlen - 1) : min_dim;
  int l = 0;
  while (v >= 2) {
    v >>= 1;
    ++l;
  }
  return l;
}

int pdwt_dwt1_level(const pdwt_real *x, int batch, int n, const double *dec_lo,
                    const double *dec_hi, int hlen, pdwt_real *out_lo,
                    pdwt_real *out_hi) {
  if (!x || !out_lo || !out_hi || n < 1 || batch < 1 || hlen < 2) return 1;
  analysis_axis(x, n, batch, 1, n, dec_lo, dec_hi, hlen, out_lo, out_hi, 1,
                pdwt_div2(n));
  return 0;
}

int pdwt_idwt1_level(const pdwt_real *lo, const pdwt_real *hi, int batch, int m,
                     const double *rec_lo, const double *rec_hi, int hlen,
                     int out_len, pdwt_real *out) {
  if (!lo || !hi || !out || m < 1 || batch < 1) return 1;
  if (out_len != 2 * m && out_len != 2 * m - 1) return 2;
  synthesis_axis(lo, hi, m, batch, 1, m, rec_lo, rec_hi, hlen, out_len, out,
                 1, out_len);
  return 0;
}

int pdwt_swt1_level(const pdwt_real *x, int batch, int n, const double *dec_lo,
                    const double *dec_hi, int hlen, int level, pdwt_real *out_lo,
                    pdwt_real *out_hi) {
  if (!x || !out_lo || !out_hi || level < 1) return 1;
  swt_analysis_axis(x, n, batch, 1, n, dec_lo, dec_hi, hlen, 1 << (level - 1),
                    out_lo, out_hi, 1, n);
  return 0;
}

int pdwt_iswt1_level(const pdwt_real *lo, const pdwt_real *hi, int batch, int n,
                     const double *rec_lo, const double *rec_hi, int hlen,
                     int level, pdwt_real *out) {
  if (!lo || !hi || !out || level < 1) return 1;
  swt_synthesis_axis(lo, hi, n, batch, 1, n, rec_lo, rec_hi, hlen,
                     1 << (level - 1), out, 1, n);
  return 0;
}

int pdwt_forward2d(const pdwt_real *img, int nr, int nc, const double *dec_lo,
                   const double *dec_hi, int hlen, int levels, int swt,
                   pdwt_real **coeffs) {
  if (!img || !coeffs || levels < 1) return 1;
  std::vector<pdwt_real> a(img, img + (long)nr * nc);
  int r = nr, c = nc;
  for (int l = 1; l <= levels; ++l) {
    if (!swt) {
      const int c2 = pdwt_div2(c), r2 = pdwt_div2(r);
      /* pass 1 along columns (x), decimate cols */
      std::vector<pdwt_real> tlo((long)r * c2), thi((long)r * c2);
      analysis_axis(a.data(), c, r, 1, c, dec_lo, dec_hi, hlen, tlo.data(),
                    thi.data(), 1, c2);
      /* pass 2 along rows (y), decimate rows; strided axis = rows */
      std::vector<pdwt_real> anew((long)r2 * c2);
      pdwt_real *H = coeffs[3 * (l - 1) + 1];
      pdwt_real *V = coeffs[3 * (l - 1) + 2];
      pdwt_real *D = coeffs[3 * (l - 1) + 3];
      analysis_axis(tlo.data(), r, c2, c2, 1, dec_lo, dec_hi, hlen,
                    anew.data(), H, c2, 1);
      analysis_axis(thi.data(), r, c2, c2, 1, dec_lo, dec_hi, hlen, V, D, c2,
                    1);
      a.swap(anew);
      r = r2;
      c = c2;
    } else {
      const int f = 1 << (l - 1);
      std::vector<pdwt_real> tlo((long)r * c), thi((long)r * c);
      swt_analysis_axis(a.data(), c, r, 1, c, dec_lo, dec_hi, hlen, f,
                        tlo.data(), thi.data(), 1, c);
      std::vector<pdwt_real> anew((long)r * c);
      pdwt_real *H = coeffs[3 * (l - 1) + 1];
      pdwt_real *V = coeffs[3 * (l - 1) + 2];
      pdwt_real *D = coeffs[3 * (l - 1) + 3];
      swt_analysis_axis(tlo.data(), r, c, c, 1, dec_lo, dec_hi, hlen, f,
                        anew.data(), H, c, 1);
      swt_analysis_axis(thi.data(), r, c, c, 1, dec_lo, dec_hi, hlen, f, V, D,
                        c, 1);
      a.swap(anew);
    }
  }
  std::memcpy(coeffs[0], a.data(), a.size() * sizeof(pdwt_real));
  return 0;
}

int pdwt_inverse2d(pdwt_real *const *coeffs, int nr, int nc, const double *rec_lo,
                   const double *rec_hi, int hlen, int levels, int swt,
                   pdwt_real *img_out) {
  if (!coeffs || !img_out || levels < 1) return 1;
  /* per-level size tables (top size first) */
  std::vector<int> rs(levels + 1), cs(levels + 1);
  rs[0] = nr;
  cs[0] = nc;
  for (int i = 1; i <= levels; ++i) {
    rs[i] = swt ? nr : pdwt_div2(rs[i - 1]);
    cs[i] = swt ? nc : pdwt_div2(cs[i - 1]);
  }
  std::vector<pdwt_real> a(coeffs[0],
                       coeffs[0] + (long)rs[levels] * cs[levels]);
  for (int l = levels; l >= 1; --l) {
    const int mr = rs[l], mc = cs[l];       /* subband size at this level */
    const int orr = rs[l - 1], oc = cs[l - 1]; /* output size */
    const pdwt_real *H = coeffs[3 * (l - 1) + 1];
    const pdwt_real *V = coeffs[3 * (l - 1) + 2];
    const pdwt_real *D = coeffs[3 * (l - 1) + 3];
    if (!swt) {
      /* pass 1: combine (A,H) and (V,D) along rows (y) -> t1, t2 */
      std::vector<pdwt_real> t1((long)orr * mc), t2((long)orr * mc);
      synthesis_axis(a.data(), H, mr, mc, mc, 1, rec_lo, rec_hi, hlen, orr,
                     t1.data(), mc, 1);
      synthesis_axis(V, D, mr, mc, mc, 1, rec_lo, rec_hi, hlen, orr,
                     t2.data(), mc, 1);
      /* pass 2: combine (t1,t2) along columns (x) */
      std::vector<pdwt_real> anew((long)orr * oc);
      synthesis_axis(t1.data(), t2.data(), mc, orr, 1, mc, rec_lo, rec_hi,
                     hlen, oc, anew.data(), 1, oc);
      a.swap(anew);
    } else {
      const int f = 1 << (l - 1);
      std::vector<pdwt_real> t1((long)orr * mc), t2((long)orr * mc);
      swt_synthesis_axis(a.data(), H, mr, mc, mc, 1, rec_lo, rec_hi, hlen, f,
                         t1.data(), mc, 1);
      swt_synthesis_axis(V, D, mr, mc, mc, 1, rec_lo, rec_hi, hlen, f,
                         t2.data(), mc, 1);
      std::vector<pdwt_real> anew((long)orr * oc);
      swt_synthesis_axis(t1.data(), t2.data(), mc, orr, 1, mc, rec_lo, rec_hi,
                         hlen, f, anew.data(), 1, oc);
      a.swap(anew);
    }
  }
  std::memcpy(img_out, a.data(), (long)nr * nc * sizeof(pdwt_real));
  return 0;
}

int pdwt_forward1d(const pdwt_real *x, int batch, int n, const double *dec_lo,
                   const double *dec_hi, int hlen, int levels, int swt,
                   pdwt_real **coeffs) {
  if (!x || !coeffs || levels < 1) return 1;
  std::vector<pdwt_real> a(x, x + (long)batch * n);
  int m = n;
  for (int l = 1; l <= levels; ++l) {
    if (!swt) {
      const int m2 = pdwt_div2(m);
      std::vector<pdwt_real> anew((long)batch * m2);
      analysis_axis(a.data(), m, batch, 1, m, dec_lo, dec_hi, hlen,
                    anew.data(), coeffs[l], 1, m2);
      a.swap(anew);
      m = m2;
    } else {
      std::vector<pdwt_real> anew((long)batch * m);
      swt_analysis_axis(a.data(), m, batch, 1, m, dec_lo, dec_hi, hlen,
                        1 << (l - 1), anew.data(), coeffs[l], 1, m);
      a.swap(anew);
    }
  }
  std::memcpy(coeffs[0], a.data(), a.size() * sizeof(pdwt_real));
  return 0;
}

int pdwt_inverse1d(pdwt_real *const *coeffs, int batch, int n,
                   const double *rec_lo, const double *rec_hi, int hlen,
                   int levels, int swt, pdwt_real *out) {
  if (!coeffs || !out || levels < 1) return 1;
  std::vector<int> sz(levels + 1);
  sz[0] = n;
  for (int i = 1; i <= levels; ++i) sz[i] = swt ? n : pdwt_div2(sz[i - 1]);
  std::vector<pdwt_real> a(coeffs[0], coeffs[0] + (long)batch * sz[levels]);
  for (int l = levels; l >= 1; --l) {
    const int m = sz[l], ol = sz[l - 1];
    std::vector<pdwt_real> anew((long)batch * ol);
    if (!swt) {
      synthesis_axis(a.data(), coeffs[l], m, batch, 1, m, rec_lo, rec_hi,
                     hlen, ol, anew.data(), 1, ol);
    } else {
      swt_synthesis_axis(a.data(), coeffs[l], m, batch, 1, m, rec_lo, rec_hi,
                         hlen, 1 << (l - 1), anew.data(), 1, ol);
    }
    a.swap(anew);
  }
  std::memcpy(out, a.data(), (long)batch * n * sizeof(pdwt_real));
  return 0;
}

void pdwt_soft_threshold(pdwt_real *x, long n, pdwt_real beta) {
  for (long i = 0; i < n; ++i) {
    pdwt_real v = x[i];
    pdwt_real m = std::fabs(v) - beta;
    x[i] = (m > 0.f) ? (v < 0.f ? -m : m) : 0.f;
  }
}

void pdwt_hard_threshold(pdwt_real *x, long n, pdwt_real beta) {
  for (long i = 0; i < n; ++i)
    if (std::fabs(x[i]) <= beta) x[i] = 0.f;
}

void pdwt_garrote_threshold(pdwt_real *x, long n, pdwt_real beta) {
  for (long i = 0; i < n; ++i) {
    pdwt_real v = x[i];
    x[i] = (v * v > beta * beta) ? v - beta * beta / v : (pdwt_real)0;
  }
}

void pdwt_firm_threshold(pdwt_real *x, long n, pdwt_real b1, pdwt_real b2) {
  for (long i = 0; i < n; ++i) {
    pdwt_real v = x[i], a = std::fabs(v);
    if (a <= b1)
      x[i] = 0;
    else if (a < b2)
      x[i] = (v < 0 ? (pdwt_real)-1 : (pdwt_real)1)
             * b2 * (a - b1) / (b2 - b1);
  }
}

void pdwt_proj_linf(pdwt_real *x, long n, pdwt_real beta) {
  for (long i = 0; i < n; ++i) {
    pdwt_real v = x[i];
    pdwt_real m = std::fabs(v) < beta ? std::fabs(v) : beta;
    x[i] = v < 0.f ? -m : m;
  }
}

double pdwt_norm1(const pdwt_real *x, long n) {
  double s = 0.0;
  for (long i = 0; i < n; ++i) s += std::fabs((double)x[i]);
  return s;
}

double pdwt_norm2sq(const pdwt_real *x, long n) {
  double s = 0.0;
  for (long i = 0; i < n; ++i) s += (double)x[i] * (double)x[i];
  return s;
}

int pdwt_circshift2d(const pdwt_real *in, pdwt_real *out, int nr, int nc, int sr,
                     int sc) {
  if (!in || !out || in == out) return 1;
  for (int r = 0; r < nr; ++r) {
    const int r2 = (int)imod(r + sr, nr);
    for (int c = 0; c < nc; ++c)
      out[(long)r2 * nc + imod(c + sc, nc)] = in[(long)r * nc + c];
  }
  return 0;
}

} /* extern "C" */

/* ------------------------------------------------------------------ */
/* non-separable 2D engine                                            */
/* ------------------------------------------------------------------ */

namespace {

inline int inv_shift_ns(int hlen) {
  int h2 = hlen / 2, c2 = h2 / 2;
  return (h2 % 2) ? 2 * c2 + 1 : 2 * c2;
}

/* one forward level: 2D periodic correlation with 4 quads + 2x2 decim
 * (or a-trous at dilation f).  in: (r, c); outs: 4 buffers. */
void ns_fwd_level(const pdwt_real *in, int r, int c, const double *quads,
                  int hlen, int f, int decim, pdwt_real **outs) {
  const int re = decim ? r + (r % 2) : r;
  const int ce = decim ? c + (c % 2) : c;
  const int mr = decim ? re / 2 : r;
  const int mc = decim ? ce / 2 : c;
  const long qsz = (long)hlen * hlen;
  const int cen = fwd_center(hlen) * f;
  for (int m = 0; m < mr; ++m) {
    for (int n = 0; n < mc; ++n) {
      double acc[4] = {0, 0, 0, 0};
      for (int j = 0; j < hlen; ++j) {
        long ri = imod((decim ? 2L * m : (long)m) - cen + (long)f * j, re);
        if (ri >= r) ri = r - 1; /* odd virtual extension */
        for (int k = 0; k < hlen; ++k) {
          long ci = imod((decim ? 2L * n : (long)n) - cen + (long)f * k, ce);
          if (ci >= c) ci = c - 1;
          const double v = in[ri * c + ci];
          const long qi = (long)(hlen - 1 - j) * hlen + (hlen - 1 - k);
          acc[0] += quads[0 * qsz + qi] * v;
          acc[1] += quads[1 * qsz + qi] * v;
          acc[2] += quads[2 * qsz + qi] * v;
          acc[3] += quads[3 * qsz + qi] * v;
        }
      }
      for (int b = 0; b < 4; ++b) outs[b][(long)m * mc + n] = (pdwt_real)acc[b];
    }
  }
}

/* one inverse level (decimated): 2D zero-stuffed polyphase. */
void ns_inv_level(pdwt_real *const *bands, int mr, int mc, const double *quads,
                  int hlen, int orr, int oc, pdwt_real *out) {
  const int s = inv_shift_ns(hlen);
  const long qsz = (long)hlen * hlen;
  const long tr = 2L * mr, tc = 2L * mc;
  for (int g1 = 0; g1 < orr; ++g1) {
    for (int g2 = 0; g2 < oc; ++g2) {
      double acc = 0.0;
      for (int j = 0; j < hlen; ++j) {
        long u1 = imod((long)g1 - s + j, tr);
        if (u1 % 2) continue;
        const long t1 = u1 / 2;
        for (int k = 0; k < hlen; ++k) {
          long u2 = imod((long)g2 - s + k, tc);
          if (u2 % 2) continue;
          const long t2 = u2 / 2;
          const long qi = (long)(hlen - 1 - j) * hlen + (hlen - 1 - k);
          const long ti = t1 * mc + t2;
          acc += quads[0 * qsz + qi] * bands[0][ti] +
                 quads[1 * qsz + qi] * bands[1][ti] +
                 quads[2 * qsz + qi] * bands[2][ti] +
                 quads[3 * qsz + qi] * bands[3][ti];
        }
      }
      out[(long)g1 * oc + g2] = (pdwt_real)acc;
    }
  }
}

/* one inverse level (a-trous): dilated correlation, 1/4 factor. */
void ns_inv_swt_level(pdwt_real *const *bands, int r, int c, const double *quads,
                      int hlen, int f, pdwt_real *out) {
  const long qsz = (long)hlen * hlen;
  const long cen = (long)(hlen / 2) * f;
  for (int g1 = 0; g1 < r; ++g1) {
    for (int g2 = 0; g2 < c; ++g2) {
      double acc = 0.0;
      for (int j = 0; j < hlen; ++j) {
        const long t1 = imod((long)g1 - cen + (long)f * j, r);
        for (int k = 0; k < hlen; ++k) {
          const long t2 = imod((long)g2 - cen + (long)f * k, c);
          const long qi = (long)(hlen - 1 - j) * hlen + (hlen - 1 - k);
          const long ti = t1 * c + t2;
          acc += quads[0 * qsz + qi] * bands[0][ti] +
                 quads[1 * qsz + qi] * bands[1][ti] +
                 quads[2 * qsz + qi] * bands[2][ti] +
                 quads[3 * qsz + qi] * bands[3][ti];
        }
      }
      out[(long)g1 * c + g2] = (pdwt_real)(0.25 * acc);
    }
  }
}

} // namespace

extern "C" {

int pdwt_forward2d_ns(const pdwt_real *img, int nr, int nc, const double *quads,
                      int hlen, int levels, int swt, pdwt_real **coeffs) {
  if (!img || !quads || !coeffs || levels < 1) return 1;
  std::vector<pdwt_real> a(img, img + (long)nr * nc);
  int r = nr, c = nc;
  for (int l = 1; l <= levels; ++l) {
    const int f = swt ? (1 << (l - 1)) : 1;
    const int mr = swt ? r : pdwt_div2(r);
    const int mc = swt ? c : pdwt_div2(c);
    std::vector<pdwt_real> anew((long)mr * mc);
    pdwt_real *outs[4] = {anew.data(), coeffs[3 * (l - 1) + 1],
                      coeffs[3 * (l - 1) + 2], coeffs[3 * (l - 1) + 3]};
    ns_fwd_level(a.data(), r, c, quads, hlen, f, swt ? 0 : 1, outs);
    a.swap(anew);
    r = mr;
    c = mc;
  }
  std::memcpy(coeffs[0], a.data(), a.size() * sizeof(pdwt_real));
  return 0;
}

int pdwt_inverse2d_ns(pdwt_real *const *coeffs, int nr, int nc,
                      const double *quads_inv, int hlen, int levels, int swt,
                      pdwt_real *img_out) {
  if (!coeffs || !quads_inv || !img_out || levels < 1) return 1;
  std::vector<int> rs(levels + 1), cs(levels + 1);
  rs[0] = nr;
  cs[0] = nc;
  for (int i = 1; i <= levels; ++i) {
    rs[i] = swt ? nr : pdwt_div2(rs[i - 1]);
    cs[i] = swt ? nc : pdwt_div2(cs[i - 1]);
  }
  std::vector<pdwt_real> a(coeffs[0], coeffs[0] + (long)rs[levels] * cs[levels]);
  for (int l = levels; l >= 1; --l) {
    std::vector<pdwt_real> anew((long)rs[l - 1] * cs[l - 1]);
    pdwt_real *bands[4] = {a.data(), coeffs[3 * (l - 1) + 1],
                       coeffs[3 * (l - 1) + 2], coeffs[3 * (l - 1) + 3]};
    if (!swt) {
      ns_inv_level(bands, rs[l], cs[l], quads_inv, hlen, rs[l - 1],
                   cs[l - 1], anew.data());
    } else {
      ns_inv_swt_level(bands, rs[l], cs[l], quads_inv, hlen, 1 << (l - 1),
                       anew.data());
    }
    a.swap(anew);
  }
  std::memcpy(img_out, a.data(), (long)nr * nc * sizeof(pdwt_real));
  return 0;
}

void pdwt_shrink(pdwt_real *x, long n, pdwt_real beta) {
  const pdwt_real s = 1.0f / (1.0f + beta);
  for (long i = 0; i < n; ++i) x[i] *= s;
}

void pdwt_group_soft_threshold(pdwt_real *h, pdwt_real *v, pdwt_real *d, pdwt_real *a,
                               long n, pdwt_real beta) {
  for (long i = 0; i < n; ++i) {
    double n2 = (double)h[i] * h[i] + (double)v[i] * v[i] +
                (double)d[i] * d[i];
    if (a) n2 += (double)a[i] * a[i];
    const double norm = std::sqrt(n2);
    const double fac = norm > 0 ? std::max(1.0 - beta / norm, 0.0) : 0.0;
    h[i] = (pdwt_real)(h[i] * fac);
    v[i] = (pdwt_real)(v[i] * fac);
    d[i] = (pdwt_real)(d[i] * fac);
    if (a) a[i] = (pdwt_real)(a[i] * fac);
  }
}

void pdwt_axpy(pdwt_real *y, const pdwt_real *x, long n, pdwt_real alpha) {
  for (long i = 0; i < n; ++i) y[i] += alpha * x[i];
}

double pdwt_norm_l21(const pdwt_real *h, const pdwt_real *v,
                     const pdwt_real *d, const pdwt_real *a, long n) {
  double s = 0.0;
  for (long i = 0; i < n; ++i) {
    double n2 = (double)h[i] * h[i] + (double)v[i] * v[i] +
                (double)d[i] * d[i];
    if (a) n2 += (double)a[i] * a[i];
    s += std::sqrt(n2);
  }
  return s;
}

} /* extern "C" */

/* --------------------------------------------------------------------------
 * 3D separable transforms (no reference counterpart: its README lists
 * "3D is not handled at the moment" as the first limitation).  Same
 * single-axis index semantics as the 1D/2D drivers, applied along
 * columns, rows, then depth; coefficient layout matches the Python
 * engine: coeffs[0] = A, then per level the 7 bands in channel order
 * ch = 4*k_col + 2*k_row + k_dep (daa, ada, dda, aad, dad, add, ddd).
 * -------------------------------------------------------------------------- */

extern "C" {

int pdwt_forward3d(const pdwt_real *vol, int nd, int nr, int nc,
                   const double *dec_lo, const double *dec_hi, int hlen,
                   int levels, int swt, pdwt_real **coeffs) {
  if (!vol || !coeffs || levels < 1) return 1;
  std::vector<pdwt_real> a(vol, vol + (long)nd * nr * nc);
  int d = nd, r = nr, c = nc;
  for (int l = 1; l <= levels; ++l) {
    const int f = 1 << (l - 1);
    const int c2 = swt ? c : pdwt_div2(c);
    const int r2 = swt ? r : pdwt_div2(r);
    const int d2 = swt ? d : pdwt_div2(d);
    /* pass 1 along columns (x): (d, r, c) -> 2 x (d, r, c2) */
    std::vector<pdwt_real> tlo((long)d * r * c2), thi((long)d * r * c2);
    if (!swt)
      analysis_axis(a.data(), c, d * r, 1, c, dec_lo, dec_hi, hlen,
                    tlo.data(), thi.data(), 1, c2);
    else
      swt_analysis_axis(a.data(), c, d * r, 1, c, dec_lo, dec_hi, hlen, f,
                        tlo.data(), thi.data(), 1, c2);
    /* pass 2 along rows (y), one depth slice at a time:
     * 2 x (d, r, c2) -> 4 x (d, r2, c2) */
    std::vector<pdwt_real> ll((long)d * r2 * c2), lh((long)d * r2 * c2),
        hl((long)d * r2 * c2), hh((long)d * r2 * c2);
    for (int k = 0; k < d; ++k) {
      const long in_off = (long)k * r * c2;
      const long out_off = (long)k * r2 * c2;
      if (!swt) {
        analysis_axis(tlo.data() + in_off, r, c2, c2, 1, dec_lo, dec_hi,
                      hlen, ll.data() + out_off, lh.data() + out_off, c2, 1);
        analysis_axis(thi.data() + in_off, r, c2, c2, 1, dec_lo, dec_hi,
                      hlen, hl.data() + out_off, hh.data() + out_off, c2, 1);
      } else {
        swt_analysis_axis(tlo.data() + in_off, r, c2, c2, 1, dec_lo, dec_hi,
                          hlen, f, ll.data() + out_off, lh.data() + out_off,
                          c2, 1);
        swt_analysis_axis(thi.data() + in_off, r, c2, c2, 1, dec_lo, dec_hi,
                          hlen, f, hl.data() + out_off, hh.data() + out_off,
                          c2, 1);
      }
    }
    /* pass 3 along depth (z): 4 x (d, r2, c2) -> A + 7 bands, each
     * (d2, r2, c2); lines = the r2*c2 pixels (stride 1 between lines,
     * r2*c2 along the axis). */
    std::vector<pdwt_real> anew((long)d2 * r2 * c2);
    pdwt_real **b = coeffs + 7 * (l - 1);
    const long plane = (long)r2 * c2;
    if (!swt) {
      analysis_axis(ll.data(), d, (int)plane, plane, 1, dec_lo, dec_hi,
                    hlen, anew.data(), b[1], plane, 1);
      analysis_axis(lh.data(), d, (int)plane, plane, 1, dec_lo, dec_hi,
                    hlen, b[2], b[3], plane, 1);
      analysis_axis(hl.data(), d, (int)plane, plane, 1, dec_lo, dec_hi,
                    hlen, b[4], b[5], plane, 1);
      analysis_axis(hh.data(), d, (int)plane, plane, 1, dec_lo, dec_hi,
                    hlen, b[6], b[7], plane, 1);
    } else {
      swt_analysis_axis(ll.data(), d, (int)plane, plane, 1, dec_lo, dec_hi,
                        hlen, f, anew.data(), b[1], plane, 1);
      swt_analysis_axis(lh.data(), d, (int)plane, plane, 1, dec_lo, dec_hi,
                        hlen, f, b[2], b[3], plane, 1);
      swt_analysis_axis(hl.data(), d, (int)plane, plane, 1, dec_lo, dec_hi,
                        hlen, f, b[4], b[5], plane, 1);
      swt_analysis_axis(hh.data(), d, (int)plane, plane, 1, dec_lo, dec_hi,
                        hlen, f, b[6], b[7], plane, 1);
    }
    a.swap(anew);
    d = d2;
    r = r2;
    c = c2;
  }
  std::memcpy(coeffs[0], a.data(), a.size() * sizeof(pdwt_real));
  return 0;
}

int pdwt_inverse3d(pdwt_real *const *coeffs, int nd, int nr, int nc,
                   const double *rec_lo, const double *rec_hi, int hlen,
                   int levels, int swt, pdwt_real *out) {
  if (!coeffs || !out || levels < 1) return 1;
  std::vector<int> ds(levels + 1), rs(levels + 1), cs(levels + 1);
  ds[0] = nd;
  rs[0] = nr;
  cs[0] = nc;
  for (int i = 1; i <= levels; ++i) {
    ds[i] = swt ? nd : pdwt_div2(ds[i - 1]);
    rs[i] = swt ? nr : pdwt_div2(rs[i - 1]);
    cs[i] = swt ? nc : pdwt_div2(cs[i - 1]);
  }
  std::vector<pdwt_real> a(coeffs[0],
                           coeffs[0] + (long)ds[levels] * rs[levels] *
                               cs[levels]);
  for (int l = levels; l >= 1; --l) {
    const int f = 1 << (l - 1);
    const int md = ds[l], mr = rs[l], mc = cs[l];
    const int od = ds[l - 1], orr = rs[l - 1], oc = cs[l - 1];
    pdwt_real *const *b = coeffs + 7 * (l - 1);
    const long plane = (long)mr * mc;
    /* pass 1: depth synthesis — (A,b1)->ll, (b2,b3)->lh, (b4,b5)->hl,
     * (b6,b7)->hh, each (od, mr, mc). */
    std::vector<pdwt_real> ll((long)od * plane), lh((long)od * plane),
        hl((long)od * plane), hh((long)od * plane);
    if (!swt) {
      synthesis_axis(a.data(), b[1], md, (int)plane, plane, 1, rec_lo,
                     rec_hi, hlen, od, ll.data(), plane, 1);
      synthesis_axis(b[2], b[3], md, (int)plane, plane, 1, rec_lo, rec_hi,
                     hlen, od, lh.data(), plane, 1);
      synthesis_axis(b[4], b[5], md, (int)plane, plane, 1, rec_lo, rec_hi,
                     hlen, od, hl.data(), plane, 1);
      synthesis_axis(b[6], b[7], md, (int)plane, plane, 1, rec_lo, rec_hi,
                     hlen, od, hh.data(), plane, 1);
    } else {
      swt_synthesis_axis(a.data(), b[1], md, (int)plane, plane, 1, rec_lo,
                         rec_hi, hlen, f, ll.data(), plane, 1);
      swt_synthesis_axis(b[2], b[3], md, (int)plane, plane, 1, rec_lo,
                         rec_hi, hlen, f, lh.data(), plane, 1);
      swt_synthesis_axis(b[4], b[5], md, (int)plane, plane, 1, rec_lo,
                         rec_hi, hlen, f, hl.data(), plane, 1);
      swt_synthesis_axis(b[6], b[7], md, (int)plane, plane, 1, rec_lo,
                         rec_hi, hlen, f, hh.data(), plane, 1);
    }
    /* pass 2: row synthesis per depth slice — (ll,lh)->tl, (hl,hh)->th */
    std::vector<pdwt_real> tl((long)od * orr * mc), th((long)od * orr * mc);
    for (int k = 0; k < od; ++k) {
      const long in_off = (long)k * plane;
      const long out_off = (long)k * orr * mc;
      if (!swt) {
        synthesis_axis(ll.data() + in_off, lh.data() + in_off, mr, mc, mc, 1,
                       rec_lo, rec_hi, hlen, orr, tl.data() + out_off, mc, 1);
        synthesis_axis(hl.data() + in_off, hh.data() + in_off, mr, mc, mc, 1,
                       rec_lo, rec_hi, hlen, orr, th.data() + out_off, mc, 1);
      } else {
        swt_synthesis_axis(ll.data() + in_off, lh.data() + in_off, mr, mc,
                           mc, 1, rec_lo, rec_hi, hlen, f,
                           tl.data() + out_off, mc, 1);
        swt_synthesis_axis(hl.data() + in_off, hh.data() + in_off, mr, mc,
                           mc, 1, rec_lo, rec_hi, hlen, f,
                           th.data() + out_off, mc, 1);
      }
    }
    /* pass 3: column synthesis — (tl,th) -> (od, orr, oc) */
    std::vector<pdwt_real> anew((long)od * orr * oc);
    if (!swt)
      synthesis_axis(tl.data(), th.data(), mc, od * orr, 1, mc, rec_lo,
                     rec_hi, hlen, oc, anew.data(), 1, oc);
    else
      swt_synthesis_axis(tl.data(), th.data(), mc, od * orr, 1, mc, rec_lo,
                         rec_hi, hlen, f, anew.data(), 1, oc);
    a.swap(anew);
  }
  std::memcpy(out, a.data(), (long)nd * nr * nc * sizeof(pdwt_real));
  return 0;
}

} /* extern "C" */
