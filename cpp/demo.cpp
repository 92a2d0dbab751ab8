/* demo — standalone CLI for the native CPU engine.
 *
 * Capability parity with the reference demo (/root/reference/src/demo.cpp:
 * raw .dat float I/O, three scenarios: forward-only, forward+inverse
 * perfect reconstruction, forward+soft-threshold+inverse), own design:
 * argv-only interface, built-in haar/db2/db3/db4 filters (the full
 * 72-wavelet bank lives in the Python package; custom filters can be
 * loaded from a .dat file of doubles [dec_lo dec_hi rec_lo rec_hi]).
 *
 * Usage:
 *   demo <image.dat> <Nr> <Nc> <scenario 1|2|3> [wavelet] [levels] [swt]
 *        [beta] [filter.dat hlen]
 */
#include "pdwt_cpu.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Bank {
  std::vector<double> lo, hi, ilo, ihi;
};

const double SQ2 = 0.7071067811865475244;

/* Minimal built-in filter set (values = standard published Daubechies
 * coefficients, same public tables the Python bank uses). */
Bank builtin(const std::string &name) {
  if (name == "haar" || name == "db1") {
    return {{SQ2, SQ2}, {-SQ2, SQ2}, {SQ2, SQ2}, {SQ2, -SQ2}};
  }
  if (name == "db2") {
    std::vector<double> lo = {-0.12940952255092145, 0.22414386804185735,
                              0.836516303737469, 0.48296291314469025};
    std::vector<double> hi = {-0.48296291314469025, 0.836516303737469,
                              -0.22414386804185735, -0.12940952255092145};
    std::vector<double> ilo(lo.rbegin(), lo.rend());
    std::vector<double> ihi(hi.rbegin(), hi.rend());
    return {lo, hi, ilo, ihi};
  }
  if (name == "db3") {
    std::vector<double> lo = {0.035226291882100656, -0.08544127388224149,
                              -0.13501102001039084, 0.4598775021193313,
                              0.8068915093133388,  0.3326705529509569};
    std::vector<double> hi(6);
    for (int i = 0; i < 6; ++i)
      hi[i] = (i % 2 ? -1 : 1) * lo[5 - i];
    std::vector<double> ilo(lo.rbegin(), lo.rend());
    std::vector<double> ihi(hi.rbegin(), hi.rend());
    return {lo, hi, ilo, ihi};
  }
  if (name == "db4") {
    std::vector<double> lo = {
        -0.010597401784997278, 0.032883011666982945, 0.030841381835986965,
        -0.18703481171888114,  -0.02798376941698385, 0.6308807679295904,
        0.7148465705525415,    0.23037781330885523};
    std::vector<double> hi(8);
    for (int i = 0; i < 8; ++i)
      hi[i] = (i % 2 ? -1 : 1) * lo[7 - i];
    std::vector<double> ilo(lo.rbegin(), lo.rend());
    std::vector<double> ihi(hi.rbegin(), hi.rend());
    return {lo, hi, ilo, ihi};
  }
  std::fprintf(stderr,
               "unknown wavelet '%s' (built-ins: haar db2 db3 db4; use the "
               "Python CLI for the full bank)\n",
               name.c_str());
  std::exit(2);
}

std::vector<float> read_dat(const char *path, long count) {
  FILE *f = std::fopen(path, "rb");
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path);
    std::exit(2);
  }
  std::vector<float> v(count);
  if (std::fread(v.data(), sizeof(float), count, f) != (size_t)count) {
    std::fprintf(stderr, "short read from %s\n", path);
    std::exit(2);
  }
  std::fclose(f);
  return v;
}

void write_dat(const char *path, const float *data, long count) {
  FILE *f = std::fopen(path, "wb");
  if (!f) {
    std::fprintf(stderr, "cannot open %s for writing\n", path);
    std::exit(2);
  }
  std::fwrite(data, sizeof(float), count, f);
  std::fclose(f);
}

} // namespace

int main(int argc, char **argv) {
  if (argc < 5) {
    std::fprintf(stderr,
                 "usage: %s <image.dat> <Nr> <Nc> <scenario 1|2|3> "
                 "[wavelet=haar] [levels=1] [swt=0] [beta=90]\n"
                 "  1: forward only (writes approx to res.dat)\n"
                 "  2: forward + inverse, perfect reconstruction\n"
                 "  3: forward + soft threshold(beta) + inverse\n",
                 argv[0]);
    return 1;
  }
  const char *path = argv[1];
  const int nr = std::atoi(argv[2]);
  const int nc = std::atoi(argv[3]);
  const int scenario = std::atoi(argv[4]);
  const std::string wname = argc > 5 ? argv[5] : "haar";
  int levels = argc > 6 ? std::atoi(argv[6]) : 1;
  const int swt = argc > 7 ? std::atoi(argv[7]) : 0;
  const float beta = argc > 8 ? (float)std::atof(argv[8]) : 90.f;

  Bank bank = builtin(wname);
  const int hlen = (int)bank.lo.size();
  const int maxlev = pdwt_max_level(nr < nc ? nr : nc, hlen);
  if (levels > maxlev) {
    std::fprintf(stderr, "clamping levels %d -> %d\n", levels, maxlev);
    levels = maxlev;
  }

  std::vector<float> img = read_dat(path, (long)nr * nc);

  /* allocate the coefficient buffers: [A_n, H1,V1,D1, ...] */
  std::vector<std::vector<float>> bufs;
  std::vector<float *> ptrs;
  {
    int r = nr, c = nc;
    std::vector<std::pair<int, int>> det;
    for (int l = 0; l < levels; ++l) {
      if (!swt) {
        r = pdwt_div2(r);
        c = pdwt_div2(c);
      }
      det.push_back({r, c});
    }
    bufs.emplace_back((long)det.back().first * det.back().second);
    for (auto &rc : det)
      for (int k = 0; k < 3; ++k)
        bufs.emplace_back((long)rc.first * rc.second);
    for (auto &b : bufs) ptrs.push_back(b.data());
  }

  int rc = pdwt_forward2d(img.data(), nr, nc, bank.lo.data(), bank.hi.data(),
                          hlen, levels, swt, ptrs.data());
  if (rc) {
    std::fprintf(stderr, "forward failed (%d)\n", rc);
    return 1;
  }
  std::printf("forward done: %s, %d level(s), %s\n", wname.c_str(), levels,
              swt ? "SWT" : "DWT");
  std::printf("norm1(coeffs) = %.6e\n", [&] {
    double s = 0;
    for (auto &b : bufs) s += pdwt_norm1(b.data(), (long)b.size());
    return s;
  }());

  if (scenario == 1) {
    write_dat("res.dat", ptrs[0], (long)bufs[0].size());
    std::printf("approximation written to res.dat (%zu floats)\n",
                bufs[0].size());
    return 0;
  }
  if (scenario == 3) {
    for (size_t i = 1; i < bufs.size(); ++i)
      pdwt_soft_threshold(bufs[i].data(), (long)bufs[i].size(), beta);
    std::printf("soft threshold beta=%.2f applied\n", beta);
  }

  std::vector<float> rec((long)nr * nc);
  rc = pdwt_inverse2d(ptrs.data(), nr, nc, bank.ilo.data(), bank.ihi.data(),
                      hlen, levels, swt, rec.data());
  if (rc) {
    std::fprintf(stderr, "inverse failed (%d)\n", rc);
    return 1;
  }
  double maxerr = 0;
  for (long i = 0; i < (long)nr * nc; ++i) {
    double e = std::abs((double)rec[i] - img[i]);
    if (e > maxerr) maxerr = e;
  }
  std::printf("max |reconstruction - input| = %.3e%s\n", maxerr,
              scenario == 3 ? " (thresholded: expected nonzero)" : "");
  write_dat("res.dat", rec.data(), (long)nr * nc);
  std::printf("result written to res.dat\n");
  return 0;
}
