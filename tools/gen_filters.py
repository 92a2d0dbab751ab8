#!/usr/bin/env python
"""Generate the wavelet filter-bank data file (pdwt_tpu/filters/_data.npz).

The coefficient *data* (public wavelet filter tables, originally published at
wavelets.pybytes.com and shipped by pywt) is extracted from the reference
implementation's data tables (reference: src/filters.cpp) and stored as a
binary npz keyed by wavelet name.  For each wavelet we store a (4, hlen)
float64 array with rows (dec_lo, dec_hi, rec_lo, rec_hi) — the forward
lowpass/highpass and inverse lowpass/highpass filters (reference:
src/filters.h:635-645 `wfilter{wname, hlen, f_l, f_h, i_l, i_h}`).

Every filter bank is validated before being written:
  * exact perfect reconstruction of a random signal through a float64
    single-level periodic DWT/IDWT using the derived index semantics
    (reference: src/separable.cu:91-131, 246-328);
  * for orthogonal families (db/sym/coif/haar): rec_lo == reverse(dec_lo),
    quadrature-mirror relation, unit L2 norm and sum(dec_lo) == sqrt(2).

Run:  python tools/gen_filters.py
"""
import os
import re
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REF_FILTERS = "/root/reference/src/filters.cpp"
OUT = os.path.join(HERE, "..", "pdwt_tpu", "filters", "_data.npz")

# Registry: canonical name -> (C symbol prefix, hlen). Mirrors the reference
# registry (src/filters.cpp:5919-6002), 72 wavelets total.
REGISTRY = {}
for k in range(2, 21):
    REGISTRY[f"db{k}"] = (f"DB{k}", 2 * k)
for k in range(2, 21):
    REGISTRY[f"sym{k}"] = (f"SYM{k}", 2 * k)
for k in range(1, 6):
    REGISTRY[f"coif{k}"] = (f"COIF{k}", 6 * k)
_BIOR = {
    "1.3": 6, "1.5": 10, "2.2": 6, "2.4": 10, "2.6": 14, "2.8": 18,
    "3.1": 4, "3.3": 8, "3.5": 12, "3.7": 16, "3.9": 20, "4.4": 10,
    "5.5": 12, "6.8": 18,
}
for nm, ln in _BIOR.items():
    REGISTRY[f"bior{nm}"] = ("BIOR" + nm.replace(".", "_"), ln)
for nm, ln in _BIOR.items():
    REGISTRY[f"rbio{nm}"] = ("RBIOR" + nm.replace(".", "_"), ln)
REGISTRY["haar"] = ("HAAR", 2)


def parse_tables(path):
    """Parse `DTYPE NAME[len] = { ... };` initializers into numpy arrays."""
    src = open(path).read()
    tables = {}
    for m in re.finditer(
        r"DTYPE\s+([A-Z0-9_]+)\s*\[\s*\d+\s*\]\s*=\s*\{([^}]*)\}", src
    ):
        name, body = m.group(1), m.group(2)
        vals = [float(v) for v in re.findall(r"[-+0-9.eE]+", body)]
        tables[name] = np.asarray(vals, dtype=np.float64)
    return tables


# ---------------------------------------------------------------------------
# float64 oracle single-level periodic DWT/IDWT (independent derivation of the
# index semantics; see pdwt_tpu/core docs). Used here only for validation.
# ---------------------------------------------------------------------------

def _fwd_center(hlen):
    return hlen // 2 if hlen % 2 else hlen // 2 - 1


def _inv_shift(hlen):
    h2 = hlen // 2
    c2 = h2 // 2
    return 2 * c2 + 1 if h2 % 2 else 2 * c2


def dwt1_oracle(x, dec_lo, dec_hi):
    n = x.shape[-1]
    if n % 2:
        x = np.concatenate([x, x[..., -1:]], axis=-1)
    ne = x.shape[-1]
    hlen = len(dec_lo)
    c = _fwd_center(hlen)
    idx = (2 * np.arange(ne // 2)[:, None] - c + np.arange(hlen)[None, :]) % ne
    win = x[..., idx]
    lo = win @ dec_lo[::-1].copy()
    hi = win @ dec_hi[::-1].copy()
    return lo, hi


def idwt1_oracle(lo, hi, rec_lo, rec_hi, out_len):
    m = lo.shape[-1]
    hlen = len(rec_lo)
    s = _inv_shift(hlen)
    u_lo = np.zeros(lo.shape[:-1] + (2 * m,))
    u_hi = np.zeros_like(u_lo)
    u_lo[..., ::2] = lo
    u_hi[..., ::2] = hi
    idx = (np.arange(2 * m)[:, None] - s + np.arange(hlen)[None, :]) % (2 * m)
    out = u_lo[..., idx] @ rec_lo[::-1].copy() + u_hi[..., idx] @ rec_hi[::-1].copy()
    return out[..., :out_len]


def validate(name, bank):
    dec_lo, dec_hi, rec_lo, rec_hi = bank
    rng = np.random.default_rng(0)
    ok = True
    for n in (64, 65, 37):
        if n < 2 * len(dec_lo):
            continue
        x = rng.standard_normal(n)
        lo, hi = dwt1_oracle(x, dec_lo, dec_hi)
        xr = idwt1_oracle(lo, hi, rec_lo, rec_hi, n)
        # The published tables are rounded (coif5 only carries ~8 significant
        # digits, like pywt's own tables), so PR holds to ~1e-7, not 1e-15.
        err = np.abs(xr - x).max()
        if err > 1e-7:
            print(f"  !! {name}: PR error {err:.3e} at n={n}")
            ok = False
    if name.startswith(("db", "sym", "coif")) or name == "haar":
        if not np.allclose(rec_lo, dec_lo[::-1], atol=1e-15):
            print(f"  !! {name}: rec_lo != reverse(dec_lo)")
            ok = False
        if abs(dec_lo.sum() - np.sqrt(2)) > 1e-7 or abs(dec_lo @ dec_lo - 1) > 1e-7:
            print(f"  !! {name}: not orthonormal")
            ok = False
    return ok


def main():
    tables = parse_tables(REF_FILTERS)
    out = {}
    bad = []
    for name, (sym, hlen) in sorted(REGISTRY.items()):
        key_l = f"{sym}_L"
        key_il = f"{sym}_I_L"
        dec_lo = tables[key_l][:hlen]
        dec_hi = tables[f"{sym}_H"][:hlen]
        rec_lo = tables[key_il][:hlen]
        rec_hi = tables[f"{sym}_I_H"][:hlen]
        bank = np.stack([dec_lo, dec_hi, rec_lo, rec_hi])
        assert bank.shape == (4, hlen), (name, bank.shape)
        if not validate(name, bank):
            bad.append(name)
        out[name] = bank
    assert len(out) == 72, len(out)
    if bad:
        print("validation FAILED for:", bad)
        sys.exit(1)
    np.savez_compressed(OUT, **out)
    print(f"wrote {len(out)} wavelets -> {OUT}")


if __name__ == "__main__":
    main()
