"""Probe: can non-periodization boundary modes ride the fused Pallas
forward kernel with the extension as the pad (no output slices)?

Phase algebra (even hlen F, c = F/2 - 1, so F - 2 = 2c): the pywt
analysis window is x_ext[2m - 2c + j] (ext width F-2 left); the kernel
reads x'[2n - c + j] over the signal it is given.  Feeding it
x' = extend(x, c, c(+1), mode) — the extension treated AS signal, size
2L where L = floor((N+F-1)/2) — makes the two identical at n = m, and
the kernel's own (lo, hi) pad margins are filled with WIDER extension
instead of periodic wrap (fwd_level_2d_padded reads only the provided
array; no wrap arithmetic).  All L outputs per axis come out directly.

Run on the chip: python tools/mode_pallas_probe.py
"""
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main():
    import jax
    import jax.numpy as jnp

    from pdwt_tpu.utils import enable_compile_cache
    enable_compile_cache()
    import np_oracle as O
    from pdwt_tpu.core import conv, modes
    from pdwt_tpu.filters import get_wavelet
    from pdwt_tpu.kernels import separable_pallas as K
    from pdwt_tpu.utils.profiling import device_time_any

    w = get_wavelet("db7")
    hlen = w.hlen
    c = conv.fwd_center(hlen)
    mode = "symmetric"
    N = 2036  # L = (2036+13)//2 = 1024: tile-divisible, no slices
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, N, N)), jnp.float32)
    L = modes.dec_len(N, hlen, mode)
    hi_core = 2 * L - N - c  # c for even N, c+1 for odd

    geo = K.fwd_geometry(2 * L, 2 * L, hlen)
    if geo is None:
        print("geometry unsupported"); return
    lo_r, lo_c, hi_r, hi_c = geo

    def fwd_pallas(img):
        xq = modes.extend(img, -1, c + lo_c, hi_core + hi_c, mode)
        xq = modes.extend(xq, -2, c + lo_r, hi_core + hi_r, mode)
        return K.fwd_level_2d_padded(xq, w.dec_lo, w.dec_hi, (L, L))

    def fwd_fma(img):
        z = conv.analysis_pass(img[:, None], (w.dec_lo, w.dec_hi),
                               axis=-1, mode=mode, backend="fma")
        z = conv.analysis_pass(z, (w.dec_lo, w.dec_hi), axis=-2,
                               mode=mode, backend="fma")
        return z[:, 0], z[:, 1], z[:, 2], z[:, 3]

    a_p, h_p, v_p, d_p = jax.jit(fwd_pallas)(x)
    a_f, h_f, v_f, d_f = jax.jit(fwd_fma)(x)
    errs = [float(jnp.abs(p - f).max()) for p, f in
            ((a_p, a_f), (h_p, h_f), (v_p, v_f), (d_p, d_f))]
    print(f"shapes: pallas {a_p.shape} fma {a_f.shape}")
    print(f"max |pallas - fma| per band: {errs}")

    # small-size oracle check too
    xs = np.asarray(x[0, :64, :64])
    Ls = modes.dec_len(64, hlen, mode)
    geos = K.fwd_geometry(2 * Ls, 2 * Ls, hlen)
    if geos is not None:
        lo_r2, lo_c2, hi_r2, hi_c2 = geos
        hi2 = 2 * Ls - 64 - c

        def fp(img):
            xq = modes.extend(img, -1, c + lo_c2, hi2 + hi_c2, mode)
            xq = modes.extend(xq, -2, c + lo_r2, hi2 + hi_r2, mode)
            return K.fwd_level_2d_padded(xq, w.dec_lo, w.dec_hi, (Ls, Ls))

        a2, h2, v2, d2 = jax.jit(fp)(jnp.asarray(xs)[None])
        ao, ho, vo, do = O.dwt2_level_mode(xs.astype(np.float64),
                                           w.dec_lo, w.dec_hi, mode)
        print("oracle max dev:",
              max(float(np.abs(np.asarray(t[0], np.float64) - o).max())
                  for t, o in ((a2, ao), (h2, ho), (v2, vo), (d2, do))))

    t_p = device_time_any(lambda img: fwd_pallas(img)[0], x)
    t_f = device_time_any(lambda img: fwd_fma(img)[0], x)
    print(f"L1 fwd {mode}: pallas {t_p*1e3:.3f} ms vs fma {t_f*1e3:.3f} ms "
          f"({t_f/t_p:.2f}x)")


if __name__ == "__main__":
    main()
