"""Probe 2: general (non-tile-divisible) sizes via garbage-tail outputs
+ one prefix slice per band.  N=2048 db7 symmetric: L=1030; present the
kernel a signal of size (2*1032, 2*1152) (next sublane/lane-divisible
output sizes), outputs (1032, 1152) per band, prefix-slice to
(1030, 1030).  Measures the slice cost separately."""
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from pdwt_tpu.utils import enable_compile_cache
    enable_compile_cache()
    from pdwt_tpu.core import conv, modes
    from pdwt_tpu.filters import get_wavelet
    from pdwt_tpu.kernels import separable_pallas as K
    from pdwt_tpu.utils.profiling import device_time_any

    w = get_wavelet("db7")
    hlen = w.hlen
    c = conv.fwd_center(hlen)
    mode = "symmetric"
    N = 2048
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, N, N)), jnp.float32)
    L = modes.dec_len(N, hlen, mode)          # 1030
    # round up to TILE-FRIENDLY sizes: a bare 8-multiple can leave the
    # tile picker only TR=8 (1032 = 8*129), collapsing kernel efficiency
    # (measured 3.8 ms vs 0.4); 64/128 multiples restore real tiles
    Lr = -(-L // 64) * 64                     # 1088
    Lc = -(-L // 128) * 128                   # 1152
    geo = K.fwd_geometry(2 * Lr, 2 * Lc, hlen)
    print("L:", L, "padded:", (Lr, Lc), "geo:", geo)
    lo_r, lo_c, hi_r, hi_c = geo

    def fwd_padded(img):
        xq = modes.extend(img, -1, c + lo_c, (2 * Lc - N - c) + hi_c, mode)
        xq = modes.extend(xq, -2, c + lo_r, (2 * Lr - N - c) + hi_r, mode)
        return K.fwd_level_2d_padded(xq, w.dec_lo, w.dec_hi, (Lr, Lc))

    def fwd_sliced(img):
        bands = fwd_padded(img)
        return tuple(b[:, :L, :L] for b in bands)

    def fwd_fma(img):
        z = conv.analysis_pass(img[:, None], (w.dec_lo, w.dec_hi),
                               axis=-1, mode=mode, backend="fma")
        z = conv.analysis_pass(z, (w.dec_lo, w.dec_hi), axis=-2,
                               mode=mode, backend="fma")
        return z[:, 0], z[:, 1], z[:, 2], z[:, 3]

    outs_s = jax.jit(fwd_sliced)(x)
    outs_f = jax.jit(fwd_fma)(x)
    errs = [float(jnp.abs(p - f).max()) for p, f in zip(outs_s, outs_f)]
    print("max |pallas_sliced - fma|:", errs)

    t_pad = device_time_any(lambda im: fwd_padded(im)[0], x)
    t_sl = device_time_any(lambda im: fwd_sliced(im)[0], x)
    t_f = device_time_any(lambda im: fwd_fma(im)[0], x)
    print(f"L1 fwd {mode} N=2048: pallas-pad {t_pad*1e3:.3f} ms, "
          f"+4 slices {t_sl*1e3:.3f} ms, fma {t_f*1e3:.3f} ms "
          f"({t_f/t_sl:.2f}x with slices)")


if __name__ == "__main__":
    main()
