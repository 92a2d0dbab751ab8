"""Per-stage device-time breakdown of the headline roundtrip (TPU).

Answers "where do the 0.8 ms go?" for the 2D db7 5-level fwd+inv on
2048^2: per-level kernel cost with pre-padded inputs, the wrap_pad
(XLA concat) cost, forward vs inverse split, and the SWT/TI-denoise
stages.  Uses the slope method (utils.device_time) — the only timing
that survives the remote tunnel.

Run:  python tools/profile_breakdown.py [--swt] [--quick]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pdwt_tpu.utils import enable_compile_cache  # noqa: E402
enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--swt", action="store_true", help="profile SWT stages")
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--wname", default="db7")
    ap.add_argument("--levels", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pdwt_tpu.core import conv
    from pdwt_tpu.core import separable as sep
    from pdwt_tpu.filters import get_wavelet
    from pdwt_tpu.kernels import separable_pallas as sp
    from pdwt_tpu.kernels import swt_pallas as swp
    from pdwt_tpu.utils import device_time, device_time_any

    N, L = args.n, args.levels
    wav = get_wavelet(args.wname)
    hlen = wav.hlen
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, N, N)), jnp.float32)

    def t(label, fn, *xs):
        sec = device_time_any(fn, *xs)
        gpix = (N * N) / sec / 1e9
        print(f"{label:45s} {sec*1e3:8.3f} ms   ({gpix:6.2f} GPix/s @2048^2)")
        return sec

    print(f"== {args.wname} hlen={hlen} on {N}^2, device="
          f"{jax.devices()[0].device_kind} ==")

    # --- wrap_pad (XLA concat) cost at level-1 size -----------------------
    geo = sp.fwd_geometry(N, N, hlen)
    print(f"fwd_geometry(L1) = {geo}")
    lo_rg, lo_cg, hi_r, hi_c = geo

    def pad2(x):
        xp = conv.wrap_pad(x, -1, lo_cg, hi_c)
        return conv.wrap_pad(xp, -2, lo_rg, hi_r)

    t("wrap_pad both axes (L1 input)", pad2, img)

    # --- per-level forward kernel, pre-padded vs with pad -----------------
    x = img
    for lvl in range(1, L + 1):
        r = N >> (lvl - 1)
        xl = x[:, :r, :r]
        geo = sp.fwd_geometry(r, r, hlen)
        if geo is None or not sp.pallas_supported_fwd((r, r), hlen):
            print(f"L{lvl} ({r}^2): unsupported geometry")
            continue
        lo_rg, lo_cg, hi_r, hi_c = geo

        def padl(y, lo_rg=lo_rg, lo_cg=lo_cg, hi_r=hi_r, hi_c=hi_c):
            yp = conv.wrap_pad(y, -1, lo_cg, hi_c)
            return conv.wrap_pad(yp, -2, lo_rg, hi_r)

        xp = jax.jit(padl)(xl)
        t(f"L{lvl} fwd kernel only ({r}^2, padded in)",
          lambda y, r=r: sp.fwd_level_2d_padded(y, wav.dec_lo, wav.dec_hi,
                                                (r // 2, r // 2)), xp)
        t(f"L{lvl} fwd pad+kernel ({r}^2)",
          lambda y: sp.fwd_level_2d(y, wav.dec_lo, wav.dec_hi), xl)

    # --- per-level inverse ------------------------------------------------
    for lvl in range(1, L + 1):
        m = N >> lvl
        if not sp.pallas_supported_inv((m, m), hlen):
            print(f"L{lvl} inv ({m}^2): unsupported geometry")
            continue
        bands = [jnp.asarray(rng.standard_normal((1, m, m)), jnp.float32)
                 for _ in range(4)]
        t(f"L{lvl} inv pad+kernel ({m}^2 subbands)",
          lambda a, h, v, d: sp.inv_level_2d(a, h, v, d, wav.rec_lo,
                                             wav.rec_hi), *bands)
        if lvl == 1:
            geo_i = sp.inv_geometry(m, m, hlen)
            lo_ri, lo_ci, hi_ri, hi_ci = geo_i

            def padi(t_, lo_ri=lo_ri, lo_ci=lo_ci, hi_ri=hi_ri, hi_ci=hi_ci):
                t_ = conv.wrap_pad(t_, -1, lo_ci, hi_ci)
                return conv.wrap_pad(t_, -2, lo_ri, hi_ri)

            pb = [jax.jit(padi)(t_) for t_ in bands]
            t(f"L{lvl} inv kernel only (padded in)",
              lambda a, h, v, d: sp.inv_level_2d_padded(
                  a, h, v, d, wav.rec_lo, wav.rec_hi, (m, m)), *pb)

    if args.swt:
        im2 = img[0]
    # --- full pipelines -----------------------------------------------------
    im2 = img[0]
    t("full fwd (5 levels)", lambda y: sep.dwt2d(y, wav, L), im2)
    c = jax.jit(lambda y: sep.dwt2d(y, wav, L))(im2)
    t("full inv (5 levels)",
      lambda cc: sep.idwt2d(cc, wav, (N, N)), c)
    t("full roundtrip", lambda y: sep.idwt2d(sep.dwt2d(y, wav, L), wav,
                                             (N, N)), im2)

    if args.swt:
        SL = 3
        t(f"swt fwd ({SL} levels)", lambda y: sep.swt2d(y, wav, SL), im2)
        cs = jax.jit(lambda y: sep.swt2d(y, wav, SL))(im2)
        t(f"swt inv ({SL} levels)", lambda cc: sep.iswt2d(cc, wav), cs)
        for lvl in range(1, SL + 1):
            t(f"swt L{lvl} fwd pad+kernel",
              lambda y, lvl=lvl: swp.swt_fwd_level_2d(y, wav.dec_lo,
                                                      wav.dec_hi, lvl), img)
            bands = [jnp.asarray(rng.standard_normal((1, N, N)), jnp.float32)
                     for _ in range(4)]
            t(f"swt L{lvl} inv pad+kernel",
              lambda a, h, v, d, lvl=lvl: swp.swt_inv_level_2d(
                  a, h, v, d, wav.rec_lo, wav.rec_hi, lvl), *bands)
        # cycle-spin roll cost
        t("jnp.roll both axes (2048^2)",
          lambda y: jnp.roll(y, (17, 33), (0, 1)), im2)


if __name__ == "__main__":
    main()
