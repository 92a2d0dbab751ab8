"""Chip A/B of the SWT bf16 À-trous compute scheme (round 4).

Round 3 settled SWT bf16 = one matmul per pass (b3 tripled the
undecimated work and measured slower than the exact kernels).  Round 4
added the 2-matmul b2f/b2d points; this measures whether either buys
the SWT path accuracy at acceptable cost: 1024^2 db7 3-level bf16
roundtrip error + TI-denoise-step device time per
PDWT_TPU_SWT_BF16_SCHEME in {default(b1/fd), b2f, b2d}, timing reps
interleaved (drift-proof).

Usage: python tools/swt_b2_ab.py [out.json] [scheme ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pdwt_tpu.utils import enable_compile_cache  # noqa: E402
enable_compile_cache()

import numpy as np

M_SIZE, LEVELS, WNAME = 1024, 3, "db7"
K, M1, M2, REPS = 8, 1, 5, 10


def main(out_path="tools/swt_b2_ab_results.json", *argv):
    from _cli import check_out
    out_path = check_out(out_path)
    schemes = list(argv) or ["default", "b2f", "b2d"]

    import jax
    import jax.numpy as jnp
    from jax import lax

    from pdwt_tpu.core import separable as sep
    from pdwt_tpu.filters import get_wavelet
    from pdwt_tpu.models.denoiser import denoise_step

    wav = get_wavelet(WNAME)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (M_SIZE, M_SIZE)), jnp.float32)
    imgb = img.astype(jnp.bfloat16)

    def set_env(s):
        if s == "default":
            os.environ.pop("PDWT_TPU_SWT_BF16_SCHEME", None)
        else:
            os.environ["PDWT_TPU_SWT_BF16_SCHEME"] = s

    def build():
        # fresh closures per scheme (jit global cache is per-function)
        def rt(x):
            return sep.iswt2d(sep.swt2d(x, wav, LEVELS), wav)

        def ti(x):
            out, _ = denoise_step(x, None, wav, LEVELS, 1.0, swt=True)
            return out

        def make(fn, M):
            @jax.jit
            def lp(x):
                def body(_, v):
                    for _ in range(M):
                        v = fn(v)
                    return v
                return lax.fori_loop(0, K, body, x)
            return lp
        return rt, make(ti, M1), make(ti, M2)

    rows = {}
    progs = {}
    for s in schemes:
        set_env(s)
        rt, lp1, lp2 = build()
        t0 = time.time()
        out = jax.jit(rt)(imgb)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - img)))
        float(jnp.sum(lp1(imgb).astype(jnp.float32)))
        float(jnp.sum(lp2(imgb).astype(jnp.float32)))
        print(f"compiled {s}: err {err:.3f} ({time.time()-t0:.0f}s)",
              flush=True)
        rows[s] = {"rt_err": round(err, 3)}
        progs[s] = (lp1, lp2)
    set_env("default")

    t = {s: [float("inf")] * 2 for s in schemes}
    for _ in range(REPS):
        for s, (lp1, lp2) in progs.items():
            t0 = time.perf_counter()
            float(jnp.sum(lp1(imgb).astype(jnp.float32)))
            t[s][0] = min(t[s][0], time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(jnp.sum(lp2(imgb).astype(jnp.float32)))
            t[s][1] = min(t[s][1], time.perf_counter() - t0)
    for s, (t1, t2) in t.items():
        ms = (t2 - t1) / (K * (M2 - M1)) * 1e3
        rows[s]["ti_ms"] = round(ms, 3)
        print(f"{s}: TI {ms:.3f} ms, rt_err {rows[s]['rt_err']}",
              flush=True)
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
