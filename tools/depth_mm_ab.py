"""Chip A/B of the MXU depth pass (core/depth_matmul.py) vs the fma
slice-FMA depth pass in the 3D compositions.

depth_matmul landed at the end of round 3 with CPU equality tests but
NO chip measurement; the round-3 lead said the fma depth pass is why
3D bf16 is only +10% over f32.  This measures it: 3D roundtrip
(bench config 6 geometry) and 3D SWT TI step (config 7) in f32 and
bf16, PDWT_TPU_DEPTH_MM=1 vs 0.  Programs are traced up front (the
env var is read at trace time), then timing reps are interleaved
across ALL programs so every config sees the same tunnel-drift phases
(the tile_ab lesson).  Also records the f32 mm-vs-fma max deviation.

Usage: python tools/depth_mm_ab.py [out.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pdwt_tpu.utils import enable_compile_cache  # noqa: E402
enable_compile_cache()

import numpy as np

K, M1, M2, REPS = 4, 1, 3, 10


def main(out_path="tools/depth_mm_ab_results.json"):
    from _cli import check_out
    out_path = check_out(out_path)
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pdwt_tpu.core import separable3d as s3
    from pdwt_tpu.filters import get_wavelet
    from pdwt_tpu.models.denoiser import denoise_step_3d

    w = get_wavelet("db4")
    rng = np.random.default_rng(0)
    vol_rt = jnp.asarray(rng.standard_normal((128, 512, 512)), jnp.float32)
    vol_ti = jnp.asarray(rng.standard_normal((64, 512, 512)), jnp.float32)

    def rt(v):
        return s3.idwt3d(s3.dwt3d(v, w, 2), w, (128, 512, 512))

    def ti(v):
        return denoise_step_3d(v, None, w, 2, 1.0, swt=True)[0]

    def loops(fn):
        def make(M):
            @jax.jit
            def lp(x):
                def body(_, v):
                    for _ in range(M):
                        v = fn(v)
                    return v
                return lax.fori_loop(0, K, body, x)
            return lp
        return make(M1), make(M2)

    # (name, fn, input) — traced under both DEPTH_MM settings
    cases = [("rt_f32", rt, vol_rt),
             ("rt_bf16", rt, vol_rt.astype(jnp.bfloat16)),
             ("ti_f32", ti, vol_ti),
             ("ti_bf16", ti, vol_ti.astype(jnp.bfloat16))]
    progs = {}
    for mm in ("1", "0"):
        os.environ["PDWT_TPU_DEPTH_MM"] = mm
        for name, fn, x in cases:
            lp1, lp2 = loops(fn)
            # trace+compile now, while the env var is set
            t0 = time.time()
            float(jnp.sum(jnp.asarray(lp1(x), jnp.float32)))
            float(jnp.sum(jnp.asarray(lp2(x), jnp.float32)))
            print(f"compiled {name} mm={mm}: {time.time()-t0:.1f}s",
                  flush=True)
            progs[(name, mm)] = (lp1, lp2, x)
    os.environ.pop("PDWT_TPU_DEPTH_MM", None)

    # correctness: f32 roundtrip outputs of the two formulations agree
    os.environ["PDWT_TPU_DEPTH_MM"] = "1"
    y_mm = jax.jit(rt)(vol_rt)
    os.environ["PDWT_TPU_DEPTH_MM"] = "0"
    y_fma = jax.jit(rt)(vol_rt)
    os.environ.pop("PDWT_TPU_DEPTH_MM", None)
    dev = float(jnp.max(jnp.abs(y_mm - y_fma)))
    print(f"f32 mm-vs-fma max dev: {dev:.3e}", flush=True)

    t = {k: [float("inf")] * 2 for k in progs}
    for _ in range(REPS):
        for key, (lp1, lp2, x) in progs.items():
            t0 = time.perf_counter()
            float(jnp.sum(jnp.asarray(lp1(x), jnp.float32)))
            t[key][0] = min(t[key][0], time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(jnp.sum(jnp.asarray(lp2(x), jnp.float32)))
            t[key][1] = min(t[key][1], time.perf_counter() - t0)
    rows = {"f32_mm_vs_fma_max_dev": dev}
    for (name, mm), (t1, t2) in sorted(t.items()):
        ms = (t2 - t1) / (K * (M2 - M1)) * 1e3
        rows[f"{name}_mm{mm}"] = round(ms, 3)
        print(f"{name} mm={mm}: {ms:.3f} ms", flush=True)
    for name, _, _ in cases:
        a, b = rows.get(f"{name}_mm1"), rows.get(f"{name}_mm0")
        if a and b:
            rows[f"{name}_speedup"] = round(b / a, 3)
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
