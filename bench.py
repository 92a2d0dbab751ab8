"""Benchmark harness — north-star metric (BASELINE.json).

Measures Mpix/s/chip for the 2D db7 5-level forward+inverse DWT on a
2048x2048 float32 image (the BASELINE.json headline config) on whatever
accelerator JAX selects (the real TPU chip under the driver).

Methodology: the roundtrip is chained M times inside a jitted
``lax.fori_loop`` body and timed for two different M; the slope isolates
pure device time from dispatch/loop-iteration overhead (the remote-TPU
tunnel adds a fixed ~0.75 ms per loop iteration that would otherwise
dominate).

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is
reported against a documented 1000 Mpix/s reference-GPU-class estimate
for PDWT on this config (see BASELINE.md "Consequence for this project").

Prints exactly one JSON line on stdout; diagnostics go to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_GPU_ESTIMATE_MPIX_S = 1000.0

N = 2048
LEVELS = 5
WNAME = "db7"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def device_time(fn, arg, **kw):
    from pdwt_tpu.utils import device_time as dt
    return dt(fn, arg, **kw)


def main() -> None:
    import jax

    from pdwt_tpu.utils import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from pdwt_tpu.core import separable as sep
    from pdwt_tpu.filters import get_wavelet

    dev = jax.devices()[0]
    log(f"device: {dev.platform}:{dev.device_kind}")
    wav = get_wavelet(WNAME)
    rng = np.random.default_rng(0)
    # [0,255] uniform: the range BASELINE.md's accuracy targets (and the
    # reference's own haar figure, src/haar.cu:190-192) are stated on.
    # (Rounds 1-2 used standard_normal*255, a ~4x wider range — error
    # figures across rounds scale accordingly.)
    img = jnp.asarray(rng.uniform(0.0, 255.0, (N, N)), dtype=jnp.float32)

    def roundtrip(x):
        c = sep.dwt2d(x, wav, LEVELS)
        return sep.idwt2d(c, wav, (N, N))

    t0 = time.perf_counter()
    out = jax.jit(roundtrip)(img)
    out.block_until_ready()
    log(f"compile+first run: {time.perf_counter() - t0:.2f}s")
    err = float(jnp.max(jnp.abs(out - img)))
    log(f"max recon error on [0,255]-scale data: {err:.3e}")

    t = device_time(roundtrip, img)
    mpix_s = (N * N) / t / 1e6
    log(f"device time per roundtrip: {t*1e3:.3f} ms")

    # reduced-precision modes (same workload): bf16 arrays end-to-end on
    # the MXU banded-matmul kernels, and f32 arrays with bf16x3 compute
    extras = {}
    try:
        imgb = img.astype(jnp.bfloat16)
        outb = jax.jit(roundtrip)(imgb)
        errb = float(jnp.max(jnp.abs(outb.astype(jnp.float32)
                                     - imgb.astype(jnp.float32))))
        tb = device_time(roundtrip, imgb)
        extras["bf16_mpix_s"] = round((N * N) / tb / 1e6, 1)
        extras["bf16_max_recon_error"] = errb
        log(f"bf16 roundtrip: {tb*1e3:.3f} ms, err {errb:.3f}")

        import os

        # the balanced accuracy tier (round 4: b2f/b2f L1 schemes —
        # half the error at ~2/3 the speed).  Fresh closure: jit's
        # global cache is keyed on the function object, so reusing
        # `roundtrip` would return the fast-tier executable.
        os.environ["PDWT_TPU_BF16_ACCURACY"] = "balanced"
        try:
            def rt_bal(x):
                c = sep.dwt2d(x, wav, LEVELS)
                return sep.idwt2d(c, wav, (N, N))

            outbb = jax.jit(rt_bal)(imgb)
            errbb = float(jnp.max(jnp.abs(outbb.astype(jnp.float32)
                                          - imgb.astype(jnp.float32))))
            tbb = device_time(rt_bal, imgb)
            extras["bf16_bal_mpix_s"] = round((N * N) / tbb / 1e6, 1)
            extras["bf16_bal_max_recon_error"] = errbb
            log(f"bf16 balanced roundtrip: {tbb*1e3:.3f} ms, err {errbb:.3f}")
        finally:
            del os.environ["PDWT_TPU_BF16_ACCURACY"]

        os.environ["PDWT_TPU_PRECISION"] = "mixed"
        try:
            outm = jax.jit(lambda x: roundtrip(x) * 1.0)(img)
            errm = float(jnp.max(jnp.abs(outm - img)))
            tm = device_time(lambda x: roundtrip(x) * 1.0, img)
            extras["mixed_mpix_s"] = round((N * N) / tm / 1e6, 1)
            extras["mixed_max_recon_error"] = errm
            log(f"mixed roundtrip: {tm*1e3:.3f} ms, err {errm:.4f}")
        finally:
            del os.environ["PDWT_TPU_PRECISION"]
    except Exception as e:  # reduced-precision paths must never break the bench
        log(f"reduced-precision bench skipped: {e!r}")

    # flagship TI-denoise step (SWT fwd + fused threshold-in-inverse),
    # exact and bf16 serving mode — the reference's demo scenario 3
    try:
        from pdwt_tpu.core import separable as sep_mod

        M = 1024
        x1 = jnp.asarray(rng.uniform(0, 255, (M, M)), jnp.float32)

        def ti(v):
            c = sep_mod.swt2d(v, wav, 3)
            return sep_mod.iswt2d_denoise(c, wav, 10.0, mode="soft")

        jax.block_until_ready(jax.jit(ti)(x1))
        tt = device_time(ti, x1)
        extras["ti_swt_mpix_s"] = round(M * M / tt / 1e6, 1)
        x1b = x1.astype(jnp.bfloat16)
        jax.block_until_ready(jax.jit(ti)(x1b))
        ttb = device_time(ti, x1b)
        extras["ti_swt_bf16_mpix_s"] = round(M * M / ttb / 1e6, 1)
        log(f"TI step: exact {tt*1e3:.3f} ms, bf16 {ttb*1e3:.3f} ms")
    except Exception as e:
        log(f"TI bench skipped: {e!r}")

    print(json.dumps({
        "metric": f"Mpix/s/chip, 2D {WNAME} {LEVELS}-level fwd+inv ({N}x{N})",
        "value": round(mpix_s, 1),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / REFERENCE_GPU_ESTIMATE_MPIX_S, 3),
        "max_recon_error": err,
        "device": f"{dev.platform}:{dev.device_kind}",
        **extras,
    }))


if __name__ == "__main__":
    main()
