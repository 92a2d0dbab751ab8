"""Benchmark sweep over the five BASELINE.json configs.

Prints one JSON line per config (stderr diagnostics).  ``bench.py`` stays
the single-line headline harness the driver runs; this is the full sweep
for the record.
"""
from __future__ import annotations

import json
import sys

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pdwt_tpu import ops
    from pdwt_tpu.core import separable as sep
    from pdwt_tpu.filters import get_wavelet, quad_filters
    from pdwt_tpu.core import nonseparable as ns
    from pdwt_tpu.models.denoiser import denoise_step
    from pdwt_tpu.utils import device_time

    dev = jax.devices()[0]
    log(f"device: {dev.platform}:{dev.device_kind}")
    rng = np.random.default_rng(0)
    results = []

    def record(name, pixels, fn, arg):
        t = device_time(fn, arg)
        rate = pixels / t / 1e6
        results.append({"config": name, "value": round(rate, 1),
                        "unit": "Mpix/s", "ms": round(t * 1e3, 3)})
        log(f"{name}: {t*1e3:.3f} ms = {rate:.0f} Mpix/s")

    # 1. haar 2D single-level fwd+inv, 512x512
    img512 = jnp.asarray(rng.standard_normal((512, 512)), dtype=jnp.float32)
    wh = get_wavelet("haar")
    record("haar 2D 1-level fwd+inv 512x512", 512 * 512,
           lambda x: sep.idwt2d(sep.dwt2d(x, wh, 1), wh, (512, 512)), img512)

    # 2. separable db7 2D 5-level fwd+inv, 2048x2048
    img = jnp.asarray(rng.standard_normal((2048, 2048)), dtype=jnp.float32)
    w7 = get_wavelet("db7")
    record("db7 2D 5-level fwd+inv 2048x2048", 2048 * 2048,
           lambda x: sep.idwt2d(sep.dwt2d(x, w7, 5), w7, (2048, 2048)), img)

    # 3. batched 1D sym8 (1024 x 4096) + soft_threshold + norm1 + inverse
    w8 = get_wavelet("sym8")
    sig = jnp.asarray(rng.standard_normal((1024, 4096)), dtype=jnp.float32)

    def cfg3(x):
        c = sep.dwt1d(x, w8, 4)
        c = ops.soft_threshold(c, 0.1)
        n = ops.norm1(c)
        return sep.idwt1d(c, w8, 4096) + 0 * n

    record("batched 1D sym8 4-level denoise 1024x4096", 1024 * 4096,
           cfg3, sig)

    # 4. SWT 2D 3-level with random-shift denoising (full TI step)
    img1k = jnp.asarray(rng.standard_normal((1024, 1024)), dtype=jnp.float32)
    key = jax.random.key(0)

    def cfg4(x):
        out, _ = denoise_step(x, key, "db7", 3, 1.0, swt=True)
        return out

    record("SWT db7 2D 3-level TI denoise step 1024x1024", 1024 * 1024,
           cfg4, img1k)

    # 5. non-separable DWT with custom (outer-product) filters
    qf = quad_filters(w7.dec_lo, w7.dec_hi)
    qi = quad_filters(w7.rec_lo, w7.rec_hi)
    record("non-separable db7 2D 5-level fwd+inv 2048x2048", 2048 * 2048,
           lambda x: ns.idwt2d_ns(ns.dwt2d_ns(x, qf, 5), qi,
                                  (2048, 2048)), img)

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
